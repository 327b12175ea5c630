#!/usr/bin/env python
"""Dataset prep: scan every clip, report the global max frame count.

Capability parity with the reference scan (reference: max_frame_count.py —
a multiprocessing.Pool over all mp4s, used to choose ``max_frames``). Here
the probe uses the cheap header readers from the dataset layer (npy headers
/ ffprobe) over a process pool.
"""

from __future__ import annotations

import argparse
import os
from concurrent.futures import ProcessPoolExecutor

from mocov2_whisper_flamingo_tpu.datamodule.av_dataset import (
    VIDEO_EXTENSIONS, probe_video_frames)


def find_videos(root: str) -> list[str]:
    out = []
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(VIDEO_EXTENSIONS):
                out.append(os.path.join(dirpath, f))
    return out


def scan(root: str, workers: int = 8) -> dict:
    paths = find_videos(root)
    if not paths:
        return {"n_videos": 0, "max_frames": 0}
    if workers <= 1:
        counts = [probe_video_frames(p) for p in paths]
    else:
        with ProcessPoolExecutor(max_workers=workers) as pool:
            counts = list(pool.map(probe_video_frames, paths, chunksize=64))
    max_idx = max(range(len(counts)), key=lambda i: counts[i])
    return {
        "n_videos": len(paths),
        "max_frames": counts[max_idx],
        "max_file": paths[max_idx],
        "mean_frames": sum(counts) / len(counts),
    }


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--root", required=True, help="dataset root to scan")
    parser.add_argument("--workers", type=int, default=8)
    args = parser.parse_args()
    report = scan(args.root, args.workers)
    for k, v in report.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
