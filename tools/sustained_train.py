#!/usr/bin/env python
"""Sustained real-data training run on the TPU (BASELINE validation).

The round-2 gap: training had only been proven on synthetic in-memory
micro-runs, so the compile-bucketing machinery (QuantizedBatchSampler +
target-length buckets) had never been validated against the 30 s-10 min
remote-compile costs it exists to bound, and host-side stalls were
unmeasured. This script:

1. generates a few-hundred-clip on-disk dataset in the reference layout
   (variable 150-400 frame clips, 6-16 s wavs, variable-length texts —
   reference: av_dataset.py:110-138);
2. runs the real Trainer.fit loop (full-size AVNet: frozen whisper-small +
   frozen ResNet-50 + trainable fusion) for --steps steps;
3. reports steady-state ms/step, the number of DISTINCT COMPILED STEP
   SHAPES (jit cache size — must stay ~batch_buckets x target_buckets),
   and the host-stall picture (inter-step dispatch gaps; compare
   --prefetch 0 vs 2 for the loader-overlap win).

Run exclusively on the chip (CLAUDE.md: never two TPU processes at once):

    python tools/sustained_train.py --steps 220 --prefetch 2
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import wave as wave_mod

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORDS = ("xin chao cac ban toi ten la nam den tu ha noi hom nay troi dep "
         "chung ta cung hoc tieng viet nhe cam on rat nhieu").split()


def _write_mp4(path: str, frames: np.ndarray) -> None:
    """Encode frames [T, H, W, 3] uint8 as an mp4 (cv2 in-process, mp4v —
    the reference's on-disk video format, reference: av_dataset.py:57-73;
    no ffmpeg CLI exists in this image, so cv2's bundled libavcodec both
    writes the fixture and decodes it in the loader)."""
    import cv2

    h, w = frames.shape[1:3]
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25.0,
                             (w, h))
    if not writer.isOpened():
        raise RuntimeError(f"cv2 VideoWriter could not open {path}")
    for f in frames:
        writer.write(f)
    writer.release()


def make_dataset(root: str, n_clips: int, seed: int = 0,
                 video_format: str = "npy") -> None:
    rng = np.random.default_rng(seed)
    for split, n in (("train", n_clips), ("val", 8)):
        vdir = os.path.join(root, split, f"{split}_video_seg12s", "spk")
        tdir = os.path.join(root, split, f"{split}_text_seg12s", "spk")
        os.makedirs(vdir, exist_ok=True)
        os.makedirs(tdir, exist_ok=True)
        for i in range(n):
            t_frames = int(rng.integers(150, 401))
            frames = rng.integers(0, 255, (t_frames, 64, 64, 3), dtype=np.uint8)
            if video_format == "mp4":
                _write_mp4(os.path.join(vdir, f"clip{i}.mp4"), frames)
            else:
                np.save(os.path.join(vdir, f"clip{i}.npy"), frames)
            n_samp = int(t_frames / 25.0 * 16000)
            tt = np.arange(n_samp) / 16000
            x = 0.3 * np.sin(2 * np.pi * (200 + 20 * (i % 17)) * tt)
            with wave_mod.open(os.path.join(vdir, f"clip{i}.wav"), "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(16000)
                w.writeframes((x * 32767).astype("<i2").tobytes())
            n_words = int(rng.integers(5, 30))
            text = " ".join(rng.choice(WORDS, n_words))
            with open(os.path.join(tdir, f"clip{i}.txt"), "w") as f:
                f.write(text)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data-root", default="/tmp/avsr_sustained_data")
    parser.add_argument("--n-clips", type=int, default=200)
    parser.add_argument("--steps", type=int, default=220)
    parser.add_argument("--prefetch", type=int, default=2)
    parser.add_argument("--num-workers", type=int, default=4)
    parser.add_argument("--batch-size", type=int, default=4)
    parser.add_argument("--no-remat", action="store_true")
    parser.add_argument("--on-device-augment", action="store_true",
                        help="augmentation.on_device=True: host loader "
                             "emits raw mel / raw resized frames; the "
                             "stochastic augmentation runs inside the "
                             "jitted train step")
    parser.add_argument("--on-device-mel", action="store_true",
                        help="augmentation.on_device_mel=True (with "
                             "--on-device-augment): host ships the packed "
                             "raw waveform; the mel runs as matmul-DFT on "
                             "the MXU inside the jitted step")
    parser.add_argument("--loader-only", action="store_true",
                        help="time pure loader iteration (fetch + collate, "
                             "no device work) — isolates the host-side "
                             "bound from the step time")
    parser.add_argument("--out", default=None, help="append the JSON result here")
    parser.add_argument("--video-format", default="npy", choices=("npy", "mp4"),
                        help="on-disk video format for the generated set: "
                             "npy (pre-decoded fast path) or mp4 (the "
                             "reference's native format — measures real "
                             "in-process cv2 decode in the loader)")
    args = parser.parse_args()
    if args.on_device_mel and not args.on_device_augment:
        parser.error("--on-device-mel requires --on-device-augment")

    marker = os.path.join(args.data_root,
                          f".generated_{args.n_clips}_{args.video_format}")
    if not os.path.exists(marker):
        t0 = time.time()
        make_dataset(args.data_root, args.n_clips,
                     video_format=args.video_format)
        open(marker, "w").close()
        print(f"[data] generated {args.n_clips} {args.video_format} clips "
              f"in {time.time()-t0:.0f}s")

    import jax

    from mocov2_whisper_flamingo_tpu.config import get_config
    from mocov2_whisper_flamingo_tpu.datamodule.data_module import DataModule
    from mocov2_whisper_flamingo_tpu.training.trainer import Trainer
    from train import build_net

    config = get_config({
        "data.root_dir": args.data_root,
        "data.batch_size": args.batch_size,
        "data.num_workers": args.num_workers,
        "data.prefetch_batches": args.prefetch,
        "training.epochs": 64,  # stop on --steps
        "output.log_every_n_steps": 10,
        "output.log_dir": "/tmp/avsr_sustained_logs",
        "output.checkpoint_dir": "/tmp/avsr_sustained_ckpt",
        **({"precision.rematerialize": False} if args.no_remat else {}),
        **({"augmentation.on_device": True} if args.on_device_augment else {}),
        **({"augmentation.on_device_mel": True} if args.on_device_mel else {}),
    })

    datamodule = DataModule(config)
    datamodule.setup("fit")

    if args.loader_only:
        loader = datamodule.train_dataloader()
        n, t0, clips = 0, time.time(), 0
        times = []
        for batch in loader:
            times.append(time.time())
            clips += int(batch["audio"].shape[0])
            n += 1
            if n >= args.steps:
                break
        wall = time.time() - t0
        gaps = np.diff(np.asarray(times)) * 1e3
        warm = gaps[5:] if len(gaps) > 10 else gaps
        result = {
            "mode": "loader_only", "batches": n, "clips": clips,
            "on_device_augment": args.on_device_augment,
            "on_device_mel": args.on_device_mel,
            "prefetch": args.prefetch, "num_workers": args.num_workers,
            "wall_s": round(wall, 1),
            "clips_per_s": round(clips / wall, 1),
            "batch_gap_ms_median": round(float(np.median(warm)), 2),
            "batch_gap_ms_p90": round(float(np.percentile(warm, 90)), 2),
        }
        print(json.dumps(result))
        if args.out:
            with open(args.out, "a") as f:
                f.write(json.dumps(result) + "\n")
        return

    net, params = build_net(config, datamodule.vocab_size)
    trainer = Trainer(config, net, tokenizer=datamodule.tokenizer)
    trainer.step_timestamps = []

    t_fit = time.time()
    trainer.fit(datamodule, params, max_steps=args.steps)
    wall = time.time() - t_fit

    ts = np.asarray(trainer.step_timestamps)
    gaps = np.diff(ts) * 1e3  # ms between step dispatches
    warm = gaps[20:] if len(gaps) > 40 else gaps
    cache_size = None
    try:
        cache_size = trainer._step_fn._cache_size()
    except Exception:
        pass
    # Loss-curve evidence (round-3 verdict, next #1: does training LEARN on
    # real data through the full loader/augment path?): first/last logged
    # train/loss plus a head-vs-tail mean so one noisy step can't fake a
    # descent; the tfevents file itself is the artifact.
    loss_curve = {}
    try:
        from mocov2_whisper_flamingo_tpu.tools.monitor import load_scalars

        run_dir = os.path.dirname(trainer.writer.path)
        pts = load_scalars(run_dir).get("train/loss", [])
        vals = [v for _, v in pts]
        if len(vals) >= 4:
            k = max(len(vals) // 4, 1)
            loss_curve = {
                "train_loss_first": round(vals[0], 4),
                "train_loss_last": round(vals[-1], 4),
                "train_loss_head_mean": round(float(np.mean(vals[:k])), 4),
                "train_loss_tail_mean": round(float(np.mean(vals[-k:])), 4),
                "n_loss_points": len(vals),
                "tfevents_dir": run_dir,
            }
    except Exception as e:
        loss_curve = {"loss_curve_error": repr(e)}

    result = {
        "steps": int(len(ts)),
        "prefetch": args.prefetch,
        **loss_curve,
        "num_workers": args.num_workers,
        "remat": not args.no_remat,
        "on_device_augment": args.on_device_augment,
        "on_device_mel": args.on_device_mel,
        "wall_s": round(wall, 1),
        "steady_ms_per_step_median": round(float(np.median(warm)), 2),
        "steady_ms_per_step_mean": round(float(np.mean(warm)), 2),
        "steady_ms_per_step_p90": round(float(np.percentile(warm, 90)), 2),
        "compiled_step_shapes": cache_size,
        "n_compile_stalls_gt_1s": int((warm > 1000).sum()),
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(result) + "\n")


if __name__ == "__main__":
    main()
