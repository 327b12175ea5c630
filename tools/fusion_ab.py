#!/usr/bin/env python
"""Fusion-path A/B on the chip: monolithic gated-attention kernel
(fused_kernel=True, the round-1..3 default) vs the retired-default path
(flash-attention MHA + XLA rest). Times the full AV ENCODE (where fusion
lives) interleaved in one process. Decides docs/DESIGN.md's round-4
retirement note with a measurement.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

from bench import SECONDS_PER_CLIP, _build, _make_batch, _preprocess, jax_block  # noqa: E402


def main() -> None:
    import jax

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    iters = 10
    net, params = _build("whisper-small")
    rng = np.random.default_rng(0)
    batch = _make_batch(rng, b)

    def make_encode(fused: bool):
        net.trunk.fusion.fused_kernel = fused
        fn = jax.jit(lambda p, bt: net.encode(p, _preprocess(bt)))
        out = fn(params, batch)
        jax_block(out)
        return fn

    t0 = time.perf_counter()
    enc_flash = make_encode(False)
    print(f"[ab] flash-path encode compiled in {time.perf_counter()-t0:.0f}s",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    enc_fused = make_encode(True)
    print(f"[ab] fused-kernel encode compiled in {time.perf_counter()-t0:.0f}s",
          file=sys.stderr, flush=True)

    t_flash = t_fused = 0.0
    for _ in range(iters):
        t0 = time.perf_counter()
        jax_block(enc_flash(params, batch))
        t_flash += time.perf_counter() - t0
        t0 = time.perf_counter()
        jax_block(enc_fused(params, batch))
        t_fused += time.perf_counter() - t0

    out_flash = np.asarray(enc_flash(params, batch)[0], np.float32)
    out_fused = np.asarray(enc_fused(params, batch)[0], np.float32)
    print(json.dumps({
        "b": b, "iters": iters,
        "encode_ms_flash_default": round(t_flash / iters * 1e3, 2),
        "encode_ms_fused_kernel": round(t_fused / iters * 1e3, 2),
        "max_abs_diff": float(np.abs(out_flash - out_fused).max()),
    }))


if __name__ == "__main__":
    main()
