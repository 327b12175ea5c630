#!/usr/bin/env python
"""On-chip breakdown of the continuous-batching engine's cost centers:
segment program steady-state, the per-segment [R] heur sync, encode
buckets, admit. Prints one JSON line.

Usage: continuous_probe.py [capacity] [iters]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

from bench import BEAM, EOS, MAX_TOKENS, PREFIX, T_VIDEO, _build  # noqa: E402


def main() -> None:
    import jax

    from mocov2_whisper_flamingo_tpu.serving.continuous import (
        init_state, make_admit_fn, make_segment_fn)
    from mocov2_whisper_flamingo_tpu.decode.streaming import _cross_caches  # noqa: F401

    capacity = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    seg_steps = 32
    m = MAX_TOKENS // seg_steps

    net, params = _build("whisper-small")
    dec_params = net._decode_params(params)
    rng = np.random.default_rng(0)

    from mocov2_whisper_flamingo_tpu.ops.video import eval_video_pipeline

    @jax.jit
    def _encode(p, batch):
        audio, audio_mask, video_u8, video_mask, video_len = batch
        video = eval_video_pipeline(video_u8, resize=64)
        return net.encode(p, (audio, audio_mask, video, video_mask, video_len))

    def batch_of(b):
        return (
            jax.device_put(np.asarray(
                rng.standard_normal((b, 3000, 80)), np.float32)),
            jax.device_put(np.ones((b, 3000), bool)),
            jax.device_put(rng.integers(0, 255, (b, T_VIDEO, 3, 88, 88)
                                        ).astype(np.uint8)),
            jax.device_put(np.ones((b, T_VIDEO), bool)),
            jax.device_put(np.full((b,), T_VIDEO, np.int32)),
        )

    out = {"capacity": capacity, "seg_steps": seg_steps}

    # encode buckets
    enc_ms = {}
    feats = valid = None
    for b in (1, 4, 16):
        batch = batch_of(b)
        t0 = time.perf_counter()
        f, v = _encode(params, batch)
        jax.block_until_ready(f)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(3):
            f, v = _encode(params, batch)
        jax.block_until_ready(f)
        enc_ms[b] = round((time.perf_counter() - t0) / 3 * 1e3, 1)
        if b == 1:
            feats, valid = f, v
        out[f"encode_b{b}_compile_s"] = round(compile_s, 1)
    out["encode_ms"] = enc_ms

    enc_len = feats.shape[1]
    state = init_state(net.decoder, capacity=capacity, beam_size=BEAM,
                       seg_steps=seg_steps, n_segments=m, enc_len=enc_len,
                       eos_id=EOS)
    admit = make_admit_fn(net.decoder, PREFIX, EOS, BEAM, MAX_TOKENS)
    segment = make_segment_fn(net.decoder, beam_size=BEAM,
                              seg_steps=seg_steps, n_segments=m,
                              n_prefix=len(PREFIX), eos_id=EOS)
    t0 = time.perf_counter()
    for r in range(capacity):
        state = admit(dec_params, state, feats, valid, np.int32(r))
    jax.block_until_ready(state["admit_tick"])
    out["admit_all_rows_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    state = segment(dec_params, state)
    jax.block_until_ready(state["heur_ok"])
    out["segment_compile_s"] = round(time.perf_counter() - t0, 1)

    t_seg = t_sync = 0.0
    for _ in range(iters):
        t0 = time.perf_counter()
        state = segment(dec_params, state)
        t_seg += time.perf_counter() - t0  # async dispatch cost
        t0 = time.perf_counter()
        np.asarray(state["heur_ok"])  # the per-segment sync
        t_sync += time.perf_counter() - t0
    out["segment_dispatch_ms"] = round(t_seg / iters * 1e3, 1)
    out["segment_sync_ms"] = round(t_sync / iters * 1e3, 1)
    out["ms_per_step"] = round((t_seg + t_sync) / iters / seg_steps * 1e3, 3)

    # retirement readback cost
    t0 = time.perf_counter()
    _ = np.asarray(state["pool_tokens"][0, 0])
    out["readback_row_ms"] = round((time.perf_counter() - t0) * 1e3, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
