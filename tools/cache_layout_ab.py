#!/usr/bin/env python
"""On-chip A/B: rows vs einsum-native ("bhjtd") self-cache layout for the
beam decode (decode-only, encoder features precomputed — the same isolation
as tools/profile_decode.py). Interleaved iterations per CLAUDE.md (device
drift biases block timing). Prints one JSON line.

Usage: cache_layout_ab.py [B] [steps] [iters] [ladder|none] [size]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

from bench import BEAM, EOS, PREFIX, _build, _make_batch, _preprocess, jax_block  # noqa: E402


def main() -> None:
    import jax

    from mocov2_whisper_flamingo_tpu.decode.beam import beam_search

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 156
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    max_len = len(PREFIX) + steps
    ladder = None
    if len(sys.argv) > 4 and sys.argv[4] != "none":
        ladder = tuple(int(x) for x in sys.argv[4].split(","))
    size = sys.argv[5] if len(sys.argv) > 5 else "small"

    net, params = _build(f"whisper-{size}")
    rng = np.random.default_rng(0)
    batch = _make_batch(rng, b)
    encode = jax.jit(lambda p, bt: net.encode(p, _preprocess(bt)))
    feats, valid = encode(params, batch)
    jax.block_until_ready(feats)
    dec_params = net._decode_params(params)

    def make(layout):
        fn = jax.jit(lambda dp, f, v: beam_search(
            net.decoder, dp, f, PREFIX, beam_size=BEAM, max_len=max_len,
            eos_id=EOS, encoder_valid=v, read_windows=ladder,
            cache_layout=layout).sequences)
        t0 = time.perf_counter()
        out = fn(dec_params, feats, valid)
        out.block_until_ready()
        compile_s = time.perf_counter() - t0
        print(f"[ab] layout={layout} compiled+ran in {compile_s:.0f}s",
              file=sys.stderr, flush=True)
        return fn, np.asarray(out), compile_s

    rows_fn, rows_out, rows_c = make("rows")
    native_fn, native_out, native_c = make("bhjtd")

    t_rows = t_native = 0.0
    for _ in range(iters):
        t0 = time.perf_counter()
        jax_block(rows_fn(dec_params, feats, valid))
        t_rows += time.perf_counter() - t0
        t0 = time.perf_counter()
        jax_block(native_fn(dec_params, feats, valid))
        t_native += time.perf_counter() - t0

    print(json.dumps({
        "b": b, "size": size, "steps": steps, "iters": iters,
        "ladder": list(ladder) if ladder else None,
        "rows_ms_per_step": round(t_rows / iters / steps * 1e3, 3),
        "bhjtd_ms_per_step": round(t_native / iters / steps * 1e3, 3),
        "compile_s": [round(rows_c, 1), round(native_c, 1)],
        "tokens_match": bool(np.array_equal(rows_out, native_out)),
    }))


if __name__ == "__main__":
    main()
