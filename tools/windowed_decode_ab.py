#!/usr/bin/env python
"""On-chip A/B: windowed-prefix beam scan vs the full-window scan at the
B=16 serving bucket (decode-only, encoder features precomputed — the same
isolation as tools/profile_decode.py). Prints one JSON line."""

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
    ladder = tuple(int(x) for x in sys.argv[4].split(",")) if len(sys.argv) > 4 \
        else (48, 96, max_len)
    size = sys.argv[5] if len(sys.argv) > 5 else "small"

    net, params = _build(f"whisper-{size}")
    rng = np.random.default_rng(0)
    batch = _make_batch(rng, b)
    encode = jax.jit(lambda p, bt: net.encode(p, _preprocess(bt)))
    feats, valid = encode(params, batch)
    jax.block_until_ready(feats)
    dec_params = net._decode_params(params)

    def make(windows):
        fn = jax.jit(lambda dp, f, v: beam_search(
            net.decoder, dp, f, PREFIX, beam_size=BEAM, max_len=max_len,
            eos_id=EOS, encoder_valid=v, read_windows=windows).sequences)
        t0 = time.perf_counter()
        out = fn(dec_params, feats, valid)
        out.block_until_ready()
        print(f"[ab] windows={windows} compiled+ran in "
              f"{time.perf_counter()-t0:.0f}s", file=sys.stderr, flush=True)
        return fn, np.asarray(out)

    full_fn, full_out = make(None)
    win_fn, win_out = make(ladder)

    t_full = t_win = 0.0
    for _ in range(iters):
        t0 = time.perf_counter()
        jax_block(full_fn(dec_params, feats, valid))
        t_full += time.perf_counter() - t0
        t0 = time.perf_counter()
        jax_block(win_fn(dec_params, feats, valid))
        t_win += time.perf_counter() - t0

    print(json.dumps({
        "b": b, "size": size, "steps": steps, "iters": iters,
        "ladder": list(ladder),
        "full_ms_per_step": round(t_full / iters / steps * 1e3, 3),
        "windowed_ms_per_step": round(t_win / iters / steps * 1e3, 3),
        "tokens_match": bool(np.array_equal(full_out, win_out)),
    }))


if __name__ == "__main__":
    main()
