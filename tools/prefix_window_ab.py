#!/usr/bin/env python
"""On-chip A/B: prefix teacher-forcing on the first-rung cache slice vs the
default full-cache prefix scan (decode-only, encoder features precomputed —
the same isolation as tools/cache_layout_ab.py). The windowed main loop
confines per-step cost to the ladder rung; the prefix scan was the one
remaining full-max_len reader (ADVICE r4). MEASURED NEGATIVE on chip —
B=16 bhjtd fifths: full 5.34 vs rung-sliced 5.79 ms/step (+8%, tokens
exact): pre-slicing before the prefix writes costs the first segment its
DUS aliasing, dwarfing the ~0.09 ms/step prefix saving. Default stays
full-cache. Interleaved iterations per CLAUDE.md. Prints one JSON line.

Usage: prefix_window_ab.py [B] [steps] [iters] [ladder] [layout] [size]
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
    ladder = tuple(int(x) for x in (
        sys.argv[4] if len(sys.argv) > 4 else "32,64,96,128,160").split(","))
    layout = sys.argv[5] if len(sys.argv) > 5 else "bhjtd"
    size = sys.argv[6] if len(sys.argv) > 6 else "small"

    net, params = _build(f"whisper-{size}")
    rng = np.random.default_rng(0)
    batch = _make_batch(rng, b)
    encode = jax.jit(lambda p, bt: net.encode(p, _preprocess(bt)))
    feats, valid = encode(params, batch)
    jax.block_until_ready(feats)
    dec_params = net._decode_params(params)

    def make(in_window):
        fn = jax.jit(lambda dp, f, v: beam_search(
            net.decoder, dp, f, PREFIX, beam_size=BEAM, max_len=max_len,
            eos_id=EOS, encoder_valid=v, read_windows=ladder,
            cache_layout=layout, _prefix_in_window=in_window).sequences)
        t0 = time.perf_counter()
        out = fn(dec_params, feats, valid)
        out.block_until_ready()
        compile_s = time.perf_counter() - t0
        print(f"[ab] prefix_in_window={in_window} compiled+ran in "
              f"{compile_s:.0f}s", file=sys.stderr, flush=True)
        return fn, np.asarray(out), compile_s

    full_fn, full_out, full_c = make(False)
    win_fn, win_out, win_c = make(True)

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
        "ladder": list(ladder), "layout": layout,
        "full_prefix_ms_per_step": round(t_full / iters / steps * 1e3, 3),
        "rung_prefix_ms_per_step": round(t_win / iters / steps * 1e3, 3),
        "compile_s": [round(full_c, 1), round(win_c, 1)],
        "tokens_match": bool(np.array_equal(full_out, win_out)),
    }))


if __name__ == "__main__":
    main()
