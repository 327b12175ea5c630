#!/usr/bin/env python
"""B=16 serving-bucket quantization A/B (round-3 verdict, next #3).

The B=16 beam=5 decode step is bandwidth-bound on KV-cache + weight traffic
(BASELINE.md: 8.7 ms/step, 311x). Round 3 measured the levers SEPARATELY
(w8a16 weights at B=4; int8-cross KV at B=16); this measures all four
combinations INTERLEAVED in one process (the tunnel's ~20% cross-process
variance would drown the deltas):

  A: bf16 weights, bf16 KV      (baseline)
  B: int8 weights (w8a16), bf16 KV
  C: bf16 weights, int8-cross KV (cross cache quantized, self cache bf16)
  D: int8 weights + int8-cross  (the combined candidate)

Run exclusively on the TPU. Prints one JSON line with ms/step and rtf per
variant; decision + numbers recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

from bench import (  # noqa: E402
    B, BEAM, EOS, MAX_TOKENS, PREFIX, SECONDS_PER_CLIP, _build, _make_batch,
    _preprocess, jax_block)


def main() -> None:
    import jax

    b = 16
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    net, params = _build("whisper-small")
    rng = np.random.default_rng(0)
    batch = _make_batch(rng, b)

    variants = {
        "bf16": dict(weight_quant=None, cache_quant=None),
        "w8a16": dict(weight_quant="int8", cache_quant=None),
        "int8_cross": dict(weight_quant=None, cache_quant="int8-cross"),
        "w8a16+int8_cross": dict(weight_quant="int8",
                                 cache_quant="int8-cross"),
    }
    fns = {}
    for name, kw in variants.items():
        fns[name] = jax.jit(lambda p, bt, kw=kw: net.beam(
            p, _preprocess(bt), PREFIX, beam_size=BEAM, max_len=MAX_TOKENS,
            eos_id=EOS, **kw).sequences)

    encode = jax.jit(lambda p, bt: net.encode(p, _preprocess(bt)))
    # Warm every program before timing anything (compiles are serialized
    # through the tunnel; keep them out of the measurement loop).
    toks = {}
    for name, fn in fns.items():
        t0 = time.perf_counter()
        toks[name] = np.asarray(fn(params, batch))
        print(f"[ab] compiled {name} in {time.perf_counter()-t0:.0f}s",
              file=sys.stderr, flush=True)
    jax_block(encode(params, batch))

    # Interleave all four variants per iteration: device-state drift biases
    # none of them (CLAUDE.md drift note).
    totals = {name: 0.0 for name in fns}
    for _ in range(iters):
        for name, fn in fns.items():
            t0 = time.perf_counter()
            jax_block(fn(params, batch))
            totals[name] += time.perf_counter() - t0
    t0 = time.perf_counter()
    jax_block(encode(params, batch))
    enc_s = time.perf_counter() - t0

    n_steps = MAX_TOKENS - len(PREFIX)
    out = {"b": b, "iters": iters, "encode_ms": round(enc_s * 1e3, 2)}
    base = toks["bf16"]
    for name, total in totals.items():
        dt = total / iters
        out[name] = {
            "rtf": round(b * SECONDS_PER_CLIP / dt, 1),
            "decode_ms_per_step": round((dt - enc_s) * 1e3 / n_steps, 3),
            "total_ms": round(dt * 1e3, 1),
            "tokens_match_bf16": bool(np.array_equal(toks[name], base)),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
