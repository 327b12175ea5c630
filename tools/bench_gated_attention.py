#!/usr/bin/env python
"""Shape sweep for the fused Pallas gated-cross-attention kernel.

VERDICT round 2, item 10: at the reference's truncated fusion shape
(Tq=Tk=400 after av_net.py:92-96's min-len cut) the fused kernel only ties
XLA's fused chain — this sweep measures where (if anywhere) owning the
schedule wins: the no-truncation variant that fuses at the full encoder
length (Tq=1500 audio-aligned queries), longer key streams, and wider
batches. Forward-only and fwd+bwd (the custom_vjp recomputes through the
XLA twin, so backward is expected to tie).

Run exclusively on the chip:  python tools/bench_gated_attention.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

D = 512
H = 8

# (B, Tq, Tk): reference-truncated, audio-aligned no-truncation fusion
# (1500 queries over <=400 video keys), long-key variants, wide batch.
SHAPES = [
    (4, 400, 400),
    (4, 1500, 400),
    (4, 1500, 1500),
    (16, 400, 400),
    (16, 1500, 400),
    (1, 3000, 1500),
]


def _time(fn, *args, iters=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--dtype", default="bfloat16")
    parser.add_argument("--backward", action="store_true",
                        help="also time fwd+bwd (value_and_grad wrt x)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from mocov2_whisper_flamingo_tpu.ops import gated_attention as ga

    dtype = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    results = []
    for b, tq, tk in SHAPES:
        x = jnp.asarray(rng.standard_normal((b, tq, D)), dtype)
        k = jnp.asarray(rng.standard_normal((b, tk, D)), dtype)
        v = jnp.asarray(rng.standard_normal((b, tk, D)), dtype)
        bias = jnp.zeros((b, tk), jnp.float32)
        ln_s = jnp.ones((D,), jnp.float32)
        ln_b = jnp.zeros((D,), jnp.float32)
        wq = jnp.asarray(rng.standard_normal((D, D)) * 0.02, dtype)
        bq = jnp.zeros((D,), dtype)
        wo = jnp.asarray(rng.standard_normal((D, D)) * 0.02, dtype)
        bo = jnp.zeros((D,), jnp.float32)
        gate = jnp.asarray(0.5, jnp.float32)
        scale = (D // H) ** -0.5
        common = (x, k, v, bias, ln_s, ln_b, wq, bq, wo, bo, gate)

        # custom_vjp nondiff args must be positional
        fused = jax.jit(lambda *a: ga._gated_attn(*a, H, scale, 512))
        xla = jax.jit(lambda *a: ga._reference(*a, H, scale))

        t_fused = _time(fused, *common, iters=args.iters)
        t_xla = _time(xla, *common, iters=args.iters)
        row = {"shape": f"B{b} Tq{tq} Tk{tk}",
               "fused_ms": round(t_fused, 3), "xla_ms": round(t_xla, 3),
               "speedup": round(t_xla / t_fused, 3)}

        if args.backward:
            def loss_fused(xx):
                return ga._gated_attn(xx, *common[1:], H, scale, 512).sum()

            def loss_xla(xx):
                return ga._reference(xx, *common[1:], H, scale).sum()

            g_fused = jax.jit(jax.value_and_grad(loss_fused))
            g_xla = jax.jit(jax.value_and_grad(loss_xla))
            row["fused_fwdbwd_ms"] = round(_time(g_fused, x, iters=args.iters), 3)
            row["xla_fwdbwd_ms"] = round(_time(g_xla, x, iters=args.iters), 3)

        print(json.dumps(row))
        results.append(row)

    best = max(results, key=lambda r: r["speedup"])
    print(json.dumps({"best_shape": best["shape"],
                      "best_speedup": best["speedup"]}))


if __name__ == "__main__":
    main()
