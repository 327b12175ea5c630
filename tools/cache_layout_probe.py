#!/usr/bin/env python
"""Standalone probe for the next-round cache-layout lever (CLAUDE.md).

Mimics the beam decode's per-step cache pattern in isolation — a lax.scan
whose carry is a [ROWS, L, H, D] KV buffer updated by dynamic_update_slice
at step index and consumed by the ancestry-style all-pairs einsums — in two
storage layouts:

  A) rows-major [ROWS, L, H, D] (the production layout; at B=16 XLA lays
     it rows-minor for the einsums and the DUS pays window-sized copies)
  B) einsum-native [B, H, J, T, D] (the candidate fix: the contraction
     batch dims lead, so neither the dot nor the DUS needs a relayout)

Prints one JSON line with ms/step per layout. Decides whether the
full-stack layout migration (init_cache/attention_block/_ancestry_attention/
streaming/int8) is worth a future session.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    b, k, h, d, L = 16, 5, 12, 64, 160
    steps = 156
    rows = b * k
    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.standard_normal((rows, h, d)), jnp.bfloat16)
    anc = jnp.asarray(
        np.broadcast_to(np.eye(k, dtype=np.float32)[None, :, :, None],
                        (b, k, k, L)) + 0.0)
    kv_new = jnp.asarray(rng.standard_normal((rows, h, d)), jnp.bfloat16)

    def run(layout: str):
        if layout == "rows_major":
            cache0 = jnp.zeros((rows, L, h, d), jnp.bfloat16)

            def body(carry, i):
                cache, q = carry
                upd = (q * 0.001 + kv_new).reshape(rows, 1, h, d)
                cache = jax.lax.dynamic_update_slice(cache, upd, (0, i, 0, 0))
                k5 = cache.reshape(b, k, L, h, d)
                q4 = q.reshape(b, k, h, d)
                s = jnp.einsum("bnhd,bjthd->bnjht", q4, k5,
                               preferred_element_type=jnp.float32)
                s2 = jnp.einsum("bnjht,bnjt->bnht", s, anc) * (d ** -0.5)
                p = jax.nn.softmax(
                    jnp.where(jnp.arange(L) <= i, s2, -1e30), axis=-1)
                w = (p[:, :, None] * anc[:, :, :, None, :]).astype(cache.dtype)
                out = jnp.einsum("bnjht,bjthd->bnhd", w, k5)
                return (cache, out.reshape(rows, h, d)), None
        else:  # einsum_native [B, H, J, T, D]
            cache0 = jnp.zeros((b, h, k, L, d), jnp.bfloat16)
            anc_t = jnp.transpose(anc, (0, 1, 2, 3))  # [b, n, j, t]

            def body(carry, i):
                cache, q = carry
                upd = (q * 0.001 + kv_new).reshape(b, k, h, d)
                upd = jnp.transpose(upd, (0, 2, 1, 3)).reshape(b, h, k, 1, d)
                cache = jax.lax.dynamic_update_slice(
                    cache, upd, (0, 0, 0, i, 0))
                q4 = q.reshape(b, k, h, d)
                # s[b,n,j,h,t]: batch (b,h), contract d — rhs already
                # [b,h,j,t,d], no relayout
                s = jnp.einsum("bnhd,bhjtd->bnjht", q4, cache,
                               preferred_element_type=jnp.float32)
                s2 = jnp.einsum("bnjht,bnjt->bnht", s, anc_t) * (d ** -0.5)
                p = jax.nn.softmax(
                    jnp.where(jnp.arange(L) <= i, s2, -1e30), axis=-1)
                w = (p[:, :, None] * anc_t[:, :, :, None, :]).astype(cache.dtype)
                out = jnp.einsum("bnjht,bhjtd->bnhd", w, cache)
                return (cache, out.reshape(rows, h, d)), None

        fn = jax.jit(lambda c, q: jax.lax.scan(
            body, (c, q), jnp.arange(steps))[0][1])
        t0 = time.perf_counter()
        out = fn(cache0, q0)
        out.block_until_ready()
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        iters = 5
        for _ in range(iters):
            out = fn(cache0, q0)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        return dt / steps * 1e3, compile_s, np.asarray(out, np.float32)

    ms_a, ca, out_a = run("rows_major")
    ms_b, cb, out_b = run("einsum_native")
    print(json.dumps({
        "rows_major_ms_per_step": round(ms_a, 3),
        "einsum_native_ms_per_step": round(ms_b, 3),
        "compile_s": [round(ca, 1), round(cb, 1)],
        "outputs_close": bool(np.allclose(out_a, out_b, atol=1e-2)),
    }))


if __name__ == "__main__":
    main()
