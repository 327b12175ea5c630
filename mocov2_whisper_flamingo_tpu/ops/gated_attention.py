"""Fully-fused Flamingo gated cross-attention block (Pallas, TPU).

The north-star kernel from SURVEY.md §2.3: one Pallas call computes the
entire attention half of the reference's gated block
(reference: gate_cross_attention.py:40-43)

    out = x + OutProj(MHA(LN(x) @ Wq + bq, K, V, mask)) * tanh(gate)

for a query tile, with the video K/V (projected once per layer outside the
kernel — they don't depend on x) resident in VMEM:

- LN in fp32 (the reference's fp32-LayerNorm island),
- q projection, per-head attention (batched dot_generals over heads on the
  MXU), output projection, gate multiply and residual add all fused — the
  intermediate attention tensor never round-trips HBM,
- key-padding mask as an additive bias row.

Grid: (B, nQ); the whole key axis is one block (fusion sequences are <= a
few hundred frames after the reference's 400-frame cap).

Backward: custom_vjp that recomputes through the mathematically identical
XLA composition (exact gradients, zero extra residual memory).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(x_ref, k_ref, v_ref, bias_ref, ln_scale_ref, ln_bias_ref,
            wq_ref, bq_ref, wo_ref, bo_ref, gate_ref, out_ref, acc_scr,
            *, n_heads: int, scale: float):
    """One (batch, q-tile, head) program. Heads are the innermost grid axis;
    each head's out-projection contribution accumulates into VMEM scratch,
    and the final head adds bias/gate/residual. All ops are 2D — Mosaic
    cannot shape-cast across the lane dimension, so heads are split by the
    grid (weights arrive pre-sliced per head: wq [D, Dh], wo [Dh, D])."""
    h = pl.program_id(2)
    n_h = pl.num_programs(2)

    @pl.when(h == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    x = x_ref[0]                      # [BQ, D] residual / query source

    # fp32 LayerNorm island
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    ln = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    ln = ln * ln_scale_ref[0].astype(jnp.float32) + ln_bias_ref[0].astype(jnp.float32)
    ln = ln.astype(x.dtype)

    qh = jnp.dot(ln, wq_ref[0], preferred_element_type=jnp.float32) + bq_ref[0]
    qh = qh.astype(x.dtype)           # [BQ, Dh]
    kh = k_ref[0, 0]                  # [Tk, Dh]
    vh = v_ref[0, 0]

    s = jax.lax.dot_general(
        qh, kh, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale   # [BQ, Tk]
    s = s + bias_ref[0]               # [1, Tk] broadcast

    m = jnp.max(s, axis=-1, keepdims=True)
    m_safe = jnp.where(m <= NEG_INF, 0.0, m)
    p = jnp.exp(s - m_safe)
    p = jnp.where(s <= NEG_INF, 0.0, p)
    denom = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
    probs = (p / denom).astype(vh.dtype)

    ah = jnp.dot(probs, vh, preferred_element_type=jnp.float32).astype(x.dtype)
    acc_scr[:] += jnp.dot(ah, wo_ref[0], preferred_element_type=jnp.float32)

    @pl.when(h == n_h - 1)
    def _finalize():
        gate = jnp.tanh(gate_ref[0, 0])
        out = acc_scr[:] + bo_ref[0].astype(jnp.float32)
        out_ref[0] = (x.astype(jnp.float32) + out * gate).astype(out_ref.dtype)


def _reference(x, k, v, bias, ln_scale, ln_bias, wq, bq, wo, bo, gate,
               n_heads, scale):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    ln = ((x32 - mean) * jax.lax.rsqrt(var + 1e-5)
          * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)).astype(x.dtype)
    q = (jnp.dot(ln, wq, preferred_element_type=jnp.float32) + bq).astype(x.dtype)
    b, tq, d = q.shape
    tk = k.shape[1]
    dh = d // n_heads
    qh = q.reshape(b, tq, n_heads, dh)
    kh = k.reshape(b, tk, n_heads, dh)
    vh = v.reshape(b, tk, n_heads, dh)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                   preferred_element_type=jnp.float32) * scale
    s = s + bias[:, None, None, :]
    probs = jax.nn.softmax(s, axis=-1)
    attn = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), vh)
    merged = attn.reshape(b, tq, d)
    out = jnp.dot(merged, wo, preferred_element_type=jnp.float32) + bo
    return (x.astype(jnp.float32) + out * jnp.tanh(gate)).astype(x.dtype)


def _fwd_impl(x, k, v, bias, ln_scale, ln_bias, wq, bq, wo, bo, gate,
              n_heads, scale, block_q):
    b, tq, d = x.shape
    tk = k.shape[1]

    def round_up(t, m):
        return -(-t // m) * m

    block_q = min(block_q, round_up(tq, 128))
    tq_p = round_up(tq, block_q)
    tk_p = round_up(tk, 128)

    def pad_t(arr, target):
        if arr.shape[1] == target:
            return arr
        return jnp.pad(arr, ((0, 0), (0, target - arr.shape[1]), (0, 0)))

    dh = d // n_heads
    xp = pad_t(x, tq_p)
    # Split heads OUTSIDE the kernel (Mosaic cannot shape-cast the lane dim):
    # k/v -> [B, H, Tk, Dh]; wq -> [H, D, Dh]; wo -> [H, Dh, D]; bq -> [H, Dh].
    kp = jnp.swapaxes(pad_t(k, tk_p).reshape(b, tk_p, n_heads, dh), 1, 2)
    vp = jnp.swapaxes(pad_t(v, tk_p).reshape(b, tk_p, n_heads, dh), 1, 2)
    wq_h = jnp.swapaxes(wq.reshape(d, n_heads, dh), 0, 1)
    bq_h = bq.reshape(n_heads, 1, dh)
    wo_h = wo.reshape(n_heads, dh, d)
    bias_p = bias if bias.shape[1] == tk_p else jnp.concatenate(
        [bias, jnp.full((b, tk_p - tk), NEG_INF, bias.dtype)], axis=1)

    grid = (b, tq_p // block_q, n_heads)  # heads innermost: accumulation axis
    kernel = functools.partial(_kernel, n_heads=n_heads, scale=scale)
    row = lambda *_: (0, 0)  # noqa: E731  broadcast params to every tile

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bi, qi, hi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk_p, dh), lambda bi, qi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk_p, dh), lambda bi, qi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk_p), lambda bi, qi, hi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, dh), lambda bi, qi, hi: (hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dh), lambda bi, qi, hi: (hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh, d), lambda bi, qi, hi: (hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), row, memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bi, qi, hi: (bi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xp.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * tq_p * d * (2 * d + 2 * tk_p),
            bytes_accessed=(xp.size * 2 + kp.size + vp.size) * xp.dtype.itemsize,
            transcendentals=b * tq_p * tk_p * n_heads,
        ),
    )(xp, kp, vp, bias_p[:, None, :], ln_scale[None], ln_bias[None],
      wq_h, bq_h, wo_h, bo[None], jnp.reshape(gate, (1, 1)))
    return out[:, :tq]


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13))
def _gated_attn(x, k, v, bias, ln_scale, ln_bias, wq, bq, wo, bo, gate,
                n_heads, scale, block_q):
    return _fwd_impl(x, k, v, bias, ln_scale, ln_bias, wq, bq, wo, bo, gate,
                     n_heads, scale, block_q)


def _fwd(x, k, v, bias, ln_scale, ln_bias, wq, bq, wo, bo, gate,
         n_heads, scale, block_q):
    out = _fwd_impl(x, k, v, bias, ln_scale, ln_bias, wq, bq, wo, bo, gate,
                    n_heads, scale, block_q)
    return out, (x, k, v, bias, ln_scale, ln_bias, wq, bq, wo, bo, gate)


def _bwd(n_heads, scale, block_q, res, g):
    x, k, v, bias, ln_scale, ln_bias, wq, bq, wo, bo, gate = res
    _, vjp = jax.vjp(
        lambda *args: _reference(*args, n_heads, scale),
        x, k, v, bias, ln_scale, ln_bias, wq, bq, wo, bo, gate)
    return vjp(g)


_gated_attn.defvjp(_fwd, _bwd)


def gated_cross_attention(
    x: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    attn_params: dict,
    ln_params: dict,
    gate: jnp.ndarray,
    kv_valid: jnp.ndarray | None = None,
    n_heads: int = 8,
    block_q: int = 512,
) -> jnp.ndarray:
    """Fused ``x + OutProj(MHA(LN(x)Wq, k, v, mask)) * tanh(gate)``.

    x: [B, Tq, D] queries/residual. k, v: [B, Tk, D] *pre-projected*
    key/value streams (K/V projections of the video features are computed
    once per layer outside — they are x-independent). attn_params: the
    fusion block's ``attn`` dict (q/out kernels + biases); ln_params: the
    block's ``attn_ln``.
    """
    b, _, d = x.shape
    tk = k.shape[1]
    scale = (d // n_heads) ** -0.5
    bias = (jnp.zeros((b, tk), jnp.float32) if kv_valid is None
            else jnp.where(kv_valid, 0.0, NEG_INF).astype(jnp.float32))
    return _gated_attn(
        x, k, v, bias,
        ln_params["scale"], ln_params["bias"],
        attn_params["q"]["kernel"].astype(x.dtype), attn_params["q"]["bias"].astype(x.dtype),
        attn_params["out"]["kernel"].astype(x.dtype), attn_params["out"]["bias"].astype(x.dtype),
        gate.astype(jnp.float32),
        n_heads, scale, block_q)
