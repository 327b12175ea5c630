"""Fused flash attention (Pallas, TPU).

Streaming-softmax attention over KV blocks — the TPU-native replacement for
the cuDNN/flash kernels the reference gets through torch
``nn.MultiheadAttention`` and HF's flash-attention flag (reference:
gate_cross_attention.py:16,40; config.py:72). Used for Whisper encoder
self-attention (Tq=Tk=1500) and the gated cross-modal fusion
(Tq=Tk=400, video key-padding mask).

Kernel shape: grid (B, H, nQ, nK) with the K axis innermost; VMEM scratch
carries the running max/sum/accumulator across K blocks for one (b, h, qi)
tile; the output tile is written once on the final K step (flash attention
v2 style single-pass). Softmax statistics are fp32 regardless of input
dtype; the q·kᵀ and p·v matmuls hit the MXU per block.

Backward: ``jax.custom_vjp`` whose bwd re-derives gradients through the
mathematically identical XLA attention (recompute strategy — exact
gradients, no extra residual memory). A fused Pallas backward is a later
optimization; training FLOPs here are dominated by the frozen encoders.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# Mesh routing for SPMD: ``pallas_call`` is an opaque custom call to GSPMD,
# which replicates its operands — so under a sharded mesh the kernel must be
# invoked through ``shard_map`` instead, partitioned batch-over-data and
# head-over-model (attention is embarrassingly parallel across both axes; no
# collectives are needed). Set once before tracing (Trainer does this for
# model-axis meshes); cleared with ``set_attention_mesh(None)``.
_ATTENTION_MESH: tuple | None = None


def set_attention_mesh(mesh, batch_axis: str = "data",
                       head_axis: str = "model") -> None:
    """Route subsequent ``flash_attention`` calls through ``jax.shard_map``
    over ``mesh`` (batch axis -> ``batch_axis``, head axis -> ``head_axis``).
    ``None`` restores the plain single-program call. Takes effect at trace
    time — set it before jitting the program that should be sharded."""
    global _ATTENTION_MESH
    _ATTENTION_MESH = None if mesh is None else (mesh, batch_axis, head_axis)


def get_attention_mesh():
    return _ATTENTION_MESH


def _attention_kernel(
    q_ref, k_ref, v_ref, bias_ref,  # inputs
    out_ref,                         # output
    m_scr, l_scr, acc_scr,           # scratch
    *, scale: float, causal: bool, block_q: int, block_k: int,
    causal_offset: int,
):
    ki = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # [BQ, D]
    k = k_ref[0]  # [BK, D]
    v = v_ref[0]  # [BK, D]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [BQ, BK]
    s = s + bias_ref[0]  # key-padding bias row [1, BK] broadcast over BQ

    if causal:
        # causal_offset is computed from the UNPADDED tq/tk (the last real
        # query row attends all real keys). Deriving it from padded sizes is
        # wrong when q and k pad to different block multiples: queries would
        # see up to (pad_k - pad_q) future real keys. Padded key columns are
        # masked by the bias; padded query rows are sliced off by the caller.
        qi = pl.program_id(1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0) + qi * block_q
        cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + ki * block_k
        s = jnp.where(cols <= rows + causal_offset, s, NEG_INF)

    m_prev = m_scr[:]                       # [BQ, 1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    # All-masked rows: keep exp argument finite.
    m_safe = jnp.where(m_new <= NEG_INF, 0.0, m_new)
    p = jnp.exp(s - m_safe)                 # [BQ, BK]
    p = jnp.where(s <= NEG_INF, 0.0, p)
    corr = jnp.exp(jnp.where(m_prev <= NEG_INF, NEG_INF, m_prev - m_safe))
    l_new = l_scr[:] * corr + jnp.sum(p, axis=-1, keepdims=True)
    acc = acc_scr[:] * corr + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = m_new
    l_scr[:] = l_new
    acc_scr[:] = acc

    @pl.when(ki == n_k - 1)
    def _finalize():
        denom = jnp.maximum(l_scr[:], 1e-30)
        out_ref[0] = (acc_scr[:] / denom).astype(out_ref.dtype)


def _cost_estimate(b, h, tq_p, tk_p, d, qp, kp, vp):
    """Scheduler hint for Mosaic; None when any dim is symbolic (jax.export
    with a symbolic batch axis — CostEstimate fields must be ints)."""
    try:
        return pl.CostEstimate(
            flops=int(4 * b * h * tq_p * tk_p * d),
            bytes_accessed=int(
                (qp.size + kp.size + vp.size + qp.size) * qp.dtype.itemsize),
            transcendentals=int(b * h * tq_p * tk_p),
        )
    except TypeError:
        return None


def _pad_to(x: jnp.ndarray, axis: int, multiple: int):
    size = x.shape[axis]
    target = -(-size // multiple) * multiple
    if target == size:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - size)
    return jnp.pad(x, pads)


def _flash_attention_fwd_impl(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, bias: jnp.ndarray,
    scale: float, causal: bool, block_q: int, block_k: int,
) -> jnp.ndarray:
    b, tq, h, d = q.shape
    tk = k.shape[1]

    def _round128(t):
        return max(-(-t // 128) * 128, 128)

    # Keep blocks 128-multiples (Mosaic lowers non-multiple tiles an order of
    # magnitude slower: T=400 blocks compiled 200s+ and ran 20x slow), and
    # prefer a single whole-axis K block — it removes the streaming-softmax
    # rescale and measured fastest on v5e up to a few thousand positions.
    block_q = min(block_q, _round128(tq))
    tk128 = _round128(tk)
    block_k = tk128 if tk128 <= block_k * 2 else block_k

    # Mosaic tiles the last two dims, so fold heads into batch:
    # [B, T, H, D] -> [B*H, T, D]. XLA fuses the transpose with the
    # surrounding projection reshapes.
    def fold(x):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, x.shape[1], d)

    qp = _pad_to(fold(q), 1, block_q)
    kp = _pad_to(fold(k), 1, block_k)
    vp = _pad_to(fold(v), 1, block_k)
    tk_p = kp.shape[1]
    pad_len = tk_p - tk
    bias_p = bias
    if pad_len:
        bias_p = jnp.concatenate(
            [bias, jnp.full((b, pad_len), NEG_INF, bias.dtype)], axis=1)

    tq_p = qp.shape[1]
    grid = (b * h, tq_p // block_q, tk_p // block_k)

    kernel = functools.partial(
        _attention_kernel, scale=scale, causal=causal,
        block_q=block_q, block_k=block_k, causal_offset=tk - tq)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh, qi, ki: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh, qi, ki: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k), lambda bh, qi, ki: (bh // h, 0, ki),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        cost_estimate=_cost_estimate(b, h, tq_p, tk_p, d, qp, kp, vp),
    )(qp, kp, vp, bias_p[:, None, :])
    out = out[:, :tq]  # [B*H, Tq, D]
    return jnp.transpose(out.reshape(b, h, tq, d), (0, 2, 1, 3))


def _reference_attention(q, k, v, bias, scale, causal):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    logits = logits + bias[:, None, None, :]
    if causal:
        tq, tk = q.shape[1], k.shape[1]
        rows = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
        logits = jnp.where((cols <= rows + (tk - tq))[None, None], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_attention(q, k, v, bias, scale, causal, block_q, block_k):
    return _flash_attention_fwd_impl(q, k, v, bias, scale, causal, block_q, block_k)


def _fwd(q, k, v, bias, scale, causal, block_q, block_k):
    out = _flash_attention_fwd_impl(q, k, v, bias, scale, causal, block_q, block_k)
    return out, (q, k, v, bias)


def _bwd(scale, causal, block_q, block_k, residuals, g):
    q, k, v, bias = residuals
    _, vjp = jax.vjp(lambda q_, k_, v_, b_: _reference_attention(q_, k_, v_, b_, scale, causal),
                     q, k, v, bias)
    dq, dk, dv, dbias = vjp(g)
    return dq, dk, dv, dbias


_flash_attention.defvjp(_fwd, _bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_valid: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    causal: bool = False,
    block_q: int = 512,
    block_k: int = 1024,
) -> jnp.ndarray:
    """Flash attention over [B, T, H, Dh] tensors with optional key-padding
    mask (True = valid). Differentiable (recompute backward)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, tk = k.shape[0], k.shape[1]
    if kv_valid is None:
        bias = jnp.zeros((b, tk), jnp.float32)
    else:
        bias = jnp.where(kv_valid, 0.0, NEG_INF).astype(jnp.float32)

    ctx = _ATTENTION_MESH
    if ctx is not None:
        mesh, baxis, haxis = ctx
        n_b = mesh.shape.get(baxis, 1)
        n_h = mesh.shape.get(haxis, 1)
        h = q.shape[2]
        if ((n_b > 1 or n_h > 1) and b % n_b == 0 and h % n_h == 0
                and k.shape[0] == b):
            from jax.sharding import PartitionSpec as P

            qkv_spec = P(baxis, None, haxis, None)
            fa = jax.shard_map(
                lambda q_, k_, v_, b_: _flash_attention(
                    q_, k_, v_, b_, float(scale), causal, block_q, block_k),
                mesh=mesh,
                in_specs=(qkv_spec, qkv_spec, qkv_spec, P(baxis, None)),
                out_specs=qkv_spec,
                check_vma=False,  # pallas_call has no replication rule
            )
            # NOTE on AD: q/k/v cotangents are shard-local exact (attention
            # is independent across batch and heads). The bias cotangent
            # would need a psum over the head axis, but bias is built from a
            # bool mask here — its gradient chain terminates, so none is
            # ever consumed.
            return fa(q, k, v, bias)
    return _flash_attention(q, k, v, bias, float(scale), causal, block_q, block_k)
