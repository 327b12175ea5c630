"""Multi-head attention primitives.

A single entry point ``multi_head_attention`` with two backends:

- ``"xla"``: plain jnp einsum attention — the reference semantics, used on
  CPU (tests) and as the autodiff-friendly fallback.
- ``"pallas"``: the fused flash-attention kernel in
  :mod:`mocov2_whisper_flamingo_tpu.ops.flash_attention` (TPU only).

Layout convention everywhere: ``[B, T, H, Dh]`` for q/k/v (batch, time,
heads, head dim). Masks are boolean with **True = valid** (note the reference
uses torch's key_padding_mask convention True = pad at
reference: gate_cross_attention.py:40; conversion happens at the model layer).

Softmax is computed in fp32 regardless of input dtype (TPU bf16 practice and
matches torch's fp32 softmax in nn.MultiheadAttention).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_valid: jnp.ndarray | None,
    scale: float,
    causal: bool,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
) -> jnp.ndarray:
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits.astype(jnp.float32) * scale
    if kv_valid is not None:
        logits = jnp.where(kv_valid[:, None, None, :], logits, NEG_INF)
    if causal:
        tq, tk = q.shape[1], k.shape[1]
        # Offset so the last query attends to all keys (needed for KV-cached
        # decode where tq < tk).
        row = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
        causal_ok = col <= row + (tk - tq)
        logits = jnp.where(causal_ok[None, None], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        # Attention-PROB dropout, torch nn.MultiheadAttention's train-mode
        # semantics (reference: gate_cross_attention.py:16 uses dropout=0.1
        # inside MHA): per-element bernoulli on the post-softmax probs,
        # scaled by 1/(1-p).
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
    return out


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_valid: jnp.ndarray | None = None,
    scale: float | None = None,
    causal: bool = False,
    backend: str = "xla",
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
) -> jnp.ndarray:
    """Scaled dot-product attention over ``[B, T, H, Dh]`` tensors.

    kv_valid: optional [B, Tk] bool, True where the key/value position is
    real (padding positions are excluded from the softmax).

    dropout_rate/dropout_rng: attention-probability dropout (train only;
    pass ``dropout_rng=None`` for eval). Supported on the XLA path only —
    the flash kernel streams probabilities block-by-block and never
    materializes them, so callers requiring prob dropout fall back to XLA.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    active_dropout = dropout_rate > 0.0 and dropout_rng is not None
    if backend == "pallas" and not active_dropout:
        from mocov2_whisper_flamingo_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, kv_valid=kv_valid, scale=scale, causal=causal)
    return _xla_attention(q, k, v, kv_valid, scale, causal,
                          dropout_rate, dropout_rng)


def default_attention_backend() -> str:
    """Pallas on TPU, XLA elsewhere."""
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:
        platform = "cpu"
    return "pallas" if platform == "tpu" else "xla"
