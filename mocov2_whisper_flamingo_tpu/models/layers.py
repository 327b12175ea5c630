"""Minimal functional layer library.

Params are plain nested-dict pytrees of jnp arrays (init/apply pairs), which
keeps full control over sharding annotations under pjit and avoids framework
state. Compute-dtype policy: matmul/conv inputs are cast to the policy's
compute dtype (bf16 on TPU), while LayerNorm and softmax stay in fp32 —
mirroring the reference's fp32-LayerNorm islands under AMP
(reference: gate_cross_attention.py:8-10).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict  # nested dict pytree of jnp.ndarray


@dataclasses.dataclass(frozen=True)
class Precision:
    compute_dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def cast(self, x: jnp.ndarray) -> jnp.ndarray:
        return x.astype(self.compute_dtype)


FP32 = Precision()
BF16 = Precision(compute_dtype=jnp.bfloat16)


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


# -- Linear -----------------------------------------------------------------


def linear_init(key, d_in: int, d_out: int, bias: bool = True, dtype=jnp.float32) -> Params:
    """Kaiming-uniform fan-in init (torch.nn.Linear default), weight stored
    [d_in, d_out] (transposed vs torch for right-matmul on the MXU)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(d_in)
    p = {"kernel": _uniform(kw, (d_in, d_out), bound, dtype)}
    if bias:
        p["bias"] = _uniform(kb, (d_out,), bound, dtype)
    return p


def linear(params: Params, x: jnp.ndarray, precision: Precision = FP32) -> jnp.ndarray:
    if "kernel_q" in params:
        # Weight-only int8 (see ``quantize_linear``): the kernel is stored
        # int8 in HBM and converted to the compute dtype on the fly — XLA
        # fuses the convert into the dot's operand read, so the weight HBM
        # traffic (the decode step's dominant cost at medium/large sizes)
        # halves vs bf16. The per-output-column scale is applied to the
        # matmul OUTPUT, which is algebraically exact.
        w = params["kernel_q"].astype(precision.compute_dtype)
        y = jnp.matmul(precision.cast(x), w, preferred_element_type=jnp.float32)
        y = y * params["scale"]
        if "bias" in params:
            y = y + params["bias"].astype(jnp.float32)
        return y.astype(precision.compute_dtype)
    w = precision.cast(params["kernel"])
    y = jnp.matmul(precision.cast(x), w, preferred_element_type=w.dtype)
    if "bias" in params:
        y = y + precision.cast(params["bias"])
    return y


def quantize_linear(params: Params) -> Params:
    """Weight-only symmetric int8 quantization of a linear param dict.

    Per-OUTPUT-channel max-abs scales (one f32 scalar per kernel column):
    ``y = (x @ q) * scale + bias`` is exact in the scale algebra, so the
    only error is the int8 rounding of the weights (~0.4% RMS per matmul).
    Built for the autoregressive decode step, where every weight byte is
    re-read from HBM each token and the step is bandwidth-bound at
    medium/large model sizes — int8 halves that traffic vs bf16 while the
    MXU still computes in the bf16 compute dtype (w8a16). The ``bias``
    passes through untouched."""
    w = params["kernel"].astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=0) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.round(w / scale[None, :]).astype(jnp.int8)
    out = {"kernel_q": q, "scale": scale}
    if "bias" in params:
        out["bias"] = params["bias"]
    return out


# -- LayerNorm (fp32 island) --------------------------------------------------


def layer_norm_init(dim: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(params: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm computed in fp32 then cast back to the input dtype, matching
    the reference's cast-through LayerNorm (reference:
    gate_cross_attention.py:8-10)."""
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(orig_dtype)


# -- Conv1d (NTC layout) -------------------------------------------------------


def conv1d_init(key, c_in: int, c_out: int, kernel: int, bias: bool = True,
                dtype=jnp.float32) -> Params:
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(c_in * kernel)
    p = {"kernel": _uniform(kw, (kernel, c_in, c_out), bound, dtype)}
    if bias:
        p["bias"] = _uniform(kb, (c_out,), bound, dtype)
    return p


def conv1d(params: Params, x: jnp.ndarray, stride: int = 1, padding: int = 0,
           precision: Precision = FP32) -> jnp.ndarray:
    """x: [B, T, C_in] -> [B, T', C_out]."""
    w = precision.cast(params["kernel"])
    y = jax.lax.conv_general_dilated(
        precision.cast(x), w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=w.dtype,
    )
    if "bias" in params:
        y = y + precision.cast(params["bias"])
    return y


# -- Embedding ----------------------------------------------------------------


def embedding_init(key, vocab: int, dim: int, dtype=jnp.float32) -> Params:
    return {"embedding": jax.random.normal(key, (vocab, dim), dtype)}


def embed(params: Params, ids: jnp.ndarray) -> jnp.ndarray:
    if "embedding_q" in params:
        # int8 table (see ``quantize_embedding``): per-ROW scales, so a
        # looked-up row dequantizes exactly as row * scale[row].
        rows = jnp.take(params["embedding_q"], ids, axis=0).astype(jnp.float32)
        return rows * jnp.take(params["scale"], ids, axis=0)[..., None]
    return jnp.take(params["embedding"], ids, axis=0)


def quantize_embedding(params: Params) -> Params:
    """Weight-only symmetric int8 quantization of an embedding table with
    per-ROW (per-token) scales. One quantization serves both tied uses:
    lookup dequantizes row-wise (``embed``), and the tied vocab projection
    ``x @ table.T`` scales its output column v by ``scale[v]`` — both exact
    in the scale algebra. The table is the single largest per-step HBM read
    of the decode step (e.g. 40 M params at whisper-small), re-read every
    token by the logits matmul."""
    emb = params["embedding"].astype(jnp.float32)
    scale = jnp.max(jnp.abs(emb), axis=1) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.round(emb / scale[:, None]).astype(jnp.int8)
    return {"embedding_q": q, "scale": scale}


# -- Positional encodings -------------------------------------------------------


def sinusoid_position_encoding(length: int, dim: int, base: float = 10000.0) -> np.ndarray:
    """Whisper-style sinusoids: [sin | cos] concatenated over the feature dim
    (used for the encoder's fixed positional embedding)."""
    half = dim // 2
    log_timescale = math.log(base) / (half - 1)
    inv_timescales = np.exp(-log_timescale * np.arange(half))
    scaled = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


def interleaved_position_encoding(length: int, dim: int, base: float = 10000.0) -> np.ndarray:
    """Classic transformer PE with sin/cos interleaved over even/odd feature
    indices — matches the reference's ``PositionalEncoding`` buffer
    (reference: models/utils.py:8-28)."""
    pe = np.zeros((length, dim), dtype=np.float32)
    position = np.arange(length, dtype=np.float64)[:, None]
    denom = np.exp(np.arange(0, dim, 2, dtype=np.float64) * (-math.log(base) / dim))
    pe[:, 0::2] = np.sin(position * denom)
    pe[:, 1::2] = np.cos(position * denom)
    return pe


# -- Dropout --------------------------------------------------------------------


def dropout(x: jnp.ndarray, rate: float, key: jax.Array | None, deterministic: bool) -> jnp.ndarray:
    if deterministic or rate == 0.0 or key is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf-based) GELU, matching torch nn.GELU default."""
    return jax.nn.gelu(x, approximate=False)
