"""Whisper encoder/decoder in JAX (functional, pjit-friendly).

Architecture parity with HF ``WhisperModel`` (the reference loads
``openai/whisper-small`` and uses only its encoder at
reference: av_net.py:22,78-81; the decoder here additionally powers the
KV-cached beam-search path the north star requires, which the reference never
had — it only argmaxes a linear head, reference: train.py:130-141).

Structure (pre-LN transformer):
- encoder: conv1(k3,s1) -> gelu -> conv2(k3,s2) -> gelu -> +sinusoid PE ->
  N x [self-attn, mlp] -> final LN. Input [B, n_mels, 3000] -> [B, 1500, D].
- decoder: token embed + learned PE -> N x [causal self-attn, cross-attn,
  mlp] -> final LN -> logits via tied embedding.

TPU notes: all shapes static; self-attention uses the Pallas flash kernel on
TPU (``backend="pallas"``); weights live in fp32 and compute in bf16 with
fp32 LayerNorm/softmax islands; the decoder exposes an explicit KV cache
(pre-allocated [B, max_len, H, Dh] buffers updated with
``lax.dynamic_update_slice``) so the whole beam loop stays inside one jit.
"""

from __future__ import annotations

import dataclasses
# (typing imports trimmed)

import jax
import jax.numpy as jnp

from mocov2_whisper_flamingo_tpu.models import layers as L
from mocov2_whisper_flamingo_tpu.ops.attention import multi_head_attention


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    n_mels: int = 80
    d_model: int = 768
    encoder_layers: int = 12
    decoder_layers: int = 12
    n_heads: int = 12
    d_ff: int = 3072
    vocab_size: int = 51865
    max_source_positions: int = 1500
    max_target_positions: int = 448
    activation: str = "gelu"

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads


# Official Whisper size table (HF config values).
WHISPER_SIZES = {
    "whisper-tiny": WhisperConfig(d_model=384, encoder_layers=4, decoder_layers=4, n_heads=6, d_ff=1536),
    "whisper-base": WhisperConfig(d_model=512, encoder_layers=6, decoder_layers=6, n_heads=8, d_ff=2048),
    "whisper-small": WhisperConfig(d_model=768, encoder_layers=12, decoder_layers=12, n_heads=12, d_ff=3072),
    "whisper-medium": WhisperConfig(d_model=1024, encoder_layers=24, decoder_layers=24, n_heads=16, d_ff=4096),
    "whisper-large-v2": WhisperConfig(d_model=1280, encoder_layers=32, decoder_layers=32, n_heads=20, d_ff=5120),
}


def config_for(name: str) -> WhisperConfig:
    key = name.split("/")[-1]
    if key not in WHISPER_SIZES:
        raise ValueError(f"Unknown whisper size {name!r}; known: {sorted(WHISPER_SIZES)}")
    return WHISPER_SIZES[key]


# ---------------------------------------------------------------------------
# Attention block (shared by encoder/decoder self/cross attention)
# ---------------------------------------------------------------------------


def _attn_init(key, d_model: int, k_bias: bool = False) -> L.Params:
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "q": L.linear_init(kq, d_model, d_model, bias=True),
        "k": L.linear_init(kk, d_model, d_model, bias=k_bias),
        "v": L.linear_init(kv, d_model, d_model, bias=True),
        "out": L.linear_init(ko, d_model, d_model, bias=True),
    }


def _split_heads(x: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    b, t, d = x.shape
    return x.reshape(b, t, n_heads, d // n_heads)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, t, h, dh = x.shape
    return x.reshape(b, t, h * dh)


def _quantize_kv(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-(position, head) int8 quantization of K/V rows.

    x: [..., H, Dh] -> (int8 values, f32 scales [..., H]). Each head's
    Dh-vector gets one max-abs scale — the row is written ONCE (append-only
    cache) and read every subsequent step, so decode becomes cheaper the
    moment the int8 read replaces the bf16 read: at the B=16 serving bucket
    the step is HBM-bandwidth-bound on cache traffic (BENCH_r02: 8.78
    ms/step) and the cache bytes halve. Scales are folded into the
    attention algebra (score x k_scale after the QK dot; v_scale into the
    probabilities before the PV dot), so nothing is dequantized in HBM.
    """
    scale = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.round(x.astype(jnp.float32) / scale[..., None]).astype(jnp.int8)
    return q, scale


def _native_cache_write(cache: dict, k, v, k_s, v_s, cache_index,
                        write_gate) -> dict:
    """Write one step's K/V rows into an einsum-native [B, H, J, T, Dh]
    self cache (``init_cache(layout="bhjtd")``).

    k/v arrive row-major [B*J, 1, H, Dh] (with [B*J, 1, H] scales when the
    cache is int8) straight off the projection; the transpose to the
    cache's (b, h, j) leading dims is a [B*J, H, Dh]-sized shuffle — noise
    next to the per-step cache traffic the layout exists to avoid. The
    ``write_gate`` semantics match the rows layout: when False the rows at
    ``cache_index`` are preserved (streaming's fixed-trip overrun guard).
    """
    b, h, j = cache["k"].shape[:3]

    def to_native(x):  # [B*J, 1, H, Dh] -> [B, H, J, 1, Dh]
        return x.reshape(b, j, h, x.shape[-1]).transpose(0, 2, 1, 3)[
            :, :, :, None, :]

    def scale_native(s):  # [B*J, 1, H] -> [B, H, J, 1]
        return s.reshape(b, j, h).transpose(0, 2, 1)[..., None]

    k, v = to_native(k), to_native(v)
    quant = k_s is not None
    if quant:
        k_s, v_s = scale_native(k_s), scale_native(v_s)
    if write_gate is not None:
        at = (0, 0, 0, cache_index, 0)
        k = jnp.where(write_gate, k,
                      jax.lax.dynamic_slice(cache["k"], at, k.shape))
        v = jnp.where(write_gate, v,
                      jax.lax.dynamic_slice(cache["v"], at, v.shape))
        if quant:
            at_s = (0, 0, 0, cache_index)
            k_s = jnp.where(write_gate, k_s, jax.lax.dynamic_slice(
                cache["k_scale"], at_s, k_s.shape))
            v_s = jnp.where(write_gate, v_s, jax.lax.dynamic_slice(
                cache["v_scale"], at_s, v_s.shape))
    new_cache = {
        "k": jax.lax.dynamic_update_slice(
            cache["k"], k, (0, 0, 0, cache_index, 0)),
        "v": jax.lax.dynamic_update_slice(
            cache["v"], v, (0, 0, 0, cache_index, 0)),
    }
    if quant:
        new_cache["k_scale"] = jax.lax.dynamic_update_slice(
            cache["k_scale"], k_s, (0, 0, 0, cache_index))
        new_cache["v_scale"] = jax.lax.dynamic_update_slice(
            cache["v_scale"], v_s, (0, 0, 0, cache_index))
    return new_cache


def _ancestry_attention(q, k, v, ancestry, cache_index,
                        k_scale=None, v_scale=None, kv_valid=None):
    """Single-query self-attention over an APPEND-ONLY beam cache.

    Beam search normally reorders the KV cache every step so physical row n
    holds beam n's history. On TPU that reorder is the dominant decode cost:
    the one-hot matmul's output needs a relayout copy of every [B*K, L, 12,
    64] leaf (~50 us x 24 kernels/step at L=160 — the trailing (12, 64)
    dims tile-pad to (16, 128), so every repack moves 2.7x the logical
    bytes). Here the cache is NEVER reordered; instead a tiny one-hot
    ancestry tensor ``ancestry[b, n, j, t] = 1 iff beam n's token at
    position t lives in physical row j`` (shared by all layers, ~64 KB) is
    folded into the attention itself:

        s[n, t] = q_n . K[A(n, t), t]  =  sum_j ancestry[n, j, t] *
                                           (q_n . K[j, t])

    The all-pairs scores cost K x more FLOPs than row-aligned attention,
    which is noise at decode shapes, and the one-hot contraction is EXACT
    (adds zeros), so decode results are bit-identical to the reordering
    implementation.

    q: [B*K, 1, H, Dh]; k, v: [B*K, L, H, Dh] (rows layout) or
    [B, H, K, L, Dh] (``init_cache(layout="bhjtd")`` — the einsum-native
    layout: the contraction batch dims (b, h) lead, so at wide buckets
    neither the score dot nor the per-step cache write needs a relayout;
    probed 20%/cache faster per step and ~300x faster to compile at B=16,
    L=160 on v5e — tools/cache_layout_probe.py). ancestry: [B, K, K, L].
    ``k_scale``/``v_scale`` ([B*K, L, H] rows / [B, H, K, L] bhjtd):
    present when the cache is int8 (``init_cache(quant="int8")``) — the
    HBM reads stay int8 and the per-(position, head) scales fold into the
    score/probability algebra. ``kv_valid`` ([B, L] bool, optional):
    per-EXAMPLE key-position validity replacing the shared
    ``positions <= cache_index`` mask — the continuous-batching segment
    program's rows sit at different logical phases over a shared physical
    cache, so each row masks its own live stripes
    (serving/continuous.py). Returns [B*K, 1, H, Dh].
    """
    bk, _, h, dh = q.shape
    b, kk, _, l_ = ancestry.shape
    q4 = q.reshape(b, kk, h, dh)
    anc = ancestry.astype(jnp.float32)
    native = k.ndim == 5  # [B, H, J, T, Dh] einsum-native layout
    if native:
        k5, v5 = k, v
        s_all = jnp.einsum("bnhd,bhjtd->bnjht", q4, k5.astype(q4.dtype),
                           preferred_element_type=jnp.float32)
        if k_scale is not None:
            # scale [B, H, J, T] -> [B, 1(n), J, H, T]
            s_all = s_all * k_scale.transpose(0, 2, 1, 3)[:, None]
    else:
        k5 = k.reshape(b, kk, *k.shape[1:])  # [B, J, L, H, Dh]
        v5 = v.reshape(b, kk, *v.shape[1:])
        s_all = jnp.einsum("bnhd,bjthd->bnjht", q4, k5.astype(q4.dtype),
                           preferred_element_type=jnp.float32)
        if k_scale is not None:
            # scale [B, J, L, H] -> broadcast over the beam (n) axis as
            # [.., H, T]
            ks = k_scale.reshape(b, kk, l_, h).transpose(0, 1, 3, 2)
            s_all = s_all * ks[:, None]
    s = jnp.einsum("bnjht,bnjt->bnht", s_all, anc) * (dh ** -0.5)
    if kv_valid is None:
        kv_valid = jnp.broadcast_to(jnp.arange(l_) <= cache_index, (b, l_))
    s = jnp.where(kv_valid[:, None, None, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    w = p[:, :, None] * anc[:, :, :, None, :]  # [B, N, J, H, T]
    if v_scale is not None:
        vs = (v_scale.transpose(0, 2, 1, 3) if native
              else v_scale.reshape(b, kk, l_, h).transpose(0, 1, 3, 2))
        w = w * vs[:, None]
    w = w.astype(q.dtype)
    if native:
        out = jnp.einsum("bnjht,bhjtd->bnhd", w, v5.astype(q.dtype))
    else:
        out = jnp.einsum("bnjht,bjthd->bnhd", w, v5.astype(q.dtype))
    return out.reshape(bk, 1, h, dh)


def attention_block(
    params: L.Params,
    x: jnp.ndarray,
    kv_source: jnp.ndarray | None = None,
    kv_valid: jnp.ndarray | None = None,
    n_heads: int = 12,
    causal: bool = False,
    cache: dict | None = None,
    cache_index: jnp.ndarray | None = None,
    precision: L.Precision = L.FP32,
    backend: str = "xla",
    ancestry: jnp.ndarray | None = None,
    write_gate: jnp.ndarray | None = None,
    self_kv_valid: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, dict | None]:
    """Multi-head attention with optional KV cache.

    cache (decode only): {"k": [B, Tmax, H, Dh], "v": ...}. For self-attn the
    new K/V are written at ``cache_index``; for cross-attn the cache holds the
    precomputed encoder K/V and is used as-is. ``ancestry`` switches the
    cached self-attention to the append-only beam layout (see
    ``_ancestry_attention``).

    ``write_gate`` (optional traced scalar bool): when False the cache rows
    at ``cache_index`` are preserved instead of overwritten — the streaming
    chunk program runs a fixed-trip scan past token-buffer exhaustion, and
    an ungated write would rewrite the final slot with post-reorder rows
    while the ancestry tensor still points at pre-reorder rows (wrong
    beam's K/V committed). Costs one [B, 1, H, Dh] slice per layer per
    step; None (the default) compiles to the plain write.

    ``self_kv_valid`` ([B, L] bool, ancestry path only): per-example key
    validity overriding the shared ``<= cache_index`` mask (continuous
    batching — see ``_ancestry_attention``).
    """
    src = x if kv_source is None else kv_source
    fused_self = "qkv" in params and kv_source is None
    if fused_self:
        # Decode-path optimization: one [B, D] x [D, 3D] matmul instead of
        # three (the step is op-count-bound — tools/profile_decode.py).
        # "qkv" is derived by ``fuse_decode_params`` from q/k/v weights.
        qkv = L.linear(params["qkv"], x, precision)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _split_heads(q, n_heads)
    else:
        q = _split_heads(L.linear(params["q"], x, precision), n_heads)

    if cache is not None and kv_source is not None:
        # Cross-attention with precomputed encoder K/V. (No in-repo caller
        # takes this branch — decode_step routes cross attention through
        # ``_cross_step`` — but it stays valid for external callers with
        # an UNQUANTIZED cache; quantized caches fold their scales in
        # ``_cross_step``/``_ancestry_attention`` only.)
        if "k_scale" in cache:
            raise NotImplementedError(
                "attention_block does not dequantize cross caches; use "
                "decode_step/_cross_step for quantized caches")
        k, v = cache["k"], cache["v"]
        new_cache = cache
    else:
        if fused_self:
            k = _split_heads(k, n_heads)
            v = _split_heads(v, n_heads)
        else:
            k = _split_heads(L.linear(params["k"], src, precision), n_heads)
            v = _split_heads(L.linear(params["v"], src, precision), n_heads)
        if cache is not None:
            # Incremental decode: write new K/V into the static-size cache.
            quant = "k_scale" in cache
            if quant:
                k, k_s = _quantize_kv(k)
                v, v_s = _quantize_kv(v)
            else:
                k = k.astype(cache["k"].dtype)
                v = v.astype(cache["v"].dtype)
            if cache["k"].ndim == 5:
                # Einsum-native [B, H, J, T, Dh] layout (init_cache
                # layout="bhjtd"): only the ancestry beam path can read it.
                if ancestry is None:
                    raise ValueError(
                        "bhjtd cache layout requires ancestry beam "
                        "attention (row-aligned decode reads [rows, L, H, "
                        "Dh] caches)")
                new_cache = _native_cache_write(
                    cache, k, v,
                    k_s if quant else None, v_s if quant else None,
                    cache_index, write_gate)
                out = _ancestry_attention(
                    q, new_cache["k"], new_cache["v"], ancestry, cache_index,
                    k_scale=new_cache.get("k_scale"),
                    v_scale=new_cache.get("v_scale"),
                    kv_valid=self_kv_valid)
                return (L.linear(params["out"], _merge_heads(out), precision),
                        new_cache)
            if write_gate is not None:
                old_k = jax.lax.dynamic_slice(
                    cache["k"], (0, cache_index, 0, 0), k.shape)
                old_v = jax.lax.dynamic_slice(
                    cache["v"], (0, cache_index, 0, 0), v.shape)
                k = jnp.where(write_gate, k, old_k)
                v = jnp.where(write_gate, v, old_v)
                if quant:
                    k_s = jnp.where(write_gate, k_s, jax.lax.dynamic_slice(
                        cache["k_scale"], (0, cache_index, 0), k_s.shape))
                    v_s = jnp.where(write_gate, v_s, jax.lax.dynamic_slice(
                        cache["v_scale"], (0, cache_index, 0), v_s.shape))
            k = jax.lax.dynamic_update_slice(cache["k"], k, (0, cache_index, 0, 0))
            v = jax.lax.dynamic_update_slice(cache["v"], v, (0, cache_index, 0, 0))
            new_cache = {"k": k, "v": v}
            k_scale = v_scale = None
            if quant:
                k_scale = jax.lax.dynamic_update_slice(
                    cache["k_scale"], k_s, (0, cache_index, 0))
                v_scale = jax.lax.dynamic_update_slice(
                    cache["v_scale"], v_s, (0, cache_index, 0))
                new_cache["k_scale"] = k_scale
                new_cache["v_scale"] = v_scale
            if ancestry is not None:
                out = _ancestry_attention(q, k, v, ancestry, cache_index,
                                          k_scale=k_scale, v_scale=v_scale,
                                          kv_valid=self_kv_valid)
                return (L.linear(params["out"], _merge_heads(out), precision),
                        new_cache)
            if quant:  # row-aligned path: dequantize at the consumer
                k = k.astype(q.dtype) * k_scale[..., None].astype(q.dtype)
                v = v.astype(q.dtype) * v_scale[..., None].astype(q.dtype)
            # Only positions < cache_index + q_len are valid.
            t_max = k.shape[1]
            pos = jnp.arange(t_max)[None, :]
            kv_valid = pos < (cache_index + x.shape[1])
            kv_valid = jnp.broadcast_to(kv_valid, (x.shape[0], t_max))
            causal = False  # masking handled by kv_valid for single-step decode
        else:
            new_cache = None

    out = multi_head_attention(
        q, k.astype(q.dtype), v.astype(q.dtype), kv_valid=kv_valid, causal=causal, backend=backend
    )
    return L.linear(params["out"], _merge_heads(out), precision), new_cache


def _cross_attention_probs(
    params: L.Params,
    x: jnp.ndarray,
    enc: jnp.ndarray,
    encoder_valid: jnp.ndarray | None,
    n_heads: int,
    prec: L.Precision,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Cross-attention that materializes its probabilities.

    Returns (output [B, Tq, D], probs [B, H, Tq, Tk] fp32). Same math as
    ``attention_block``'s cross path (fp32 softmax island), used when the
    caller needs the weights themselves (DTW token-time alignment)."""
    dh = x.shape[-1] // n_heads
    q = _split_heads(L.linear(params["q"], x, prec), n_heads)
    k = _split_heads(L.linear(params["k"], enc, prec), n_heads)
    v = _split_heads(L.linear(params["v"], enc, prec), n_heads)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * (dh ** -0.5)
    if encoder_valid is not None:
        s = jnp.where(encoder_valid[:, None, None, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)  # fp32
    a = jnp.einsum("bhqk,bkhd->bqhd", p.astype(q.dtype), v)
    return L.linear(params["out"], _merge_heads(a), prec), p


def _vocab_logits(emb: L.Params, x: jnp.ndarray, matmul_dtype) -> jnp.ndarray:
    """Tied-embedding vocab projection ``x @ table.T`` -> fp32 logits.

    Handles the int8-quantized table (``L.quantize_embedding``): the int8
    values convert to ``matmul_dtype`` inside the dot's operand read (HBM
    traffic stays int8) and the per-row scales multiply the OUTPUT columns
    — exact in the scale algebra."""
    if "embedding_q" in emb:
        table_t = emb["embedding_q"].astype(matmul_dtype).T
        y = jnp.matmul(x, table_t, preferred_element_type=jnp.float32)
        return y * emb["scale"]
    return jnp.matmul(x, emb["embedding"].astype(matmul_dtype).T,
                      preferred_element_type=jnp.float32)


def _mlp_init(key, d_model: int, d_ff: int) -> L.Params:
    k1, k2 = jax.random.split(key)
    return {"fc1": L.linear_init(k1, d_model, d_ff), "fc2": L.linear_init(k2, d_ff, d_model)}


def _mlp(params: L.Params, x: jnp.ndarray, precision: L.Precision) -> jnp.ndarray:
    return L.linear(params["fc2"], L.gelu(L.linear(params["fc1"], x, precision)), precision)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


class WhisperEncoder:
    """Functional Whisper encoder: ``init(key)`` -> params, ``apply(params,
    mel)`` -> [B, T/2, D] features."""

    def __init__(self, config: WhisperConfig, precision: L.Precision = L.FP32,
                 backend: str = "xla"):
        self.config = config
        self.precision = precision
        self.backend = backend

    def init(self, key: jax.Array) -> L.Params:
        cfg = self.config
        keys = jax.random.split(key, 2 + cfg.encoder_layers)
        layers = []
        for i in range(cfg.encoder_layers):
            ka, km = jax.random.split(keys[2 + i])
            layers.append({
                "self_attn": _attn_init(ka, cfg.d_model),
                "self_attn_ln": L.layer_norm_init(cfg.d_model),
                "mlp": _mlp_init(km, cfg.d_model, cfg.d_ff),
                "mlp_ln": L.layer_norm_init(cfg.d_model),
            })
        return {
            "conv1": L.conv1d_init(keys[0], cfg.n_mels, cfg.d_model, 3),
            "conv2": L.conv1d_init(keys[1], cfg.d_model, cfg.d_model, 3),
            "pos_embed": jnp.asarray(
                L.sinusoid_position_encoding(cfg.max_source_positions, cfg.d_model)),
            "layers": layers,
            "ln_post": L.layer_norm_init(cfg.d_model),
        }

    @staticmethod
    def quantize_encoder_params(params: L.Params) -> L.Params:
        """Weight-only int8 (w8a16) for the FROZEN encoder forward in the
        train step (round-3 verdict, next #6): the backward re-reads but
        never differentiates these weights (AVNet stop_gradients the
        encoder output), so halving their HBM traffic is free of any
        gradient cost. Quantizes every per-layer attention (q/k/v/out) and
        MLP (fc1/fc2) kernel with per-output-channel scales
        (``L.quantize_linear`` — exact scale algebra, ~0.4% RMS weight
        rounding); conv1/conv2, pos_embed, and LN leaves stay fp32 (convs
        are a different lowering and a measured TPU-fault risk to
        reformulate, CLAUDE.md). ``apply`` dispatches on the quantized
        leaves automatically (``L.linear`` kernel_q path)."""
        params = dict(params)
        layers = []
        for lp in params["layers"]:
            lp = dict(lp)
            sa = dict(lp["self_attn"])
            for name in ("q", "k", "v", "out"):
                if name in sa:
                    sa[name] = L.quantize_linear(sa[name])
            lp["self_attn"] = sa
            mlp = dict(lp["mlp"])
            for name in ("fc1", "fc2"):
                mlp[name] = L.quantize_linear(mlp[name])
            lp["mlp"] = mlp
            layers.append(lp)
        params["layers"] = layers
        return params

    def apply(self, params: L.Params, mel: jnp.ndarray) -> jnp.ndarray:
        """mel: [B, n_mels, T] (T = 3000 canonically) -> [B, T//2, D]."""
        cfg, prec = self.config, self.precision
        x = jnp.swapaxes(mel, -1, -2)  # [B, T, n_mels]
        x = L.gelu(L.conv1d(params["conv1"], x, stride=1, padding=1, precision=prec))
        x = L.gelu(L.conv1d(params["conv2"], x, stride=2, padding=1, precision=prec))
        x = x + prec.cast(params["pos_embed"][: x.shape[1]])

        def layer_fn(x, lp):
            h, _ = attention_block(
                lp["self_attn"], L.layer_norm(lp["self_attn_ln"], x),
                n_heads=cfg.n_heads, precision=prec, backend=self.backend)
            x = x + h
            x = x + _mlp(lp["mlp"], L.layer_norm(lp["mlp_ln"], x), prec)
            return x

        # Python loop (not scan): layer count is small and static; lets XLA
        # specialize each layer and overlap weight prefetch.
        for lp in params["layers"]:
            x = layer_fn(x, lp)
        return L.layer_norm(params["ln_post"], x)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class WhisperDecoder:
    """Functional Whisper decoder with explicit KV cache for jit-friendly
    incremental decoding (greedy / beam)."""

    def __init__(self, config: WhisperConfig, precision: L.Precision = L.FP32,
                 backend: str = "xla"):
        self.config = config
        self.precision = precision
        self.backend = backend

    def init(self, key: jax.Array) -> L.Params:
        cfg = self.config
        keys = jax.random.split(key, 2 + cfg.decoder_layers)
        layers = []
        for i in range(cfg.decoder_layers):
            ka, kc, km = jax.random.split(keys[2 + i], 3)
            layers.append({
                "self_attn": _attn_init(ka, cfg.d_model),
                "self_attn_ln": L.layer_norm_init(cfg.d_model),
                "cross_attn": _attn_init(kc, cfg.d_model),
                "cross_attn_ln": L.layer_norm_init(cfg.d_model),
                "mlp": _mlp_init(km, cfg.d_model, cfg.d_ff),
                "mlp_ln": L.layer_norm_init(cfg.d_model),
            })
        return {
            "embed_tokens": L.embedding_init(keys[0], cfg.vocab_size, cfg.d_model),
            "pos_embed": jax.random.normal(
                keys[1], (cfg.max_target_positions, cfg.d_model)) * 0.01,
            "layers": layers,
            "ln_post": L.layer_norm_init(cfg.d_model),
        }

    # -- full-sequence (teacher forcing / training) --------------------------

    def apply(
        self,
        params: L.Params,
        tokens: jnp.ndarray,
        encoder_out: jnp.ndarray,
        encoder_valid: jnp.ndarray | None = None,
        return_cross_weights: bool = False,
    ) -> jnp.ndarray:
        """tokens: [B, T] -> logits [B, T, V] (causal, no cache).

        ``return_cross_weights``: also return the per-layer cross-attention
        probabilities stacked as [layers, B, heads, T_tok, T_enc] (fp32) —
        the alignment signal for DTW word timestamps
        (decode/timestamps.py). The main output is unchanged (the explicit
        cross path is numerics-identical to the fused one)."""
        cfg, prec = self.config, self.precision
        x = L.embed(params["embed_tokens"], tokens)
        x = x + params["pos_embed"][: tokens.shape[1]]
        x = prec.cast(x)
        enc = prec.cast(encoder_out)
        cross_ws = []
        for lp in params["layers"]:
            h, _ = attention_block(
                lp["self_attn"], L.layer_norm(lp["self_attn_ln"], x),
                n_heads=cfg.n_heads, causal=True, precision=prec, backend=self.backend)
            x = x + h
            if return_cross_weights:
                h, w = _cross_attention_probs(
                    lp["cross_attn"], L.layer_norm(lp["cross_attn_ln"], x),
                    enc, encoder_valid, cfg.n_heads, prec)
                cross_ws.append(w)
            else:
                h, _ = attention_block(
                    lp["cross_attn"], L.layer_norm(lp["cross_attn_ln"], x),
                    kv_source=enc, kv_valid=encoder_valid,
                    n_heads=cfg.n_heads, precision=prec, backend=self.backend)
            x = x + h
            x = x + _mlp(lp["mlp"], L.layer_norm(lp["mlp_ln"], x), prec)
        x = L.layer_norm(params["ln_post"], x)
        logits = _vocab_logits(params["embed_tokens"], x.astype(jnp.float32),
                               jnp.float32)
        if return_cross_weights:
            return logits, jnp.stack(cross_ws)
        return logits

    # -- incremental decode ---------------------------------------------------

    @staticmethod
    def fuse_decode_params(params: L.Params) -> L.Params:
        """Derive per-layer fused QKV self-attention weights for the decode
        step (one matmul instead of three; see attention_block). The q/k/v
        entries are kept — training/full-sequence paths ignore "qkv". K has
        no bias in Whisper (HF k_proj bias=False), hence the zero block."""
        params = dict(params)
        layers = []
        for lp in params["layers"]:
            lp = dict(lp)
            sa = dict(lp["self_attn"])
            d = sa["q"]["kernel"].shape[1]  # output dim (= input for square
            #                                 Whisper projections)
            kernel = jnp.concatenate(
                [sa["q"]["kernel"], sa["k"]["kernel"], sa["v"]["kernel"]], axis=1)
            bias = jnp.concatenate([
                sa["q"].get("bias", jnp.zeros((d,), kernel.dtype)),
                jnp.zeros((d,), kernel.dtype),
                sa["v"].get("bias", jnp.zeros((d,), kernel.dtype)),
            ])
            sa["qkv"] = {"kernel": kernel, "bias": bias}
            lp["self_attn"] = sa
            layers.append(lp)
        params["layers"] = layers
        return params

    @staticmethod
    def quantize_decode_params(params: L.Params) -> L.Params:
        """Weight-only int8 for the decode step (w8a16).

        The autoregressive step re-reads every decode-path weight from HBM
        each token, and at medium/large sizes that traffic IS the step time
        (large-v2: ~1.6 GB/step in bf16 at 3.4-4.6 ms — near the v5e HBM
        roof). This quantizes exactly the kernels the step touches — fused
        self QKV + out, cross q + out, both MLP kernels, and the tied
        embedding table (per-row scales serve both the lookup and the
        [D, V] logits matmul) — to int8 with per-output-channel scales
        folded into the matmul outputs (``L.quantize_linear`` /
        ``L.quantize_embedding``: exact scale algebra, ~0.4% RMS weight
        rounding error).

        Kernels the step does NOT read stay untouched: per-layer self q/k/v
        (superseded by "qkv" — call ``fuse_decode_params`` FIRST), cross
        k/v (read once per utterance by ``init_cache``), and pos_embed/LN
        leaves. ``apply`` (teacher forcing / DTW alignment) remains valid
        on the returned tree — it uses the unquantized self q/k/v and
        dequantizes the shared cross/MLP/embedding weights in-graph."""
        params = dict(params)
        layers = []
        for lp in params["layers"]:
            lp = dict(lp)
            sa = dict(lp["self_attn"])
            for name in ("qkv", "out"):
                if name in sa:
                    sa[name] = L.quantize_linear(sa[name])
            lp["self_attn"] = sa
            ca = dict(lp["cross_attn"])
            for name in ("q", "out"):
                ca[name] = L.quantize_linear(ca[name])
            lp["cross_attn"] = ca
            mlp = dict(lp["mlp"])
            for name in ("fc1", "fc2"):
                mlp[name] = L.quantize_linear(mlp[name])
            lp["mlp"] = mlp
            layers.append(lp)
        params["layers"] = layers
        params["embed_tokens"] = L.quantize_embedding(params["embed_tokens"])
        return params

    def prepare_decode_params(self, params: L.Params,
                              weight_quant: str | None = None) -> L.Params:
        """Full decode-param preparation: fuse QKV, optionally quantize the
        decode-hot weights to int8, then cast the remaining float leaves to
        the compute dtype.

        Order matters for accuracy: quantization reads the fp32 masters
        (not an already-rounded bf16 copy), and the f32 quantization scales
        are left uncast — they multiply matmul OUTPUTS, where bf16 rounding
        would re-introduce the error the per-channel scales exist to
        remove."""
        prec = self.precision
        fused = self.fuse_decode_params(params)
        if weight_quant is None:
            return jax.tree.map(
                lambda x: prec.cast(x)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, fused)
        if weight_quant != "int8":
            raise ValueError(f"unknown weight_quant {weight_quant!r}; "
                             "expected None or 'int8'")
        quant = self.quantize_decode_params(fused)

        def cast(path, x):
            if not jnp.issubdtype(x.dtype, jnp.floating):
                return x  # int8 kernels/tables
            if getattr(path[-1], "key", None) == "scale":
                return x  # f32 quantization scales (LN scales ride along —
                #           layer_norm computes in f32 regardless)
            return prec.cast(x)

        return jax.tree_util.tree_map_with_path(cast, quant)

    def init_cache(self, params: L.Params, encoder_out: jnp.ndarray,
                   max_len: int | None = None, dtype=None,
                   beam_groups: int = 1, quant: str | None = None,
                   layout: str = "rows") -> list[dict]:
        """Pre-allocate per-layer self-attn caches and precompute cross-attn
        K/V from the encoder output (computed once per utterance — the big
        win of KV-cached decoding).

        ``beam_groups``: for beam decoding pass the UN-repeated encoder
        output and the beam width here — the self caches get B*K rows while
        the cross K/V stays B-major (one copy per example instead of per
        beam: the rows would be identical, so this cuts the dominant
        cross-cache HBM read per step by K and the reorder traffic to zero).

        ``quant="int8"``: store BOTH caches as int8 with per-(position,
        head) scales (see ``_quantize_kv``) — halves the per-step cache HBM
        traffic for the bandwidth-bound wide serving buckets. The cross K/V
        is quantized once here; self rows are quantized at write time.

        ``quant="int8-cross"``: quantize ONLY the cross cache. Profiling
        the B=16 bucket (tools/profile_decode.py) showed full-int8's
        cache-read saving (−21% fusion time) is mostly eaten by the
        per-step self-cache writes (+82% dynamic_update_slice: int8 tiles
        pad (32, 128) and two extra scale buffers update every step); the
        cross cache is the larger traffic (Tenc=1500 vs <=448 positions),
        is written exactly once, and its scales fold into the attention
        algebra for free — this mode keeps that win and skips the cost.

        ``layout``: physical self-cache layout. ``"rows"`` (default):
        [B*K, T, H, Dh] — row-aligned, readable by every decode path.
        ``"bhjtd"``: einsum-native [B, H, K, T, Dh] (scales [B, H, K, T])
        — the ancestry-beam score/value einsums batch over (b, h), so with
        those dims leading neither the dot nor the per-step
        dynamic_update_slice needs a relayout; at the wide serving buckets
        where XLA otherwise lays the rows layout dot-minor and the DUS
        degrades to window-sized copies this is both faster per step and
        orders of magnitude faster to compile (tools/cache_layout_probe.py;
        BASELINE.md round-4 cache-layout rows). Only the ancestry beam
        path can read it — greedy/sampling/row-aligned decode require
        "rows".
        """
        cfg = self.config
        b = encoder_out.shape[0]
        max_len = max_len or cfg.max_target_positions
        prec = self.precision
        if dtype is None:
            # Caches in the compute dtype: on bf16 policies this halves the
            # per-step HBM traffic of cache reads and beam reorders.
            dtype = prec.compute_dtype
        if layout == "bhjtd":
            kv_shape = (b, cfg.n_heads, beam_groups, max_len, cfg.head_dim)
            scale_shape = (b, cfg.n_heads, beam_groups, max_len)
        elif layout == "rows":
            kv_shape = (b * beam_groups, max_len, cfg.n_heads, cfg.head_dim)
            scale_shape = (b * beam_groups, max_len, cfg.n_heads)
        else:
            raise ValueError(f"unknown cache layout {layout!r}; "
                             "expected 'rows' or 'bhjtd'")
        caches = []
        enc = prec.cast(encoder_out)
        for lp in params["layers"]:
            ck = _split_heads(L.linear(lp["cross_attn"]["k"], enc, prec), cfg.n_heads)
            cv = _split_heads(L.linear(lp["cross_attn"]["v"], enc, prec), cfg.n_heads)
            if quant in ("int8", "int8-cross"):
                ckq, cks = _quantize_kv(ck)
                cvq, cvs = _quantize_kv(cv)
                cross = {"k": ckq, "k_scale": cks, "v": cvq, "v_scale": cvs}
                if quant == "int8-cross":
                    self_cache = {
                        "k": jnp.zeros(kv_shape, dtype),
                        "v": jnp.zeros(kv_shape, dtype),
                    }
                else:
                    self_cache = {
                        "k": jnp.zeros(kv_shape, jnp.int8),
                        "k_scale": jnp.zeros(scale_shape, jnp.float32),
                        "v": jnp.zeros(kv_shape, jnp.int8),
                        "v_scale": jnp.zeros(scale_shape, jnp.float32),
                    }
            elif quant is not None:
                raise ValueError(f"unknown cache quant {quant!r}")
            else:
                cross = {"k": ck.astype(dtype), "v": cv.astype(dtype)}
                self_cache = {
                    "k": jnp.zeros(kv_shape, dtype),
                    "v": jnp.zeros(kv_shape, dtype),
                }
            caches.append({"self": self_cache, "cross": cross})
        return caches

    def _cross_step(self, lp: L.Params, x: jnp.ndarray, cross: dict,
                    encoder_valid: jnp.ndarray | None, prec: L.Precision) -> jnp.ndarray:
        """Single-query cross-attention against precomputed K/V. Supports a
        B-major cross cache with B*K query rows (beam decoding): queries are
        grouped per example so each example's K/V is read ONCE per step
        regardless of beam width."""
        cfg = self.config
        h_, dh = cfg.n_heads, cfg.head_dim
        rows = x.shape[0]
        b_enc = cross["k"].shape[0]
        groups = rows // b_enc

        q_in = L.layer_norm(lp["cross_attn_ln"], x)
        q = L.linear(lp["cross_attn"]["q"], q_in, prec)[:, 0]  # [rows, D]
        q = q.reshape(b_enc, groups, h_, dh)
        k = cross["k"].astype(q.dtype)  # [B, T, H, Dh]
        v = cross["v"].astype(q.dtype)
        s = jnp.einsum("bghd,bthd->bght", q, k,
                       preferred_element_type=jnp.float32) * (dh ** -0.5)
        if "k_scale" in cross:  # int8 cross cache: fold scales post-dot
            s = s * cross["k_scale"].transpose(0, 2, 1)[:, None]  # [B,1,H,T]
        if encoder_valid is not None:
            ev = encoder_valid
            if ev.shape[0] != b_enc:
                # Tolerate masks pre-REPEATED over beam rows
                # (jnp.repeat(mask, k, axis=0): b0,b0,...,b1,b1,...) by
                # taking each block's first row. A TILED mask
                # (b0,b1,...,b0,b1,...) has the same shape but would be
                # silently mis-selected — callers must use repeat layout
                # (all in-repo callers pass the unrepeated [B, T] mask).
                ev = ev[::groups]
            s = jnp.where(ev[:, None, None, :], s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        if "v_scale" in cross:  # fold v scales into the probabilities
            p = p * cross["v_scale"].transpose(0, 2, 1)[:, None]
        p = p.astype(q.dtype)
        a = jnp.einsum("bght,bthd->bghd", p, v)
        a = a.reshape(rows, 1, h_ * dh)
        return L.linear(lp["cross_attn"]["out"], a, prec)

    def decode_step(
        self,
        params: L.Params,
        tokens: jnp.ndarray,
        cache: list[dict],
        index: jnp.ndarray,
        encoder_valid: jnp.ndarray | None = None,
        ancestry: jnp.ndarray | None = None,
        write_gate: jnp.ndarray | None = None,
        positions: jnp.ndarray | None = None,
        self_kv_valid: jnp.ndarray | None = None,
    ) -> tuple[jnp.ndarray, list[dict]]:
        """One decode step. tokens: [B, 1] current token ids; index: scalar
        int32 position. ``ancestry`` [B, K, K, L]: append-only beam-cache
        attention (see ``_ancestry_attention``); ``write_gate``: optional
        scalar bool — False preserves the cache rows at ``index`` (see
        ``attention_block``). ``positions`` ([B] i32, optional): per-row
        LOGICAL positions for the learned PE when they differ from the
        physical cache write ``index`` — the continuous-batching segment
        program phases rows over a shared physical cache
        (serving/continuous.py); ``self_kv_valid`` rides along to the
        ancestry attention. Returns (logits [B, V], updated cache)."""
        cfg, prec = self.config, self.precision
        x = L.embed(params["embed_tokens"], tokens)
        if positions is None:
            x = x + jax.lax.dynamic_slice_in_dim(params["pos_embed"], index, 1,
                                                 axis=0)
        else:
            x = x + jnp.take(params["pos_embed"], positions, axis=0)[:, None]
        x = prec.cast(x)
        new_caches = []
        for lp, layer_cache in zip(params["layers"], cache):
            h, new_self = attention_block(
                lp["self_attn"], L.layer_norm(lp["self_attn_ln"], x),
                n_heads=cfg.n_heads, cache=layer_cache["self"], cache_index=index,
                precision=prec, backend="xla",  # single-query step: XLA path
                ancestry=ancestry, write_gate=write_gate,
                self_kv_valid=self_kv_valid)
            x = x + h
            h = self._cross_step(lp, x, layer_cache["cross"], encoder_valid, prec)
            x = x + h
            x = x + _mlp(lp["mlp"], L.layer_norm(lp["mlp_ln"], x), prec)
            new_caches.append({"self": new_self, "cross": layer_cache["cross"]})
        x = L.layer_norm(params["ln_post"], x)
        # Vocab projection in the compute dtype (fp32 accumulation): at
        # decode time this [B, D] x [D, V] matmul reads the whole embedding
        # table every step — bf16 halves that traffic (int8 halves it
        # again when the table is quantized, see quantize_decode_params).
        logits = _vocab_logits(params["embed_tokens"], prec.cast(x),
                               prec.compute_dtype)
        return logits[:, 0].astype(jnp.float32), new_caches
