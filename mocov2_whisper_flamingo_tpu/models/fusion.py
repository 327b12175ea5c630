"""Flamingo-style tanh-gated cross-modal fusion.

Capability parity with the reference fusion (reference:
gate_cross_attention.py:12-73): per block,

    x = x + CrossAttn(LN(x), xa, xa, key_padding_mask) * tanh(attn_gate)
    x = x + FF(LN(x)) * tanh(ff_gate)

with scalar gates initialized to 0 (so fusion starts as identity), separate
audio/video input projections, and a post-LN. LayerNorms are fp32 islands
(reference: gate_cross_attention.py:8-10).

The attention itself runs through :mod:`ops.attention` — on TPU that is the
fused Pallas flash kernel; the gate multiply and residual adds are elementwise
epilogues XLA fuses into the surrounding matmuls.

Mask convention: this module takes **True = valid** key masks; the AVNet
boundary converts from the reference's torch key_padding_mask (True = pad,
reference: av_net.py:103,111-114).

Attention-prob dropout (nn.MultiheadAttention(dropout=0.1), reference:
gate_cross_attention.py:16) is implemented exactly on the XLA path; the
Pallas flash kernel streams probabilities block-by-block and never
materializes them, so train-mode layers with dropout > 0 automatically fall
back to the XLA attention (eval/decode numerics are unaffected either way).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mocov2_whisper_flamingo_tpu.models import layers as L
from mocov2_whisper_flamingo_tpu.ops.attention import multi_head_attention


def _gated_block_init(key, d_model: int) -> dict:
    kq, kk, kv, ko, k1, k2 = jax.random.split(key, 6)
    n_mlp = d_model * 4
    return {
        "attn": {
            "q": L.linear_init(kq, d_model, d_model),
            "k": L.linear_init(kk, d_model, d_model),
            "v": L.linear_init(kv, d_model, d_model),
            "out": L.linear_init(ko, d_model, d_model),
        },
        "attn_ln": L.layer_norm_init(d_model),
        "ff_ln": L.layer_norm_init(d_model),
        "ff1": L.linear_init(k1, d_model, n_mlp),
        "ff2": L.linear_init(k2, n_mlp, d_model),
        # Scalar gates init 0 -> tanh(0) = 0: fusion starts as a no-op and
        # learns how much cross-modal signal to admit.
        "attn_gate": jnp.zeros(()),
        "ff_gate": jnp.zeros(()),
    }


class GatedCrossModalFusion:
    """``apply(params, audio, video, video_valid)`` -> fused [B, T, D].

    Queries come from the audio stream, keys/values from the video stream;
    ``video_valid`` is [B, Tv] True-at-valid-position. The reference's unused
    ``audio_mask`` argument (reference: gate_cross_attention.py:60-69) is
    intentionally dropped.
    """

    def __init__(self, d_model: int, n_heads: int, n_layers: int, dropout: float = 0.1,
                 precision: L.Precision = L.FP32, backend: str = "xla",
                 remat: bool = False):
        self.d_model = d_model
        self.n_heads = n_heads
        self.n_layers = n_layers
        self.dropout_rate = dropout
        self.precision = precision
        self.backend = backend
        # History: rounds 1-3 carried a monolithic fused gated-attention
        # Pallas kernel here. It was retired in round 4 (bit-exact parity
        # with this path at 81.8 vs 81.8 ms full-AV encode, max abs diff
        # 0.0; XLA fuses the block optimally at AVSR shapes and the kernel
        # had no shard_map wrapper for TP) and deleted in round 5 — the
        # measurement record lives in docs/DESIGN.md + BASELINE.md. The MHA
        # below still runs the flash-attention Pallas kernel (~25% win),
        # which DOES shard via shard_map.
        # Rematerialize each gated block on the backward pass (trade FLOPs
        # for activation memory — jax.checkpoint; the AMP analog knob is
        # config precision.rematerialize).
        self.remat = remat

    def init(self, key: jax.Array) -> dict:
        keys = jax.random.split(key, self.n_layers + 2)
        return {
            "audio_proj": L.linear_init(keys[0], self.d_model, self.d_model),
            "video_proj": L.linear_init(keys[1], self.d_model, self.d_model),
            "layers": [_gated_block_init(keys[2 + i], self.d_model)
                       for i in range(self.n_layers)],
            "ln_post": L.layer_norm_init(self.d_model),
        }

    def apply(
        self,
        params: dict,
        audio: jnp.ndarray,
        video: jnp.ndarray,
        video_valid: jnp.ndarray | None = None,
        train: bool = False,
        rng: jax.Array | None = None,
        return_gates: bool = False,
    ):
        prec = self.precision
        x = L.linear(params["audio_proj"], prec.cast(audio), prec)
        xa = L.linear(params["video_proj"], prec.cast(video), prec)

        h = self.n_heads
        dh = self.d_model // h
        gates = {}

        def layer_step(lp, x, xa, video_valid, sub_rng):
            attn_rng = ff_rng = None
            if sub_rng is not None:
                attn_rng, ff_rng = jax.random.split(sub_rng)
            attn_dropout = train and attn_rng is not None and self.dropout_rate > 0
            q_in = L.layer_norm(lp["attn_ln"], x)
            b, tq, _ = q_in.shape
            tk = xa.shape[1]
            q = L.linear(lp["attn"]["q"], q_in, prec).reshape(b, tq, h, dh)
            k = L.linear(lp["attn"]["k"], xa, prec).reshape(b, tk, h, dh)
            v = L.linear(lp["attn"]["v"], xa, prec).reshape(b, tk, h, dh)
            # Attention-prob dropout needs materialized probs: XLA path.
            attn = multi_head_attention(
                q, k, v, kv_valid=video_valid,
                backend="xla" if attn_dropout else self.backend,
                dropout_rate=self.dropout_rate if attn_dropout else 0.0,
                dropout_rng=attn_rng if attn_dropout else None)
            attn = L.linear(lp["attn"]["out"], attn.reshape(b, tq, self.d_model), prec)
            attn_gate = jnp.tanh(lp["attn_gate"]).astype(attn.dtype)
            x = x + attn * attn_gate

            ff_in = L.layer_norm(lp["ff_ln"], x)
            ff = L.linear(lp["ff2"], L.gelu(L.linear(lp["ff1"], ff_in, prec)), prec)
            if train and ff_rng is not None:
                ff = L.dropout(ff, self.dropout_rate, ff_rng, deterministic=False)
            ff_gate = jnp.tanh(lp["ff_gate"]).astype(ff.dtype)
            return x + ff * ff_gate

        if self.remat:
            layer_step = jax.checkpoint(layer_step)

        for i, lp in enumerate(params["layers"]):
            sub = None
            if train and rng is not None:
                rng, sub = jax.random.split(rng)
            x = layer_step(lp, x, xa, video_valid, sub)
            if return_gates:
                gates[f"attn_gate_{i}"] = jnp.tanh(lp["attn_gate"])
                gates[f"ff_gate_{i}"] = jnp.tanh(lp["ff_gate"])

        out = L.layer_norm(params["ln_post"], x)
        if return_gates:
            return out, gates
        return out
