"""Fused gated cross-attention kernel vs the unfused XLA composition."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from mocov2_whisper_flamingo_tpu.models.fusion import GatedCrossModalFusion
from mocov2_whisper_flamingo_tpu.ops.gated_attention import gated_cross_attention

ON_TPU = bool(os.environ.get("AVSR_TEST_TPU"))
TOL = dict(atol=5e-3, rtol=5e-2) if ON_TPU else dict(atol=3e-5, rtol=1e-4)
GRAD_TOL = dict(atol=2e-2, rtol=5e-2) if ON_TPU else dict(atol=1e-4, rtol=1e-3)
D, H = 64, 4


def _run(fn, *args, **kwargs):
    if ON_TPU:
        return fn(*args, **kwargs)
    with pltpu.force_tpu_interpret_mode():
        return fn(*args, **kwargs)


def _setup(rng, b=2, tq=12, tk=20):
    fusion = GatedCrossModalFusion(D, H, n_layers=1, dropout=0.0, backend="xla")
    params = fusion.init(jax.random.PRNGKey(0))
    lp = params["layers"][0]
    lp["attn_gate"] = jnp.asarray(0.6)  # nonzero so the attention path matters
    x = jnp.asarray(rng.standard_normal((b, tq, D)).astype(np.float32))
    xa = jnp.asarray(rng.standard_normal((b, tk, D)).astype(np.float32))
    valid = np.ones((b, tk), bool)
    valid[-1, (3 * tk) // 4:] = False
    return fusion, params, lp, x, xa, jnp.asarray(valid)


def _unfused(lp, x, k_full, v_full, valid):
    """The existing verified XLA path for the attention half of the block."""
    from mocov2_whisper_flamingo_tpu.models import layers as L
    from mocov2_whisper_flamingo_tpu.ops.attention import multi_head_attention

    b, tq, _ = x.shape
    tk = k_full.shape[1]
    q_in = L.layer_norm(lp["attn_ln"], x)
    q = L.linear(lp["attn"]["q"], q_in).reshape(b, tq, H, D // H)
    k = k_full.reshape(b, tk, H, D // H)
    v = v_full.reshape(b, tk, H, D // H)
    attn = multi_head_attention(q, k, v, kv_valid=valid)
    attn = L.linear(lp["attn"]["out"], attn.reshape(b, tq, D))
    return x + attn * jnp.tanh(lp["attn_gate"])


def test_fused_matches_unfused(rng):
    from mocov2_whisper_flamingo_tpu.models import layers as L

    _, _, lp, x, xa, valid = _setup(rng)
    k_full = L.linear(lp["attn"]["k"], xa)
    v_full = L.linear(lp["attn"]["v"], xa)

    ref = _unfused(lp, x, k_full, v_full, valid)
    ours = _run(gated_cross_attention, x, k_full, v_full, lp["attn"],
                lp["attn_ln"], lp["attn_gate"], kv_valid=valid, n_heads=H)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), **TOL)


def test_fused_gradients_match(rng):
    from mocov2_whisper_flamingo_tpu.models import layers as L

    _, _, lp, x, xa, valid = _setup(rng, b=1, tq=8, tk=8)
    k_full = L.linear(lp["attn"]["k"], xa)
    v_full = L.linear(lp["attn"]["v"], xa)

    def loss_fused(x, k, v, gate):
        return jnp.sum(_run(gated_cross_attention, x, k, v, lp["attn"],
                            lp["attn_ln"], gate, kv_valid=valid, n_heads=H) ** 2)

    def loss_ref(x, k, v, gate):
        lp2 = dict(lp, attn_gate=gate)
        return jnp.sum(_unfused(lp2, x, k, v, valid) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, k_full, v_full, lp["attn_gate"])
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, k_full, v_full, lp["attn_gate"])
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), **GRAD_TOL)


def test_fusion_module_pallas_backend_matches_xla(rng):
    """GatedCrossModalFusion with backend='pallas' (fused kernel) equals the
    xla backend."""
    fusion_x, params, lp, x, xa, valid = _setup(rng)
    # give every layer nonzero gates
    for layer in params["layers"]:
        layer["attn_gate"] = jnp.asarray(0.6)
        layer["ff_gate"] = jnp.asarray(-0.4)
    ref = fusion_x.apply(params, x, xa, video_valid=valid)

    fusion_p = GatedCrossModalFusion(D, H, n_layers=1, dropout=0.0,
                                     backend="pallas", fused_kernel=True)
    ours = _run(fusion_p.apply, params, x, xa, video_valid=valid)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), **TOL)

    # the retired default (fused_kernel=False) routes the MHA through the
    # flash-attention kernel instead — same numbers
    fusion_f = GatedCrossModalFusion(D, H, n_layers=1, dropout=0.0,
                                     backend="pallas")
    assert fusion_f.fused_kernel is False
    ours_f = _run(fusion_f.apply, params, x, xa, video_valid=valid)
    np.testing.assert_allclose(np.asarray(ours_f), np.asarray(ref), **TOL)
