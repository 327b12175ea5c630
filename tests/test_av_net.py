"""AVNet integration tests, mirroring the reference's verification
capabilities (reference: verify_model.py — modality stability, NaN/Inf scans,
shape robustness on synthetic inputs) against the preserved forward contract."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mocov2_whisper_flamingo_tpu.models.av_net import AVNet
from mocov2_whisper_flamingo_tpu.models.whisper import WhisperConfig

VOCAB = 64
MODELARGS = (32, 4, 2, 3000, 128, 0.0)  # (d_model, heads, layers, pe_max, fc, dropout)

TINY_WHISPER = WhisperConfig(
    n_mels=80, d_model=48, encoder_layers=2, decoder_layers=2, n_heads=4,
    d_ff=96, vocab_size=VOCAB, max_source_positions=1500, max_target_positions=32,
)


@pytest.fixture(scope="module")
def net_and_params():
    net = AVNet("audiovisual", None, 96, MODELARGS, VOCAB)
    # Shrink the whisper encoder for CPU test speed.
    net.whisper_config = TINY_WHISPER
    from mocov2_whisper_flamingo_tpu.models.whisper import WhisperEncoder

    net.whisper_encoder = WhisperEncoder(TINY_WHISPER, net.precision, net.backend)
    params = net.init(jax.random.PRNGKey(0))
    return net, params


def _batch(rng, b=2, t_video=8):
    audio = rng.standard_normal((b, 3000, 80)).astype(np.float32)
    audio_mask = np.ones((b, 3000), dtype=bool)
    video = rng.standard_normal((b, t_video, 3, 64, 64)).astype(np.float32)
    video_mask = np.ones((b, t_video), dtype=bool)
    video_len = np.array([t_video, t_video // 2], dtype=np.int32)[:b]
    return tuple(jnp.asarray(x) for x in (audio, audio_mask, video, video_mask, video_len))


def test_forward_shape_and_finite(rng, net_and_params):
    net, params = net_and_params
    batch = _batch(rng)
    logits = net.forward(params, batch)
    # min_len = min(audio 1500, video 8) = 8 (reference: av_net.py:92-96).
    assert logits.shape == (2, 8, VOCAB)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_forward_jit(rng, net_and_params):
    net, params = net_and_params
    batch = _batch(rng)
    jitted = jax.jit(lambda p, b: net.forward(p, b))
    logits = jitted(params, batch)
    ref = net.forward(params, batch)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref), atol=1e-5)


def test_trainable_filter_freezes_backbones(net_and_params):
    net, params = net_and_params
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    trainable = [p for p, _ in flat if net.trainable_filter(p)]
    frozen = [p for p, _ in flat if not net.trainable_filter(p)]
    names_t = {str(p[0]) for p in trainable}
    names_f = {str(p[0]) for p in frozen}
    assert any("whisper_encoder" in n for n in names_f)
    assert any("visual_frontend" in n for n in names_f)
    assert not any("whisper_encoder" in n or "visual_frontend" in n for n in names_t)
    assert any("fusion" in n for n in names_t)
    assert any("decoder" in n for n in names_t)


def test_grads_flow_only_to_trainable(rng, net_and_params):
    """Frozen submodules are stop_gradient'ed: their grads are exactly zero;
    fusion/decoder grads are nonzero (reference freezes Whisper + MoCo,
    av_net.py:25-26,45-46)."""
    net, params = net_and_params
    batch = _batch(rng, b=1)

    def loss_fn(p):
        return jnp.sum(net.forward(p, batch) ** 2) * 1e-6

    grads = jax.grad(loss_fn)(params)
    enc_norm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads["whisper_encoder"]))
    vf_norm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads["visual_frontend"]))
    dec_norm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads["decoder"]))
    assert enc_norm == 0.0
    assert vf_norm == 0.0
    assert dec_norm > 0.0


def test_gate_logging_path(rng, net_and_params):
    net, params = net_and_params
    logits, gates = net.forward(params, _batch(rng, b=1), return_gates=True)
    assert len(gates) == 2 * max(MODELARGS[2] // 2, 1)
    assert np.all(np.isfinite(np.asarray(logits)))
