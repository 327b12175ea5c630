"""AVWhisperNet: AV fusion -> Whisper decoder beam decoding (BASELINE
config 3 capability)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mocov2_whisper_flamingo_tpu.models.av_whisper import AVWhisperNet
from mocov2_whisper_flamingo_tpu.models.whisper import WhisperConfig, WhisperEncoder

VOCAB = 64
EOS = 3
PREFIX = [1, 2]
MODELARGS = (32, 4, 2, 3000, 128, 0.0)
TINY = WhisperConfig(n_mels=80, d_model=32, encoder_layers=1, decoder_layers=1,
                     n_heads=4, d_ff=64, vocab_size=VOCAB,
                     max_source_positions=64, max_target_positions=32)


@pytest.fixture(scope="module")
def model():
    net = AVWhisperNet(modelargs=MODELARGS, vocab_size=VOCAB,
                       whisper_name="whisper-tiny", backend="xla")
    # shrink both encoder and decoder for CPU
    net.whisper_config = TINY
    net.trunk.whisper_config = TINY
    net.trunk.whisper_encoder = WhisperEncoder(TINY, net.trunk.precision, "xla")
    from mocov2_whisper_flamingo_tpu.models.whisper import WhisperDecoder

    net.decoder = WhisperDecoder(TINY, net.precision, "xla")
    params = net.init(jax.random.PRNGKey(0))
    return net, params


def _batch(rng, b=2, t_video=6):
    return (
        jnp.asarray(rng.standard_normal((b, 80, 128)), jnp.float32),  # direct mel
        jnp.ones((b, 128), bool),
        jnp.asarray(rng.standard_normal((b, t_video, 3, 32, 32)), jnp.float32),
        jnp.ones((b, t_video), bool),
        jnp.asarray([t_video, t_video - 2], jnp.int32)[:b],
    )


def test_encode_shapes(model, rng):
    net, params = model
    features, valid = net.encode(params, _batch(rng))
    # min(audio 64, video 6) = 6; bridge projects to decoder width
    assert features.shape == (2, 6, TINY.d_model)
    assert valid.shape == (2, 6)
    assert bool(valid[1, -1]) is False  # padded video positions masked


def test_decoder_logits_teacher_forced(model, rng):
    net, params = model
    targets = jnp.asarray(rng.integers(4, VOCAB, (2, 7)), jnp.int32)
    logits = net.decoder_logits(params, _batch(rng), targets)
    assert logits.shape == (2, 7, VOCAB)
    assert np.isfinite(np.asarray(logits)).all()


def test_ctc_logits_parity_path(model, rng):
    net, params = model
    logits = net.ctc_logits(params, _batch(rng))
    assert logits.shape == (2, 6, VOCAB)


def test_greedy_and_beam(model, rng):
    net, params = model
    batch = _batch(rng)
    greedy = np.asarray(net.greedy(params, batch, PREFIX, max_len=10, eos_id=EOS))
    assert greedy.shape == (2, 10)
    assert (greedy[:, :2] == np.array(PREFIX)).all()

    res = net.beam(params, batch, PREFIX, beam_size=3, max_len=10, eos_id=EOS,
                   length_penalty=0.0)
    assert np.asarray(res.sequences).shape == (2, 3, 10)
    # beam-1 top hypothesis == greedy
    res1 = net.beam(params, batch, PREFIX, beam_size=1, max_len=10, eos_id=EOS)
    np.testing.assert_array_equal(np.asarray(res1.sequences)[:, 0], greedy)


def test_joint_loss_grads(model, rng):
    """CTC (trunk head) + CE (decoder) joint loss produces finite grads for
    trainable params (fusion, bridge, decoder) and zeros for frozen ones."""
    from mocov2_whisper_flamingo_tpu.ops.losses import (
        ctc_loss, label_smoothed_cross_entropy)

    net, params = model
    batch = _batch(rng, b=1)
    targets = jnp.asarray(rng.integers(4, VOCAB, (1, 6)), jnp.int32)

    def loss_fn(p):
        ctc_lg = net.ctc_logits(p, batch)
        ctc = ctc_loss(ctc_lg, targets, jnp.asarray([6]), jnp.asarray([5]))
        dec_lg = net.decoder_logits(p, batch, targets)
        ce = label_smoothed_cross_entropy(dec_lg[:, :-1], targets[:, 1:])
        return ctc + ce

    grads = jax.grad(loss_fn)(params)
    frozen = sum(float(jnp.sum(jnp.abs(g)))
                 for g in jax.tree.leaves(grads["trunk"]["whisper_encoder"]))
    bridge = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads["bridge"]))
    dec = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads["decoder"]))
    assert frozen == 0.0
    assert bridge > 0 and dec > 0
