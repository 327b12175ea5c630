"""Language detection (decode/language.py) — openai detect_language
semantics: SOT-step logits restricted to the language tokens."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mocov2_whisper_flamingo_tpu.decode import detect_language
from mocov2_whisper_flamingo_tpu.models.whisper import (
    WhisperConfig, WhisperDecoder, WhisperEncoder)

CFG = WhisperConfig(n_mels=80, d_model=32, encoder_layers=1,
                    decoder_layers=2, n_heads=4, d_ff=64, vocab_size=50,
                    max_source_positions=20, max_target_positions=16)
SOT = 1
LANGS = [10, 11, 12, 13]


@pytest.fixture(scope="module")
def setup():
    dec = WhisperDecoder(CFG)
    params = dec.init(jax.random.PRNGKey(0))
    enc_out = jax.random.normal(jax.random.PRNGKey(1), (3, 20, CFG.d_model))
    return dec, params, enc_out


def test_matches_masked_softmax_oracle(setup):
    dec, params, enc_out = setup
    best, probs = detect_language(dec, params, enc_out, SOT, LANGS)
    assert best.shape == (3,) and probs.shape == (3, len(LANGS))
    # oracle: full teacher-forced forward over [SOT], restricted softmax
    logits = dec.apply(params, jnp.full((3, 1), SOT, jnp.int32), enc_out)
    lang_logits = np.asarray(logits[:, 0, LANGS], np.float64)
    ref = np.exp(lang_logits - lang_logits.max(-1, keepdims=True))
    ref /= ref.sum(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(probs), ref, rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(best), np.asarray(LANGS)[lang_logits.argmax(-1)])


def test_probs_normalized_over_language_set(setup):
    dec, params, enc_out = setup
    _, probs = detect_language(dec, params, enc_out, SOT, LANGS)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-5)


def test_rejects_empty_language_set(setup):
    dec, params, enc_out = setup
    with pytest.raises(ValueError):
        detect_language(dec, params, enc_out, SOT, [])


def test_asr_method_end_to_end():
    from mocov2_whisper_flamingo_tpu.models.asr import WhisperASR

    model = WhisperASR(config=CFG, backend="xla")
    params = model.init(jax.random.PRNGKey(0))
    wav = np.random.default_rng(0).standard_normal(6400).astype(np.float32)
    best, probs = model.detect_language(
        params, jnp.asarray(wav), SOT, LANGS,
        pad_to=CFG.max_source_positions * 2 * 160)
    assert int(best[0]) in LANGS
    assert np.isfinite(np.asarray(probs)).all()


def test_transcribe_auto_language_detection():
    """transcribe(detect_language_ids=...): openai language=None behavior
    — detect on the first window, substitute the prefix language slot,
    report language + probs on the result."""
    from mocov2_whisper_flamingo_tpu.models.asr import WhisperASR

    model = WhisperASR(config=CFG, backend="xla")
    params = model.init(jax.random.PRNGKey(0))
    chunk_s = CFG.max_source_positions * 2 * 160 / 16000
    wav = np.random.default_rng(1).standard_normal(
        int(1.3 * chunk_s * 16000)).astype(np.float32)
    out = model.transcribe(
        params, wav, [SOT, 99, 5], beam_size=2, best_of=2, max_len=10,
        eos_id=2, chunk_seconds=chunk_s, temperatures=(0.0,),
        logprob_threshold=None, compression_ratio_threshold=None,
        detect_language_ids=LANGS, language_slot=1)
    assert out["language"] in LANGS
    assert set(out["language_probs"]) == set(LANGS)
    assert sum(out["language_probs"].values()) == pytest.approx(1.0, rel=1e-4)
    # the detected token conditioned the decode: it must match the probe
    best, _ = model.detect_language(
        params, wav[: int(chunk_s * 16000)], SOT, LANGS,
        pad_to=int(chunk_s * 16000))
    assert out["language"] == int(best[0])
