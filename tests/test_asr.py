"""Audio-only ASR pipeline (BASELINE configs 1-2): wav -> mel -> encoder ->
decode -> tokens, end to end."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mocov2_whisper_flamingo_tpu.models.asr import WhisperASR
from mocov2_whisper_flamingo_tpu.models.whisper import WhisperConfig

TINY = WhisperConfig(n_mels=80, d_model=32, encoder_layers=1, decoder_layers=1,
                     n_heads=4, d_ff=64, vocab_size=50,
                     max_source_positions=50, max_target_positions=16)
EOS = 3
PREFIX = [1, 2]


@pytest.fixture(scope="module")
def asr():
    model = WhisperASR(config=TINY, backend="xla")
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_transcribe_greedy(asr, rng):
    model, params = asr
    wav = rng.standard_normal(16000).astype(np.float32)  # 1s; pad to 100 frames
    tokens = model.transcribe_tokens(
        params, jnp.asarray(wav), PREFIX, beam_size=1, max_len=10, eos_id=EOS,
        pad_to=TINY.max_source_positions * 2 * 160)
    assert tokens.shape == (1, 10)
    assert list(np.asarray(tokens)[0, :2]) == PREFIX


def test_transcribe_beam_batched(asr, rng):
    model, params = asr
    wav = rng.standard_normal((2, 16000)).astype(np.float32)
    tokens = model.transcribe_tokens(
        params, jnp.asarray(wav), PREFIX, beam_size=3, max_len=10, eos_id=EOS,
        pad_to=TINY.max_source_positions * 2 * 160)
    assert tokens.shape == (2, 10)


def test_noisy_audio_still_decodes(asr, rng):
    """0 dB babble mixing on the mel (config 2 shape)."""
    from mocov2_whisper_flamingo_tpu.ops.augment import add_babble_noise

    model, params = asr
    wav = rng.standard_normal(16000).astype(np.float32)
    mel = model.features(jnp.asarray(wav), pad_to=TINY.max_source_positions * 2 * 160)
    bed = jnp.asarray(rng.standard_normal(60000).astype(np.float32))
    noisy = jnp.swapaxes(
        add_babble_noise(jnp.swapaxes(mel, -1, -2), bed, jax.random.PRNGKey(0),
                         snr_levels=(0.0,)), -1, -2)
    enc = model.encode(params, noisy)
    assert np.isfinite(np.asarray(enc)).all()


CHUNK_SECONDS = TINY.max_source_positions * 2 * 160 / 16000


def test_transcribe_api_quality_mode(asr, rng):
    """WhisperASR.transcribe: long audio through the openai-style window
    loop; text via a toy tokenizer; word timestamps via DTW."""
    model, params = asr
    wav = rng.standard_normal(
        int(2.3 * CHUNK_SECONDS * 16000)).astype(np.float32)

    class ToyTok:
        def decode(self, ids):
            return " ".join(f"t{int(i)}" for i in ids)

    def group_fn(text):
        return [(f"t{int(t)}", 1) for t in text]

    out = model.transcribe(
        params, wav, PREFIX, tokenizer=ToyTok(), beam_size=2, best_of=2,
        max_len=12, eos_id=EOS, chunk_seconds=CHUNK_SECONDS,
        temperatures=(0.0,), logprob_threshold=None,
        compression_ratio_threshold=None, context_tokens=2, sot_prev_id=9,
        word_times=True, group_fn=group_fn)
    assert len(out["tokens"]) > 0 and all(t != EOS for t in out["tokens"])
    assert out["text"] == " ".join(f"t{t}" for t in out["tokens"])
    # segments: per-window, concatenating to the token stream, with the
    # openai quality diagnostics and per-segment text
    segs = out["segments"]
    assert [t for s in segs for t in s["tokens"]] == out["tokens"]
    assert all(s["end"] > s["start"] for s in segs)
    assert segs[-1]["end"] <= 3 * CHUNK_SECONDS + 1e-6
    assert all("temperature" in s and "avg_logprob" in s for s in segs)
    assert all(s["text"] == " ".join(f"t{t}" for t in s["tokens"])
               for s in segs)
    assert out["words"] is not None and len(out["words"]) > 0
    # word times are nondecreasing across windows and bounded by the audio
    starts = [w.start for w in out["words"]]
    assert all(b >= a - 1e-9 for a, b in zip(starts, starts[1:]))
    assert out["words"][-1].end <= 3 * CHUNK_SECONDS + 1e-6
    # every committed token appears in exactly one word (toy 1:1 grouping)
    assert [w.tokens[0] for w in out["words"]] == out["tokens"]


def test_transcribe_api_streaming_mode(asr, rng):
    model, params = asr
    wav = rng.standard_normal(
        int(1.5 * CHUNK_SECONDS * 16000)).astype(np.float32)
    out = model.transcribe(
        params, wav, PREFIX, beam_size=2, max_len=14, eos_id=EOS,
        chunk_seconds=CHUNK_SECONDS, max_tokens_per_chunk=6,
        temperatures=None)
    assert isinstance(out["tokens"], list) and len(out["tokens"]) > 0
    assert out["text"] is None and out["words"] is None
    assert [t for s in out["segments"] for t in s["tokens"]] == out["tokens"]


def test_hf_weight_load_roundtrip(asr):
    """load_whisper_torch installs converted encoder+decoder weights."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.WhisperConfig(
        vocab_size=TINY.vocab_size, num_mel_bins=80, encoder_layers=1,
        encoder_attention_heads=4, decoder_layers=1, decoder_attention_heads=4,
        d_model=32, encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=TINY.max_source_positions,
        max_target_positions=TINY.max_target_positions,
        pad_token_id=0, bos_token_id=1, eos_token_id=2, decoder_start_token_id=1)
    torch.manual_seed(0)
    hf = transformers.WhisperModel(hf_cfg).eval()

    model, _ = asr
    params = model.load_whisper_torch(hf.state_dict())
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, 80, TINY.max_source_positions * 2)).astype(np.float32)
    ours = np.asarray(model.encode(params, jnp.asarray(mel)))
    with torch.no_grad():
        ref = hf.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_transcribe_word_times_with_timestamp_rules(asr, rng):
    """word_times + timestamp grammar: alignment runs on TEXT tokens only,
    grouped per decode window (seek origins), with absolute offsets."""
    from mocov2_whisper_flamingo_tpu.decode.logit_rules import LogitRules

    model, params = asr
    rules = LogitRules(vocab_size=TINY.vocab_size, timestamp_begin=40,
                       no_timestamps_id=39, eos_id=EOS,
                       max_initial_timestamp_index=2)
    wav = rng.standard_normal(
        int(1.4 * CHUNK_SECONDS * 16000)).astype(np.float32)

    def group_fn(text):
        assert all(t < 40 for t in text)  # timestamps stripped
        return [(f"t{int(t)}", 1) for t in text]

    out = model.transcribe(
        params, wav, PREFIX, beam_size=2, best_of=2, max_len=12,
        eos_id=EOS, chunk_seconds=CHUNK_SECONDS, temperatures=(0.0,),
        logprob_threshold=None, compression_ratio_threshold=None,
        logit_rules=rules, word_times=True, group_fn=group_fn)
    assert all(t < 40 for t in out["tokens"])
    assert all("seek" in s for s in out["segments"])
    if out["words"]:
        assert [w.tokens[0] for w in out["words"]] == out["tokens"]
        assert all(w.end <= len(wav) / 16000 + CHUNK_SECONDS
                   for w in out["words"])


def test_word_times_budget_filling_window(asr, rng):
    """A window that fills the decoder's full token budget with no EOS
    (the hallucination-loop shape) must not overflow the learned-PE table
    in the alignment forward (the appended EOS once pushed the
    teacher-forced sequence to max_target_positions + 1)."""
    model, params = asr
    sr = 16000
    chunk_s = TINY.max_source_positions * 2 * 160 / sr
    wav = rng.standard_normal(int(chunk_s * sr)).astype(np.float32)
    window = [10 + (i % 20)
              for i in range(TINY.max_target_positions - len(PREFIX))]
    segments = [{"start": 0.0, "end": chunk_s, "seek": 0.0,
                 "tokens": list(window)}]
    words = model._word_times(
        params, model._cast_decoder_params(params), jnp.asarray(wav),
        segments, list(PREFIX),
        lambda text: [(f"t{t}", 1) for t in text],
        chunk_seconds=chunk_s, sample_rate=sr, eos_id=EOS)
    assert [w.tokens[0] for w in words] == window
