"""Temperature sampling + quality-gated fallback (decode/sampling.py):
t=0 equals greedy, determinism under a fixed key, openai-convention
logprob scoring vs a step-by-step oracle, compression-ratio/logprob gates,
and the per-example freeze semantics of decode_with_fallback."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mocov2_whisper_flamingo_tpu.decode import (
    beam_search, compression_ratio, decode_with_fallback, greedy_decode,
    needs_fallback, no_speech_probability, sample_decode)
from mocov2_whisper_flamingo_tpu.models.whisper import (
    WhisperConfig, WhisperDecoder)

CFG = WhisperConfig(
    n_mels=80, d_model=48, encoder_layers=1, decoder_layers=2, n_heads=4,
    d_ff=96, vocab_size=50, max_source_positions=16, max_target_positions=32,
)
EOS = 3
PREFIX = [1, 2]
MAX_LEN = 12


@pytest.fixture(scope="module")
def setup():
    dec = WhisperDecoder(CFG)
    params = dec.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    enc_out = jnp.asarray(rng.standard_normal((2, 16, 48)).astype(np.float32))
    return dec, params, enc_out


def test_sample_t0_matches_greedy(setup):
    dec, params, enc_out = setup
    greedy = np.asarray(greedy_decode(dec, params, enc_out, PREFIX, MAX_LEN, EOS))
    r = sample_decode(dec, params, enc_out, PREFIX, key=jax.random.PRNGKey(7),
                      temperature=0.0, num_samples=1, max_len=MAX_LEN, eos_id=EOS)
    np.testing.assert_array_equal(np.asarray(r.sequences)[:, 0], greedy)


def test_sample_deterministic_under_key(setup):
    # The toy random-init decoder's logits are very peaked (std ~10), so
    # variability assertions need a temperature on that scale.
    dec, params, enc_out = setup
    kw = dict(temperature=8.0, num_samples=3, max_len=MAX_LEN, eos_id=EOS)
    a = sample_decode(dec, params, enc_out, PREFIX, key=jax.random.PRNGKey(5), **kw)
    b = sample_decode(dec, params, enc_out, PREFIX, key=jax.random.PRNGKey(5), **kw)
    np.testing.assert_array_equal(np.asarray(a.sequences), np.asarray(b.sequences))
    np.testing.assert_allclose(np.asarray(a.sum_logprob), np.asarray(b.sum_logprob))
    c = sample_decode(dec, params, enc_out, PREFIX, key=jax.random.PRNGKey(6), **kw)
    assert not np.array_equal(np.asarray(a.sequences), np.asarray(c.sequences))


def test_sample_rows_vary_at_high_temperature(setup):
    dec, params, enc_out = setup
    r = sample_decode(dec, params, enc_out, PREFIX, key=jax.random.PRNGKey(2),
                      temperature=8.0, num_samples=4, max_len=MAX_LEN, eos_id=EOS)
    seqs = np.asarray(r.sequences)[0]  # [N, L]
    assert len({tuple(row) for row in seqs}) > 1


def _oracle_score(dec, params, enc_row, tokens_row):
    """Step-by-step openai-convention scoring: sum the log-softmax logprob
    of each generated token up to and including the EOS emission."""
    cache = dec.init_cache(params, enc_row[None], max_len=MAX_LEN)
    total, n_scored = 0.0, 0
    for i in range(MAX_LEN - 1):
        logits, cache = dec.decode_step(
            params, jnp.asarray([[int(tokens_row[i])]]), cache, jnp.int32(i))
        if i + 1 < len(PREFIX):
            continue
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tok = int(tokens_row[i + 1])
        total += float(logp[0, tok])
        n_scored += 1
        if tok == EOS:
            break
    return total, n_scored


def test_logprob_scoring_matches_oracle(setup):
    dec, params, enc_out = setup
    r = sample_decode(dec, params, enc_out, PREFIX, key=jax.random.PRNGKey(3),
                      temperature=0.0, num_samples=1, max_len=MAX_LEN, eos_id=EOS)
    for e in range(enc_out.shape[0]):
        row = np.asarray(r.sequences)[e, 0]
        total, n_scored = _oracle_score(dec, params, enc_out[e], row)
        np.testing.assert_allclose(float(r.sum_logprob[e, 0]), total, rtol=2e-4)
        np.testing.assert_allclose(
            float(r.avg_logprob[e, 0]), total / n_scored, rtol=2e-4)


def test_sample_decode_jits(setup):
    dec, params, enc_out = setup
    f = jax.jit(lambda p, e, k: sample_decode(
        dec, p, e, PREFIX, key=k, temperature=1.0, num_samples=2,
        max_len=MAX_LEN, eos_id=EOS).sequences)
    out = np.asarray(f(params, enc_out, jax.random.PRNGKey(9)))
    ref = np.asarray(sample_decode(
        dec, params, enc_out, PREFIX, key=jax.random.PRNGKey(9),
        temperature=1.0, num_samples=2, max_len=MAX_LEN, eos_id=EOS).sequences)
    np.testing.assert_array_equal(out, ref)


def test_compression_ratio_flags_repetition():
    looped = "the same words " * 50
    normal = "a perfectly ordinary sentence with varied content and words"
    assert compression_ratio(looped) > 2.4
    assert compression_ratio(normal) < 2.4
    assert compression_ratio("") == 0.0
    import zlib
    data = looped.encode("utf-8")
    assert compression_ratio(looped) == len(data) / len(zlib.compress(data))


def test_needs_fallback_gates():
    ok_text = "varied ordinary content here"
    assert needs_fallback(-2.0, ok_text)            # low confidence
    assert needs_fallback(-0.1, "loop " * 100)      # repetitive
    assert not needs_fallback(-0.1, ok_text)
    # disabled gates never fire
    assert not needs_fallback(-99.0, "loop " * 100, None, None)


def test_needs_fallback_no_speech_override():
    """openai: a confident silence detection overrides BOTH failing gates
    (needs_fallback = False is set LAST) — silence must not escalate the
    temperature ladder."""
    bad_text = "loop " * 100
    assert needs_fallback(-9.0, bad_text)  # both gates failing
    assert not needs_fallback(-9.0, bad_text, no_speech_prob=0.9,
                              no_speech_threshold=0.6)
    # below the threshold the override stays out of the way
    assert needs_fallback(-9.0, bad_text, no_speech_prob=0.3,
                          no_speech_threshold=0.6)
    # override needs BOTH the probe value and a threshold
    assert needs_fallback(-9.0, bad_text, no_speech_prob=0.9,
                          no_speech_threshold=None)


def test_fallback_no_speech_override_accepts_first_rung(setup):
    """decode_with_fallback: with the silence override firing, the t=0
    result freezes even though the logprob gate can never pass."""
    dec, params, enc_out = setup
    temps = (0.0, 0.5, 1.0)
    kw = dict(key=jax.random.PRNGKey(0), temperatures=temps, beam_size=2,
              best_of=2, max_len=MAX_LEN, eos_id=EOS,
              logprob_threshold=10.0)  # logprobs <= 0: never passes
    r = decode_with_fallback(dec, params, enc_out, PREFIX, **kw,
                             no_speech_id=5, no_speech_threshold=-1.0)
    assert r.gates_passed.all()
    assert (r.temperature == 0.0).all()
    assert r.no_speech_prob is not None
    # without the override the same call burns the whole ladder
    r2 = decode_with_fallback(dec, params, enc_out, PREFIX, **kw,
                              no_speech_id=5)
    assert (r2.temperature == temps[-1]).all()


def test_fallback_passes_at_t0_when_gates_disabled(setup):
    dec, params, enc_out = setup
    r = decode_with_fallback(
        dec, params, enc_out, PREFIX, key=jax.random.PRNGKey(0),
        beam_size=3, best_of=3, max_len=MAX_LEN, eos_id=EOS,
        logprob_threshold=None, compression_ratio_threshold=None)
    assert r.gates_passed.all()
    assert (r.temperature == 0.0).all()
    ref = beam_search(dec, params, enc_out, PREFIX, beam_size=3,
                      max_len=MAX_LEN, eos_id=EOS)
    np.testing.assert_array_equal(r.sequences, np.asarray(ref.sequences)[:, 0])


def test_fallback_escalates_when_gates_never_pass(setup):
    dec, params, enc_out = setup
    temps = (0.0, 0.5, 1.0)
    r = decode_with_fallback(
        dec, params, enc_out, PREFIX, key=jax.random.PRNGKey(0),
        temperatures=temps, beam_size=2, best_of=2, max_len=MAX_LEN,
        eos_id=EOS, logprob_threshold=10.0)  # logprobs are <= 0: never passes
    assert not r.gates_passed.any()
    assert (r.temperature == temps[-1]).all()  # kept the last rung's attempt
    assert np.isfinite(r.avg_logprob).all()


def test_transcribe_long_form_quality_mode(setup):
    """temperatures= switches transcribe_long_form to the openai-style
    window loop (independent windows + context prompt + fallback gates)."""
    from mocov2_whisper_flamingo_tpu.decode.streaming import transcribe_long_form
    from mocov2_whisper_flamingo_tpu.models.whisper import WhisperEncoder

    dec, params, _ = setup
    enc = WhisperEncoder(CFG)
    enc_params = enc.init(jax.random.PRNGKey(1))
    rng = np.random.default_rng(4)

    sr = 16000
    chunk_seconds = CFG.max_source_positions * 2 * 160 / sr
    audio = rng.standard_normal(
        int(2.2 * CFG.max_source_positions * 2 * 160)).astype(np.float32)

    def mel_fn(wav):
        t = CFG.max_source_positions * 2
        m = jnp.zeros((80, t))
        n = min(wav.shape[-1] // 160, t)
        return m.at[:, :n].set(jnp.resize(
            wav[: n * 80].reshape(-1)[: 80 * n].reshape(80, n), (80, n)))

    kw = dict(eos_id=EOS, chunk_seconds=chunk_seconds, max_len=16,
              mel_fn=mel_fn, beam_size=2, best_of=2,
              context_tokens=3, sot_prev_id=9)
    # gates disabled: every window commits its t=0 beam result
    toks = transcribe_long_form(
        enc, dec, enc_params, params, audio, PREFIX,
        temperatures=(0.0, 0.7), logprob_threshold=None,
        compression_ratio_threshold=None, **kw)
    assert len(toks) > 0 and all(t != EOS for t in toks)
    # an impossible logprob gate escalates every window to the last rung
    # and still commits a transcript (deterministic under the key)
    t1 = transcribe_long_form(
        enc, dec, enc_params, params, audio, PREFIX,
        temperatures=(0.0, 8.0), logprob_threshold=10.0,
        key=jax.random.PRNGKey(11), **kw)
    t2 = transcribe_long_form(
        enc, dec, enc_params, params, audio, PREFIX,
        temperatures=(0.0, 8.0), logprob_threshold=10.0,
        key=jax.random.PRNGKey(11), **kw)
    assert t1 == t2
    assert all(t != EOS for t in t1)


def test_no_speech_probability_matches_oracle(setup):
    """The probe equals softmax(logits at the SOT position)[no_speech_id]
    from a step-by-step teacher-forced forward (openai probs_at_sot)."""
    dec, params, enc_out = setup
    ns_id = 7
    for sot_index in (0, 1):
        p = np.asarray(no_speech_probability(
            dec, params, enc_out, PREFIX, ns_id, sot_index=sot_index))
        assert p.shape == (2,)
        # oracle: feed prefix[0..sot_index], softmax the last logits
        cache = dec.init_cache(params, enc_out, max_len=sot_index + 2)
        for i in range(sot_index + 1):
            logits, cache = dec.decode_step(
                params, jnp.broadcast_to(PREFIX[i], (2, 1)).astype(jnp.int32),
                cache, jnp.int32(i))
        ref = np.asarray(jax.nn.softmax(
            logits.astype(jnp.float32), axis=-1))[:, ns_id]
        np.testing.assert_allclose(p, ref, rtol=2e-4)
        assert (p >= 0).all() and (p <= 1).all()


def test_fallback_returns_no_speech_prob(setup):
    dec, params, enc_out = setup
    r = decode_with_fallback(
        dec, params, enc_out, PREFIX, key=jax.random.PRNGKey(0),
        beam_size=2, best_of=2, max_len=MAX_LEN, eos_id=EOS,
        logprob_threshold=None, compression_ratio_threshold=None,
        no_speech_id=7, sot_index=0)
    assert r.no_speech_prob is not None and r.no_speech_prob.shape == (2,)
    ref = np.asarray(no_speech_probability(dec, params, enc_out, PREFIX, 7))
    np.testing.assert_allclose(r.no_speech_prob, ref, rtol=1e-6)
    # not requested -> absent
    r2 = decode_with_fallback(
        dec, params, enc_out, PREFIX, key=jax.random.PRNGKey(0),
        beam_size=2, best_of=2, max_len=MAX_LEN, eos_id=EOS,
        logprob_threshold=None, compression_ratio_threshold=None)
    assert r2.no_speech_prob is None


def test_long_form_no_speech_skip(setup):
    """A no_speech_threshold of 0 (every window 'silent') with an impossible
    confidence override commits nothing; threshold=1 commits normally."""
    from mocov2_whisper_flamingo_tpu.decode.streaming import transcribe_long_form
    from mocov2_whisper_flamingo_tpu.models.whisper import WhisperEncoder

    dec, params, _ = setup
    enc = WhisperEncoder(CFG)
    enc_params = enc.init(jax.random.PRNGKey(1))
    rng = np.random.default_rng(4)
    audio = rng.standard_normal(
        int(2.2 * CFG.max_source_positions * 2 * 160)).astype(np.float32)

    def mel_fn(wav):
        t = CFG.max_source_positions * 2
        m = jnp.zeros((80, t))
        n = min(wav.shape[-1] // 160, t)
        return m.at[:, :n].set(jnp.resize(
            wav[: n * 80].reshape(-1)[: 80 * n].reshape(80, n), (80, n)))

    kw = dict(eos_id=EOS, chunk_seconds=CFG.max_source_positions * 2 * 160 / 16000,
              max_len=16, mel_fn=mel_fn, beam_size=2, best_of=2,
              temperatures=(0.0,), compression_ratio_threshold=None,
              no_speech_id=7, sot_id=PREFIX[0])
    skipped = transcribe_long_form(
        enc, dec, enc_params, params, audio, PREFIX,
        no_speech_threshold=-1.0, logprob_threshold=10.0, **kw)
    assert skipped == []
    kept = transcribe_long_form(
        enc, dec, enc_params, params, audio, PREFIX,
        no_speech_threshold=2.0, logprob_threshold=None, **kw)
    assert len(kept) > 0
    # confidence override: prob gate says skip, but avg_logprob clears the
    # (always-cleared) -inf logprob gate -> windows are kept anyway
    override = transcribe_long_form(
        enc, dec, enc_params, params, audio, PREFIX,
        no_speech_threshold=-1.0, logprob_threshold=-1e9, **kw)
    assert override == kept


def test_fallback_beam_avg_matches_oracle(setup):
    dec, params, enc_out = setup
    r = decode_with_fallback(
        dec, params, enc_out, PREFIX, key=jax.random.PRNGKey(0),
        beam_size=3, best_of=2, max_len=MAX_LEN, eos_id=EOS,
        logprob_threshold=None, compression_ratio_threshold=None)
    for e in range(enc_out.shape[0]):
        total, n_scored = _oracle_score(dec, params, enc_out[e], r.sequences[e])
        np.testing.assert_allclose(r.avg_logprob[e], total / n_scored, rtol=2e-4)


def test_initial_prompt_conditions_quality_windows(setup, monkeypatch):
    """openai initial_prompt: the prompt precedes the prefix in EVERY
    window's forced context (first window included, transcript empty),
    behind sot_prev, and never enters the committed output."""
    from mocov2_whisper_flamingo_tpu.decode import sampling as sampling_mod
    from mocov2_whisper_flamingo_tpu.decode.streaming import (
        transcribe_long_form)
    from mocov2_whisper_flamingo_tpu.models.whisper import WhisperEncoder

    dec, params, _ = setup
    enc = WhisperEncoder(CFG)
    enc_params = enc.init(jax.random.PRNGKey(1))
    chunk_seconds = CFG.max_source_positions * 2 * 160 / 16000
    audio = np.random.default_rng(2).standard_normal(
        int(2.2 * chunk_seconds * 16000)).astype(np.float32)

    def mel_fn(wav):
        t = CFG.max_source_positions * 2
        n = min(wav.shape[-1] // 160, t)
        m = jnp.zeros((80, t))
        return m.at[:, :n].set(jnp.resize(wav[: 80 * n], (80, n)))

    seen_prefixes = []
    real = sampling_mod.decode_with_fallback

    def spy(decoder, dparams, enc_out, window_prefix, **kw):
        seen_prefixes.append(list(window_prefix))
        return real(decoder, dparams, enc_out, window_prefix, **kw)

    monkeypatch.setattr(sampling_mod, "decode_with_fallback", spy)
    prompt = [30, 31, 32]
    tokens = transcribe_long_form(
        enc, dec, enc_params, params, audio, PREFIX, eos_id=EOS,
        chunk_seconds=chunk_seconds, max_len=MAX_LEN, mel_fn=mel_fn,
        beam_size=2, best_of=2, temperatures=(0.0,),
        logprob_threshold=None, compression_ratio_threshold=None,
        context_tokens=4, sot_prev_id=9, initial_prompt_ids=prompt)
    assert len(seen_prefixes) == 3
    # window 0: sot_prev + prompt + prefix
    assert seen_prefixes[0] == [9] + prompt + PREFIX
    # later windows: prompt stays at the FRONT of the context pool, and the
    # transcript-context length is quantized to a power of two (bounds the
    # per-(prefix length, temperature) compile count)
    for wp in seen_prefixes[1:]:
        assert wp[0] == 9 and wp[-2:] == PREFIX
        ctx = wp[1:-2]
        assert len(ctx) >= len(prompt)
        pool_len = len(ctx) - len(prompt)
        assert pool_len == 0 or (pool_len & (pool_len - 1)) == 0
    assert isinstance(tokens, list)


def test_initial_prompt_streaming_not_committed(setup):
    """Streaming mode: initial_context is decoded against but excluded
    from the committed transcript (and survives a context_tokens=0 reset)."""
    from mocov2_whisper_flamingo_tpu.decode.streaming import StreamingDecoder

    dec, params, enc_out = setup
    stream = StreamingDecoder(
        dec, params, PREFIX, max_len=14, eos_id=EOS,
        max_tokens_per_chunk=4, beam_size=2, sot_prev_id=9,
        initial_context=[30, 31])
    assert stream._window_prefix == [9, 30, 31] + PREFIX
    new = stream.process_chunk(enc_out[:1])
    assert len(new) <= 4
    got = stream.collected_tokens()
    assert got[: len(PREFIX)] == PREFIX  # context is NOT in the transcript
    assert len(got) == len(PREFIX) + len(new)


def test_fallback_reports_compression_ratio(setup):
    dec, params, enc_out = setup
    r = decode_with_fallback(
        dec, params, enc_out, PREFIX, key=jax.random.PRNGKey(0),
        beam_size=2, best_of=2, max_len=MAX_LEN, eos_id=EOS,
        logprob_threshold=None, compression_ratio_threshold=None)
    assert r.compression_ratio is not None and r.compression_ratio.shape == (2,)
    # oracle: ratio of the winning row's text bytes
    for e in range(2):
        ids = [int(x) for x in r.sequences[e][len(PREFIX):]]
        while ids and ids[-1] == EOS:
            ids.pop()
        ref = compression_ratio(np.asarray(ids, np.int32).tobytes())
        assert r.compression_ratio[e] == pytest.approx(ref)


def test_fallback_rejects_empty_temperatures(setup):
    dec, params, enc_out = setup
    with pytest.raises(ValueError, match="non-empty"):
        decode_with_fallback(dec, params, enc_out, PREFIX,
                             key=jax.random.PRNGKey(0), temperatures=())


def test_beam_renorm_after_rules_scores():
    """renorm_after_rules=True: scores become true logprobs over the
    rule-allowed set — never lower than the HF no-renorm convention, and
    strictly higher when a rule masked probability mass."""
    from mocov2_whisper_flamingo_tpu.decode.logit_rules import LogitRules

    dec = WhisperDecoder(CFG)
    params = dec.init(jax.random.PRNGKey(0))
    enc_out = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 16, CFG.d_model)).astype(np.float32))
    rules = LogitRules(vocab_size=CFG.vocab_size,
                       suppress=tuple(range(20, 40)), eos_id=EOS)
    kw = dict(beam_size=2, max_len=MAX_LEN, eos_id=EOS, logit_rules=rules)
    r_hf = beam_search(dec, params, enc_out, PREFIX, **kw)
    r_oa = beam_search(dec, params, enc_out, PREFIX,
                       renorm_after_rules=True, **kw)
    assert (np.asarray(r_oa.scores)[:, 0]
            >= np.asarray(r_hf.scores)[:, 0] - 1e-5).all()


def test_prompt_reset_after_hot_window(setup, monkeypatch):
    """openai prompt_reset_since: a window committed from a rung hotter
    than 0.5 stops conditioning later windows."""
    from mocov2_whisper_flamingo_tpu.decode import sampling as sampling_mod
    from mocov2_whisper_flamingo_tpu.decode.streaming import (
        transcribe_long_form)
    from mocov2_whisper_flamingo_tpu.models.whisper import WhisperEncoder

    dec, params, _ = setup
    enc = WhisperEncoder(CFG)
    enc_params = enc.init(jax.random.PRNGKey(1))
    chunk_seconds = CFG.max_source_positions * 2 * 160 / 16000
    audio = np.random.default_rng(5).standard_normal(
        int(2.5 * chunk_seconds * 16000)).astype(np.float32)

    def mel_fn(wav):
        t = CFG.max_source_positions * 2
        n = min(wav.shape[-1] // 160, t)
        m = jnp.zeros((80, t))
        return m.at[:, :n].set(jnp.resize(wav[: 80 * n], (80, n)))

    seen = []
    real = sampling_mod.decode_with_fallback

    def spy(decoder, dparams, enc_out, window_prefix, **kw):
        seen.append(list(window_prefix))
        return real(decoder, dparams, enc_out, window_prefix, **kw)

    monkeypatch.setattr(sampling_mod, "decode_with_fallback", spy)
    # gates can never pass -> every window commits from the 0.8 rung ->
    # conditioning resets after every window
    transcribe_long_form(
        enc, dec, enc_params, params, audio, PREFIX, eos_id=EOS,
        chunk_seconds=chunk_seconds, max_len=MAX_LEN, mel_fn=mel_fn,
        beam_size=2, best_of=2, temperatures=(0.0, 0.8),
        logprob_threshold=10.0, compression_ratio_threshold=None,
        context_tokens=4, sot_prev_id=9)
    assert len(seen) == 3
    assert all(wp == PREFIX for wp in seen), seen
