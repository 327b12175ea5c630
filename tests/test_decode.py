"""Decode tests: greedy vs step-by-step reference, beam-1 == greedy,
beam improves cumulative log prob, EOS handling, jit-compilability,
streaming persistence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mocov2_whisper_flamingo_tpu.decode import greedy_decode, beam_search, StreamingDecoder
from mocov2_whisper_flamingo_tpu.models.whisper import WhisperConfig, WhisperDecoder, WhisperEncoder

CFG = WhisperConfig(
    n_mels=80, d_model=48, encoder_layers=1, decoder_layers=2, n_heads=4,
    d_ff=96, vocab_size=50, max_source_positions=16, max_target_positions=32,
)
EOS = 3
PREFIX = [1, 2]


@pytest.fixture(scope="module")
def setup():
    dec = WhisperDecoder(CFG)
    params = dec.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    enc_out = jnp.asarray(rng.standard_normal((2, 16, 48)).astype(np.float32))
    return dec, params, enc_out


def _manual_greedy(dec, params, enc_out, max_len):
    """Step-by-step greedy loop in python as the oracle."""
    b = enc_out.shape[0]
    cache = dec.init_cache(params, enc_out, max_len=max_len)
    tokens = np.tile(np.array(PREFIX + [EOS] * (max_len - len(PREFIX)), np.int32), (b, 1))
    done = np.zeros(b, bool)
    for i in range(max_len - 1):
        cur = jnp.asarray(tokens[:, i : i + 1])
        logits, cache = dec.decode_step(params, cur, cache, jnp.int32(i))
        nxt = np.asarray(jnp.argmax(logits, axis=-1))
        if i + 1 < len(PREFIX):
            nxt = tokens[:, i + 1]
        nxt = np.where(done, EOS, nxt)
        done = done | ((nxt == EOS) & (i + 1 >= len(PREFIX)))
        tokens[:, i + 1] = nxt
        if done.all():
            break
    return tokens


def test_greedy_matches_manual(setup):
    dec, params, enc_out = setup
    max_len = 12
    ours = np.asarray(greedy_decode(dec, params, enc_out, PREFIX, max_len, EOS))
    ref = _manual_greedy(dec, params, enc_out, max_len)
    np.testing.assert_array_equal(ours, ref)


def test_greedy_jit(setup):
    dec, params, enc_out = setup
    f = jax.jit(lambda p, e: greedy_decode(dec, p, e, PREFIX, 12, EOS))
    out = np.asarray(f(params, enc_out))
    ref = np.asarray(greedy_decode(dec, params, enc_out, PREFIX, 12, EOS))
    np.testing.assert_array_equal(out, ref)


def test_beam1_equals_greedy(setup):
    dec, params, enc_out = setup
    greedy = np.asarray(greedy_decode(dec, params, enc_out, PREFIX, 12, EOS))
    beam = beam_search(dec, params, enc_out, PREFIX, beam_size=1, max_len=12, eos_id=EOS)
    np.testing.assert_array_equal(np.asarray(beam.sequences)[:, 0], greedy)


def _sequence_logprob(dec, params, enc_out_row, tokens):
    """Cumulative log prob of the generated part of a sequence."""
    seq = [t for t in tokens]
    cache = dec.init_cache(params, enc_out_row[None], max_len=32)
    total = 0.0
    for i in range(len(seq) - 1):
        logits, cache = dec.decode_step(
            params, jnp.asarray([[seq[i]]]), cache, jnp.int32(i))
        logp = jax.nn.log_softmax(logits[0])
        if i + 1 >= len(PREFIX):
            total += float(logp[seq[i + 1]])
        if seq[i + 1] == EOS and i + 1 >= len(PREFIX):
            break
    return total


def test_beam_score_at_least_greedy(setup):
    """Beam-5's best hypothesis must have cumulative log prob >= greedy's."""
    dec, params, enc_out = setup
    greedy = np.asarray(greedy_decode(dec, params, enc_out, PREFIX, 12, EOS))
    beam = beam_search(dec, params, enc_out, PREFIX, beam_size=5, max_len=12,
                       eos_id=EOS, length_penalty=0.0)
    for b in range(enc_out.shape[0]):
        def trim(seq):
            out = list(seq[: len(PREFIX)])
            for t in seq[len(PREFIX):]:
                out.append(int(t))
                if t == EOS:
                    break
            return out

        g_lp = _sequence_logprob(dec, params, enc_out[b], trim(greedy[b]))
        b_lp = _sequence_logprob(dec, params, enc_out[b],
                                 trim(np.asarray(beam.sequences)[b, 0]))
        assert b_lp >= g_lp - 1e-4, (b_lp, g_lp)


def test_beam_jit_and_shapes(setup):
    dec, params, enc_out = setup
    f = jax.jit(lambda p, e: beam_search(dec, p, e, PREFIX, beam_size=3,
                                         max_len=10, eos_id=EOS).sequences)
    out = np.asarray(f(params, enc_out))
    assert out.shape == (2, 3, 10)
    # all beams start with the forced prefix
    assert (out[:, :, : len(PREFIX)] == np.array(PREFIX)).all()


def test_beam_scores_sorted(setup):
    dec, params, enc_out = setup
    res = beam_search(dec, params, enc_out, PREFIX, beam_size=4, max_len=10, eos_id=EOS)
    scores = np.asarray(res.scores)
    assert (np.diff(scores, axis=-1) <= 1e-6).all()


def test_streaming_two_chunks(setup):
    """Decoding chunk A then chunk B continues the transcript (self cache
    persists) and differs from decoding chunk A twice."""
    dec, params, enc_out = setup
    rng = np.random.default_rng(1)
    chunk_a = enc_out[:1]
    chunk_b = jnp.asarray(rng.standard_normal((1, 16, 48)).astype(np.float32))

    sd = StreamingDecoder(dec, params, PREFIX, max_len=32, eos_id=EOS,
                          max_tokens_per_chunk=5)
    out_a = sd.process_chunk(chunk_a)
    n_after_a = len(sd.tokens)
    out_b = sd.process_chunk(chunk_b)
    assert len(sd.tokens) == n_after_a + len(out_b)
    assert sd.tokens[: len(PREFIX)] == PREFIX

    sd2 = StreamingDecoder(dec, params, PREFIX, max_len=32, eos_id=EOS,
                           max_tokens_per_chunk=5)
    out_a2 = sd2.process_chunk(chunk_a)
    assert out_a2 == out_a  # deterministic
    sd2.reset()
    assert sd2.tokens == PREFIX


def test_streaming_single_chunk_matches_greedy(setup):
    """On short input (one chunk, ample budget) the streaming path must
    reproduce the single-pass greedy decode exactly."""
    dec, params, enc_out = setup
    chunk = enc_out[:1]
    ref = np.asarray(greedy_decode(dec, params, chunk, PREFIX, 16, EOS))[0]

    sd = StreamingDecoder(dec, params, PREFIX, max_len=16, eos_id=EOS,
                          max_tokens_per_chunk=16 - len(PREFIX))
    out = sd.process_chunk(chunk)

    def trim(seq):
        kept = list(seq[: len(PREFIX)])
        for t in seq[len(PREFIX):]:
            if t == EOS:
                break
            kept.append(int(t))
        return kept

    assert sd.tokens == trim(ref)
    assert out == trim(ref)[len(PREFIX):]


def test_streaming_single_chunk_matches_beam(setup):
    """beam_size>1 streaming on one chunk == batched beam_search best beam."""
    dec, params, enc_out = setup
    chunk = enc_out[:1]
    res = beam_search(dec, params, chunk, PREFIX, beam_size=3, max_len=16,
                      eos_id=EOS, length_penalty=1.0)
    best = np.asarray(res.sequences)[0, 0]

    sd = StreamingDecoder(dec, params, PREFIX, max_len=16, eos_id=EOS,
                          max_tokens_per_chunk=16 - len(PREFIX), beam_size=3,
                          length_penalty=1.0)
    out = sd.process_chunk(chunk)
    gen = [int(t) for t in best[len(PREFIX):] if t != EOS]
    assert out == gen


def test_streaming_beam_two_chunks(setup):
    """Beam streaming persists the committed hypothesis across chunks."""
    dec, params, enc_out = setup
    rng = np.random.default_rng(2)
    chunk_a = enc_out[:1]
    chunk_b = jnp.asarray(rng.standard_normal((1, 16, 48)).astype(np.float32))

    sd = StreamingDecoder(dec, params, PREFIX, max_len=32, eos_id=EOS,
                          max_tokens_per_chunk=5, beam_size=4)
    out_a = sd.process_chunk(chunk_a)
    n_after_a = len(sd.tokens)
    out_b = sd.process_chunk(chunk_b)
    assert len(sd.tokens) == n_after_a + len(out_b)
    assert sd.tokens[: len(PREFIX)] == PREFIX
    assert all(t != EOS for t in out_a + out_b)


def test_transcribe_long_form(setup, rng):
    """70 s of audio -> 3 chunks -> continuous transcript through the
    persistent-cache streaming path (BASELINE config 5 shape)."""
    from mocov2_whisper_flamingo_tpu.decode.streaming import transcribe_long_form
    from mocov2_whisper_flamingo_tpu.models.whisper import WhisperEncoder

    dec, params, _ = setup
    enc = WhisperEncoder(CFG)
    enc_params = enc.init(jax.random.PRNGKey(1))

    sr = 16000
    audio = rng.standard_normal(int(2.2 * CFG.max_source_positions * 2 * 160)).astype(np.float32)

    def mel_fn(wav):
        # tiny config: produce [80, 2*max_source_positions] mels directly
        t = CFG.max_source_positions * 2
        m = jnp.zeros((80, t))
        n = min(wav.shape[-1] // 160, t)
        return m.at[:, :n].set(jnp.resize(wav[: n * 80].reshape(-1)[: 80 * n].reshape(80, n), (80, n)))

    tokens = transcribe_long_form(
        enc, dec, enc_params, params, audio, PREFIX, eos_id=EOS,
        chunk_seconds=CFG.max_source_positions * 2 * 160 / sr,
        max_len=32, max_tokens_per_chunk=4, mel_fn=mel_fn)
    assert 0 < len(tokens) <= 12  # up to 4 tokens per chunk, 3 chunks
    assert all(t != EOS for t in tokens)


def test_fused_decode_params_match(setup):
    """fuse_decode_params (single fused QKV matmul in the decode step) is a
    pure reparameterization: greedy and beam outputs are bit-identical."""
    dec, params, enc_out = setup
    fused = dec.fuse_decode_params(params)
    g_ref = np.asarray(greedy_decode(dec, params, enc_out, PREFIX, 12, EOS))
    g_fused = np.asarray(greedy_decode(dec, fused, enc_out, PREFIX, 12, EOS))
    np.testing.assert_array_equal(g_fused, g_ref)

    b_ref = beam_search(dec, params, enc_out, PREFIX, beam_size=4, max_len=12,
                        eos_id=EOS)
    b_fused = beam_search(dec, fused, enc_out, PREFIX, beam_size=4, max_len=12,
                          eos_id=EOS)
    np.testing.assert_array_equal(np.asarray(b_fused.sequences),
                                  np.asarray(b_ref.sequences))
    np.testing.assert_allclose(np.asarray(b_fused.scores),
                               np.asarray(b_ref.scores), rtol=1e-6)


def test_streaming_deferred_collect(setup):
    """collect=False defers all host syncs; collected_tokens() at the end
    returns the same transcript as eager per-chunk collection."""
    dec, params, enc_out = setup
    rng = np.random.default_rng(3)
    chunk_a = enc_out[:1]
    chunk_b = jnp.asarray(rng.standard_normal((1, 16, 48)).astype(np.float32))

    eager = StreamingDecoder(dec, params, PREFIX, max_len=32, eos_id=EOS,
                             max_tokens_per_chunk=5, beam_size=3)
    eager.process_chunk(chunk_a)
    eager.process_chunk(chunk_b)

    lazy = StreamingDecoder(dec, params, PREFIX, max_len=32, eos_id=EOS,
                            max_tokens_per_chunk=5, beam_size=3)
    assert lazy.process_chunk(chunk_a, collect=False) == []
    assert lazy.process_chunk(chunk_b, collect=False) == []
    assert lazy.collected_tokens() == eager.tokens
    assert lazy.tokens == eager.tokens


def test_ancestry_matches_reorder(setup):
    """Append-only ancestry-mask attention (use_ancestry=True, default) is a
    pure reimplementation of physical cache reordering: token-exact, scores
    equal to fp tolerance."""
    dec, params, enc_out = setup
    a = beam_search(dec, params, enc_out, PREFIX, beam_size=4, max_len=16,
                    eos_id=EOS, use_ancestry=True)
    r = beam_search(dec, params, enc_out, PREFIX, beam_size=4, max_len=16,
                    eos_id=EOS, use_ancestry=False)
    np.testing.assert_array_equal(np.asarray(a.sequences),
                                  np.asarray(r.sequences))
    np.testing.assert_allclose(np.asarray(a.scores), np.asarray(r.scores),
                               rtol=1e-6)


# ---------------------------------------------------------------------------
# Window rollover: long-form streaming past the max_len token/PE budget
# ---------------------------------------------------------------------------

from mocov2_whisper_flamingo_tpu.decode import LogitRules

NO_EOS = LogitRules(vocab_size=CFG.vocab_size, suppress=(EOS,))


def _chunks(n, seed=7):
    rng = np.random.default_rng(seed)
    return [jnp.asarray(rng.standard_normal((1, 16, 48)).astype(np.float32))
            for _ in range(n)]


def test_streaming_rollover_unbounded_transcript(setup):
    """With rollover, the committed transcript grows far past max_len —
    EOS suppressed via logit rules so every chunk generates full budget
    (320 tokens over 40 chunks against a 32-token window; the >600-token
    real-scale run is the TPU long-form bench leg in bench.py)."""
    dec, params, _ = setup
    sd = StreamingDecoder(dec, params, PREFIX, max_len=32, eos_id=EOS,
                          max_tokens_per_chunk=8, beam_size=2,
                          rollover=True, context_tokens=6, sot_prev_id=4,
                          logit_rules=NO_EOS)
    chunks = _chunks(40)
    total = 0
    for c in chunks:
        total += len(sd.process_chunk(c))
    assert total == 40 * 8  # no truncation anywhere
    collected = sd.collected_tokens()
    assert len(collected) == len(PREFIX) + total
    assert collected[: len(PREFIX)] == PREFIX
    assert collected == sd.tokens
    # re-prime context tokens are never duplicated into the transcript
    assert 4 not in collected[len(PREFIX):]
    # compile count stays bounded regardless of stream length: window-0
    # start/steady + rollover-window start/steady (identical thereafter)
    assert len(sd._fns) <= 4


def test_streaming_rollover_deferred_collect_matches_eager(setup):
    """collect=False across several rollovers returns the same transcript
    as eager collection (rollover boundaries sync independently)."""
    dec, params, _ = setup
    kw = dict(max_len=24, eos_id=EOS, max_tokens_per_chunk=6, beam_size=3,
              rollover=True, context_tokens=4, sot_prev_id=4,
              logit_rules=NO_EOS)
    chunks = _chunks(8, seed=9)
    eager = StreamingDecoder(dec, params, PREFIX, **kw)
    for c in chunks:
        eager.process_chunk(c)
    lazy = StreamingDecoder(dec, params, PREFIX, **kw)
    for c in chunks:
        assert lazy.process_chunk(c, collect=False) == []
    assert lazy.collected_tokens() == eager.tokens


def test_streaming_rollover_matches_fresh_decoder(setup):
    """A rolled-over window is EXACTLY a fresh decoder primed with
    (<|startofprev|> + context + prefix): the next chunk's output must be
    identical (Whisper window-restart semantics)."""
    dec, params, _ = setup
    sd = StreamingDecoder(dec, params, PREFIX, max_len=24, eos_id=EOS,
                          max_tokens_per_chunk=6, beam_size=2, rollover=True,
                          context_tokens=5, sot_prev_id=4,
                          logit_rules=NO_EOS)
    chunks = iter(_chunks(12, seed=11))
    # feed until the NEXT chunk would overflow the 24-token window
    while sd._i_bound + 6 <= 24 - 2:
        sd.process_chunk(next(chunks))
    # force the rollover now so we can capture the new window prefix
    # before processing (process_chunk would do the same internally)
    sd._maybe_rollover()
    assert sd._state is None  # rollover actually fired
    wp = list(sd._window_prefix)
    assert wp[0] == 4 and wp[-len(PREFIX):] == PREFIX and len(wp) == 5 + 1 + len(PREFIX)
    probe = next(chunks)
    out = sd.process_chunk(probe)

    fresh = StreamingDecoder(dec, params, wp, max_len=24, eos_id=EOS,
                             max_tokens_per_chunk=6, beam_size=2,
                             rollover=True, logit_rules=NO_EOS)
    assert fresh.process_chunk(probe) == out


def test_streaming_exhaustion_steps_are_noops(setup):
    """rollover=False: scan steps past token-buffer exhaustion change
    NOTHING — tokens, position, and every self-cache leaf are identical to
    a run with exactly enough steps (the gated cache write; advisor round-2
    finding on the final-slot rewrite)."""
    dec, params, enc_out = setup
    chunk = enc_out[:1]
    max_len = 16
    room = max_len - len(PREFIX)  # generated tokens that fit exactly
    exact = StreamingDecoder(dec, params, PREFIX, max_len=max_len, eos_id=EOS,
                             max_tokens_per_chunk=room, beam_size=3,
                             rollover=False, logit_rules=NO_EOS)
    extra = StreamingDecoder(dec, params, PREFIX, max_len=max_len, eos_id=EOS,
                             max_tokens_per_chunk=room + 4, beam_size=3,
                             rollover=False, logit_rules=NO_EOS)
    out_exact = exact.process_chunk(chunk)
    out_extra = extra.process_chunk(chunk)
    assert out_extra == out_exact
    c_exact, t_exact, i_exact = exact._state
    c_extra, t_extra, i_extra = extra._state
    assert int(i_exact) == int(i_extra) == max_len - 1
    np.testing.assert_array_equal(np.asarray(t_exact), np.asarray(t_extra))
    for le, lx in zip(c_exact, c_extra):
        for name in ("k", "v"):
            np.testing.assert_array_equal(
                np.asarray(le[name], dtype=np.float32),
                np.asarray(lx[name], dtype=np.float32))


# ---------------------------------------------------------------------------
# int8 KV cache (bandwidth lever for wide serving buckets)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("quant", ["int8", "int8-cross"])
def test_int8_cache_logits_tolerance(setup, quant):
    """Teacher-forcing the same tokens through a quantized cache and a
    full-precision cache must give step logits within quantization
    tolerance (per-(position, head) max-abs int8 => ~0.4% per-row error).
    ``int8-cross`` quantizes only the once-written cross cache (the
    profiled-out per-step self-cache write cost, models/whisper.py)."""
    dec, params, enc_out = setup
    max_len = 10
    cache_fp = dec.init_cache(params, enc_out, max_len=max_len)
    cache_q = dec.init_cache(params, enc_out, max_len=max_len, quant=quant)
    if quant == "int8-cross":
        assert cache_q[0]["self"]["k"].dtype != jnp.int8
        assert "k_scale" not in cache_q[0]["self"]
        assert cache_q[0]["cross"]["k"].dtype == jnp.int8
    rng = np.random.default_rng(5)
    b = enc_out.shape[0]
    spread = None
    for i in range(max_len - 2):
        cur = jnp.asarray(rng.integers(4, CFG.vocab_size, (b, 1)), jnp.int32)
        lf, cache_fp = dec.decode_step(params, cur, cache_fp, jnp.int32(i))
        lq, cache_q = dec.decode_step(params, cur, cache_q, jnp.int32(i))
        lf, lq = np.asarray(lf), np.asarray(lq)
        spread = lf.max() - lf.min()
        assert np.abs(lf - lq).max() < 0.05 * spread, f"step {i}"


def test_int8_cache_greedy_and_beam_run(setup):
    """End-to-end decode through the int8 cache: greedy tokens match the
    fp cache on random weights (argmax margins >> quant error) and beam
    scores stay close."""
    dec, params, enc_out = setup
    g_fp = np.asarray(greedy_decode(dec, params, enc_out, PREFIX, 12, EOS))
    g_q = np.asarray(greedy_decode(dec, params, enc_out, PREFIX, 12, EOS,
                                   cache_quant="int8"))
    agree = (g_fp == g_q).mean()
    assert agree > 0.9, f"greedy token agreement {agree}"

    r_fp = beam_search(dec, params, enc_out, PREFIX, beam_size=3, max_len=12,
                       eos_id=EOS)
    for q in ("int8", "int8-cross"):
        r_q = beam_search(dec, params, enc_out, PREFIX, beam_size=3,
                          max_len=12, eos_id=EOS, cache_quant=q)
        np.testing.assert_allclose(np.asarray(r_q.scores)[:, 0],
                                   np.asarray(r_fp.scores)[:, 0],
                                   rtol=0.15, atol=0.3)


def test_windowed_prefix_scan_matches_full(setup):
    """The windowed-prefix scan (read_windows ladder) must reproduce the
    unwindowed beam search: positions beyond the live index contribute
    exactly zero probability either way, so sequences are identical and
    scores match to fp tolerance (the segment boundary changes nothing but
    static slice sizes)."""
    dec, params, enc_out = setup
    max_len = 24
    full = beam_search(dec, params, enc_out, PREFIX, beam_size=3,
                       max_len=max_len, eos_id=EOS)
    for ladder in [(8, 16, 24), (6, 24), (24,), (4, 8, 12, 16, 20, 24)]:
        win = beam_search(dec, params, enc_out, PREFIX, beam_size=3,
                          max_len=max_len, eos_id=EOS, read_windows=ladder)
        np.testing.assert_array_equal(
            np.asarray(win.sequences), np.asarray(full.sequences),
            err_msg=f"ladder {ladder}")
        np.testing.assert_allclose(np.asarray(win.scores),
                                   np.asarray(full.scores), atol=1e-5)
    # jit-compilability of the segmented program
    f = jax.jit(lambda p, e: beam_search(
        dec, p, e, PREFIX, beam_size=3, max_len=max_len, eos_id=EOS,
        read_windows=(8, 16, 24)).sequences)
    np.testing.assert_array_equal(np.asarray(f(params, enc_out)),
                                  np.asarray(full.sequences))
    # guards: unsorted ladder / wrong terminal / reorder fallback
    with pytest.raises(ValueError):
        beam_search(dec, params, enc_out, PREFIX, beam_size=3,
                    max_len=max_len, eos_id=EOS, read_windows=(16, 8, 24))
    with pytest.raises(ValueError):
        beam_search(dec, params, enc_out, PREFIX, beam_size=3,
                    max_len=max_len, eos_id=EOS, read_windows=(8, 16))
    with pytest.raises(ValueError):
        beam_search(dec, params, enc_out, PREFIX, beam_size=3,
                    max_len=max_len, eos_id=EOS, read_windows=(8, 24),
                    use_ancestry=False)


def test_windowed_scan_composes_with_cache_quant(setup):
    """read_windows x cache_quant (the bench's B=16 leg may combine them):
    the windowed int8/int8-cross scans must equal their unwindowed twins
    token-for-token (windows only change static slice sizes; scales are
    windowed alongside k/v)."""
    dec, params, enc_out = setup
    max_len = 24
    for q in ("int8", "int8-cross"):
        full = beam_search(dec, params, enc_out, PREFIX, beam_size=3,
                           max_len=max_len, eos_id=EOS, cache_quant=q)
        win = beam_search(dec, params, enc_out, PREFIX, beam_size=3,
                          max_len=max_len, eos_id=EOS, cache_quant=q,
                          read_windows=(8, 16, 24))
        np.testing.assert_array_equal(np.asarray(win.sequences),
                                      np.asarray(full.sequences),
                                      err_msg=f"cache_quant={q}")
        np.testing.assert_allclose(np.asarray(win.scores),
                                   np.asarray(full.scores), atol=1e-5)


def test_default_read_windows_shapes():
    """Ladder generator edge cases: ascending, ends at max_len, multiples
    of 8 below the top, None below the 48-token floor; batch-aware shape
    (fifths at wide batches, thirds below — the measured winners)."""
    from mocov2_whisper_flamingo_tpu.decode import default_read_windows

    assert default_read_windows(160) == (48, 96, 160)
    assert default_read_windows(160, batch=4) == (48, 96, 160)
    assert default_read_windows(160, batch=16) == (32, 64, 96, 128, 160)
    assert default_read_windows(224) == (64, 144, 224)
    assert default_read_windows(224, batch=32) == (48, 88, 136, 176, 224)
    assert default_read_windows(47) is None
    assert default_read_windows(47, batch=16) is None
    for ml in (48, 53, 100, 448):
        for batch in (None, 16):
            ladder = default_read_windows(ml, batch=batch)
            assert ladder is not None and ladder[-1] == ml
            assert list(ladder) == sorted(set(ladder))
            assert all(w % 8 == 0 for w in ladder[:-1])
            assert ladder[0] >= 16
