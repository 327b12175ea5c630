"""Timestamp-token segmentation (decode/segments.py) — openai
transcribe.py window-parse semantics — plus the seek-loop integration in
transcribe_long_form quality mode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mocov2_whisper_flamingo_tpu.decode.logit_rules import LogitRules
from mocov2_whisper_flamingo_tpu.decode.segments import (
    TIME_PRECISION, segments_from_window, strip_timestamps)

TS0 = 100  # timestamp_begin: token TS0 + k means k * 0.02 s


def ts(k):
    return TS0 + k


def test_no_timestamps_single_segment_full_window():
    segs, adv = segments_from_window([5, 6, 7], TS0, 10.0, 30.0)
    assert adv == 30.0
    assert segs == [{"start": 10.0, "end": 40.0, "tokens": [5, 6, 7]}]


def test_trailing_lone_timestamp_caps_duration():
    # no pairs, but a final timestamp: duration = its time (openai branch
    # "no consecutive timestamps but it has a timestamp; use the last one")
    segs, adv = segments_from_window([ts(0), 5, 6, ts(250)], TS0, 0.0, 30.0)
    assert adv == 30.0
    assert len(segs) == 1
    assert segs[0]["end"] == pytest.approx(250 * TIME_PRECISION)


def test_consecutive_pairs_split_and_seek():
    # <|0.00|> a b <|2.00|><|2.00|> c <|4.00|><|4.00|> d  (unfinished tail)
    tokens = [ts(0), 5, 6, ts(100), ts(100), 7, ts(200), ts(200), 8]
    segs, adv = segments_from_window(tokens, TS0, 0.0, 30.0)
    assert len(segs) == 2
    assert segs[0] == {"start": 0.0, "end": 2.0,
                       "tokens": [ts(0), 5, 6, ts(100)]}
    assert segs[1] == {"start": 2.0, "end": 4.0,
                       "tokens": [ts(100), 7, ts(200)]}
    # tail [ts(200), 8] dropped; seek to the last finished timestamp
    assert adv == pytest.approx(4.0)


def test_single_timestamp_ending_consumes_whole_window():
    # <|0.00|> a <|1.00|><|1.00|> b <|3.00|>  (ends in a lone timestamp)
    tokens = [ts(0), 5, ts(50), ts(50), 6, ts(150)]
    segs, adv = segments_from_window(tokens, TS0, 60.0, 30.0)
    assert len(segs) == 2
    assert segs[1]["tokens"] == [ts(50), 6, ts(150)]
    assert segs[1]["start"] == pytest.approx(61.0)
    assert segs[1]["end"] == pytest.approx(63.0)
    assert adv == 30.0  # lone ending: no speech after -> full stride


def test_time_offset_applied():
    segs, _ = segments_from_window([ts(10), 5, ts(20), ts(20), 6, ts(30)],
                                   TS0, 100.0, 30.0)
    assert segs[0]["start"] == pytest.approx(100.0 + 0.2)
    assert segs[0]["end"] == pytest.approx(100.0 + 0.4)


def test_strip_timestamps():
    assert strip_timestamps([ts(0), 5, 6, ts(100), 7], TS0) == [5, 6, 7]
    # with the text upper bound, special ids in [eot, ts0) are dropped too
    # (openai keeps token < tokenizer.eot)
    assert strip_timestamps([5, TS0 - 1, 6, ts(3)], TS0, eot=TS0 - 2) == [5, 6]


# -- seek-loop integration ----------------------------------------------------


CFG_KW = dict(n_mels=80, d_model=32, encoder_layers=1, decoder_layers=1,
              n_heads=4, d_ff=64, max_source_positions=20,
              max_target_positions=32)


def test_quality_mode_timestamp_seek_loop():
    """transcribe_long_form with the timestamp grammar: the loop
    terminates, segments carry valid absolute times, the flat stream has
    no timestamp tokens, and diagnostics ride on every segment."""
    from mocov2_whisper_flamingo_tpu.decode.streaming import (
        transcribe_long_form)
    from mocov2_whisper_flamingo_tpu.models.whisper import (
        WhisperConfig, WhisperDecoder, WhisperEncoder)

    cfg = WhisperConfig(vocab_size=64, **CFG_KW)
    ts0 = 40  # grammar: tokens >= 40 are timestamps
    rules = LogitRules(vocab_size=64, timestamp_begin=ts0,
                       no_timestamps_id=39, eos_id=2,
                       max_initial_timestamp_index=1)
    enc = WhisperEncoder(cfg)
    dec = WhisperDecoder(cfg)
    enc_params = enc.init(jax.random.PRNGKey(0))
    dec_params = dec.init(jax.random.PRNGKey(1))
    chunk_seconds = cfg.max_source_positions * 2 * 160 / 16000
    audio = np.random.default_rng(0).standard_normal(
        int(2.6 * chunk_seconds * 16000)).astype(np.float32)
    duration = len(audio) / 16000

    def mel_fn(wav):
        t = cfg.max_source_positions * 2
        n = min(wav.shape[-1] // 160, t)
        m = jnp.zeros((80, t))
        return m.at[:, :n].set(jnp.resize(wav[: 80 * n], (80, n)))

    tokens, segments = transcribe_long_form(
        enc, dec, enc_params, dec_params, audio, [1, 3], eos_id=2,
        chunk_seconds=chunk_seconds, max_len=14, mel_fn=mel_fn,
        beam_size=2, best_of=2, temperatures=(0.0,),
        logprob_threshold=None, compression_ratio_threshold=None,
        logit_rules=rules, return_segments=True)
    assert all(t < ts0 for t in tokens)  # flat stream is text-only
    assert segments, "timestamp grammar must still produce segments"
    for s in segments:
        assert 0.0 <= s["start"] <= s["end"] <= duration + chunk_seconds
        assert "temperature" in s and "avg_logprob" in s
        # first generated token of each window-leading segment obeys the
        # grammar: begins with a timestamp
    starts = [s["start"] for s in segments]
    assert starts == sorted(starts)
    # text tokens in segments reassemble the flat stream
    assert [t for s in segments for t in s["tokens"] if t < ts0] == tokens


def test_quality_mode_without_rules_unchanged():
    """No logit_rules -> the fixed-stride loop with window-bound segments
    (regression guard for the seek refactor)."""
    from mocov2_whisper_flamingo_tpu.decode.streaming import (
        transcribe_long_form)
    from mocov2_whisper_flamingo_tpu.models.whisper import (
        WhisperConfig, WhisperDecoder, WhisperEncoder)

    cfg = WhisperConfig(vocab_size=50, **CFG_KW)
    enc = WhisperEncoder(cfg)
    dec = WhisperDecoder(cfg)
    enc_params = enc.init(jax.random.PRNGKey(0))
    dec_params = dec.init(jax.random.PRNGKey(1))
    chunk_seconds = cfg.max_source_positions * 2 * 160 / 16000
    audio = np.random.default_rng(1).standard_normal(
        int(1.7 * chunk_seconds * 16000)).astype(np.float32)

    def mel_fn(wav):
        t = cfg.max_source_positions * 2
        n = min(wav.shape[-1] // 160, t)
        m = jnp.zeros((80, t))
        return m.at[:, :n].set(jnp.resize(wav[: 80 * n], (80, n)))

    tokens, segments = transcribe_long_form(
        enc, dec, enc_params, dec_params, audio, [1, 3], eos_id=2,
        chunk_seconds=chunk_seconds, max_len=12, mel_fn=mel_fn,
        beam_size=2, best_of=2, temperatures=(0.0,),
        logprob_threshold=None, compression_ratio_threshold=None,
        return_segments=True)
    assert len(segments) == 2  # one per fixed-stride window
    assert segments[0]["start"] == 0.0
    assert segments[0]["end"] == pytest.approx(chunk_seconds)
    assert segments[1]["end"] == pytest.approx(len(audio) / 16000)
    assert [t for s in segments for t in s["tokens"]] == tokens


def test_segments_partition_property_random_streams():
    """Random token streams: segment tokens always form a clean prefix
    partition of the window tokens (the dropped tail is exactly
    tokens[last_slice:]), times are nonnegative and ordered, and the
    advance is positive."""
    rng = np.random.default_rng(3)
    for _ in range(300):
        n = int(rng.integers(0, 24))
        # grammar-legal streams: timestamps nondecreasing (the logit rules
        # enforce this during decoding — the parser may assume it)
        ts_vals = np.sort(rng.integers(0, 40, n))
        toks = [int(ts(ts_vals[i])) if rng.random() < 0.45 else
                int(rng.choice([5, 6, 7])) for i in range(n)]
        segs, adv = segments_from_window(toks, TS0, 4.0, 30.0)
        assert adv > 0
        flat = [t for s in segs for t in s["tokens"]]
        # flat is a prefix of toks: either everything (no pairs / lone
        # ending) or everything up to the dropped tail
        assert flat == toks[: len(flat)]
        for s in segs:
            assert s["start"] >= 4.0 and s["end"] >= s["start"] - 1e-9 \
                or s["tokens"]  # zero-length segments allowed at equal ts
        starts = [s["start"] for s in segs]
        assert starts == sorted(starts)
