"""Continuous (iteration-level) batching vs solo beam decode.

The segment program phases rows over a shared physical cache
(serving/continuous.py). Per-row beam semantics are decode/beam.py's, so a
row admitted at ANY tick — including into a slot still holding a previous
occupant's cache/ancestry — must decode bit-identically to a solo
``beam_search`` of the same utterance. That is the exactness contract the
per-row written-since-admission mask provides.
"""

import threading
import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mocov2_whisper_flamingo_tpu.decode import beam_search
from mocov2_whisper_flamingo_tpu.models.whisper import (
    WhisperConfig, WhisperDecoder)
from mocov2_whisper_flamingo_tpu.serving.continuous import (
    ContinuousEngine, init_state, make_admit_fn, make_segment_fn)

CFG = WhisperConfig(
    n_mels=80, d_model=48, encoder_layers=1, decoder_layers=2, n_heads=4,
    d_ff=96, vocab_size=50, max_source_positions=16, max_target_positions=32,
)
EOS = 3
PREFIX = [1, 2]
K = 3
S = 8
M = 3
MAX_LEN = S * M  # 24
ENC_LEN = 16


@pytest.fixture(scope="module")
def setup():
    dec = WhisperDecoder(CFG)
    params = dec.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    utts = [jnp.asarray(rng.standard_normal((1, ENC_LEN, 48)).astype(np.float32))
            for _ in range(6)]
    solos = [np.asarray(beam_search(
        dec, params, u, PREFIX, beam_size=K, max_len=MAX_LEN,
        eos_id=EOS).sequences[0]) for u in utts]
    return dec, params, utts, solos


def _machine(dec, capacity=3, layout="bhjtd"):
    state = init_state(dec, capacity=capacity, beam_size=K, seg_steps=S,
                       n_segments=M, enc_len=ENC_LEN, eos_id=EOS,
                       cache_layout=layout)
    admit = make_admit_fn(dec, PREFIX, EOS, K, MAX_LEN)
    segment = make_segment_fn(dec, beam_size=K, seg_steps=S, n_segments=M,
                              n_prefix=len(PREFIX), eos_id=EOS)
    return state, admit, segment


@pytest.mark.parametrize("layout", ["bhjtd", "rows"])
def test_staggered_admission_matches_solo(setup, layout):
    """Rows admitted at ticks 0, 1, 2 (each mid-flight for the previous
    ones) all reproduce their solo beam decode exactly — pool tokens AND
    scores."""
    dec, params, utts, solos = setup
    state, admit, segment = _machine(dec, layout=layout)
    valid = jnp.ones((1, ENC_LEN), bool)

    for tick in range(3):
        state = admit(params, state, utts[tick], valid, np.int32(tick))
        state = segment(params, state)
    # rows 0..2 finish at ticks 3, 4, 5
    for _ in range(2):
        state = segment(params, state)
    for row in range(3):
        got = np.asarray(state["pool_tokens"][row])
        np.testing.assert_array_equal(
            got, solos[row], err_msg=f"row {row} (layout={layout})")


def test_slot_reuse_after_retirement(setup):
    """A row admitted into a DIRTY slot (previous occupant's self cache and
    ancestry never cleared) must still match its solo decode — the
    written-since-admission mask hides every stale stripe."""
    dec, params, utts, solos = setup
    state, admit, segment = _machine(dec, capacity=2)
    valid = jnp.ones((1, ENC_LEN), bool)

    state = admit(params, state, utts[0], valid, np.int32(0))
    state = admit(params, state, utts[1], valid, np.int32(1))
    for _ in range(M):
        state = segment(params, state)
    np.testing.assert_array_equal(
        np.asarray(state["pool_tokens"][0, 0]), solos[0][0])
    # Reuse row 0 for utterance 2 while row 1 would be mid-flight in a
    # staggered schedule; run its full budget.
    state = admit(params, state, utts[2], valid, np.int32(0))
    for _ in range(M):
        state = segment(params, state)
    np.testing.assert_array_equal(
        np.asarray(state["pool_tokens"][0, 0]), solos[2][0])


def test_pool_scores_match_solo(setup):
    dec, params, utts, solos = setup
    state, admit, segment = _machine(dec, capacity=1)
    valid = jnp.ones((1, ENC_LEN), bool)
    state = admit(params, state, utts[3], valid, np.int32(0))
    for _ in range(M):
        state = segment(params, state)
    ref = beam_search(dec, params, utts[3], PREFIX, beam_size=K,
                      max_len=MAX_LEN, eos_id=EOS)
    np.testing.assert_array_equal(np.asarray(state["pool_tokens"][0]),
                                  np.asarray(ref.sequences[0]))
    np.testing.assert_allclose(np.asarray(state["pool_scores"][0]),
                               np.asarray(ref.scores[0]), atol=1e-5)


def test_engine_end_to_end(setup):
    """Threaded engine: 5 requests through capacity 2 — every result
    matches its solo decode; admission (queue_ms) for the overflow requests
    is bounded by segments, not whole decodes."""
    dec, params, utts, solos = setup

    def encode(p, payloads):  # payloads = [(features, valid), ...]
        return (jnp.concatenate([f for f, _ in payloads]),
                jnp.concatenate([v for _, v in payloads]))

    eng = ContinuousEngine(
        dec, params, encode, prefix_ids=PREFIX, eos_id=EOS, enc_len=ENC_LEN,
        capacity=2, beam_size=K, seg_steps=S, n_segments=M)
    try:
        valid = jnp.ones((1, ENC_LEN), bool)
        futs = [eng.submit(utts[i], valid) for i in range(5)]
        results = [f.result(timeout=300) for f in futs]
    finally:
        eng.close()
    for i, r in enumerate(results):
        # ServeResult trims at EOS; compare against the solo row trimmed
        # the same way.
        solo = solos[i][0]
        hits = np.nonzero(solo[len(PREFIX):] == EOS)[0]
        trimmed = solo[: len(PREFIX) + int(hits[0])] if hits.size else solo
        np.testing.assert_array_equal(r.tokens, trimmed, err_msg=f"req {i}")
    assert all(r.bucket == 2 for r in results)


def test_engine_close_fails_pending(setup):
    dec, params, utts, _ = setup
    started = threading.Event()

    def encode(p, payloads):
        started.set()
        time.sleep(0.05)
        return (jnp.concatenate([f for f, _ in payloads]),
                jnp.concatenate([v for _, v in payloads]))

    eng = ContinuousEngine(
        dec, params, encode, prefix_ids=PREFIX, eos_id=EOS, enc_len=ENC_LEN,
        capacity=1, beam_size=K, seg_steps=S, n_segments=M)
    valid = jnp.ones((1, ENC_LEN), bool)
    futs = [eng.submit(utts[0], valid) for _ in range(3)]
    started.wait(10)
    eng.close()
    # every future resolves (result or engine-closed error); none hang
    done = sum(1 for f in futs
               if f.done())
    assert done == 3
