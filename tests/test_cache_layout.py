"""Einsum-native ("bhjtd") self-cache layout vs the rows layout.

The bhjtd layout stores the beam self caches as [B, H, K, T, Dh] so the
ancestry attention einsums' batch dims (b, h) lead the physical layout
(models/whisper.py ``init_cache(layout=...)`` / ``_native_cache_write``).
It is pure data movement — the attention algebra is unchanged — so beam
decode must produce the SAME tokens as the rows layout in every
composition: plain, windowed-prefix scan, int8 / int8-cross caches, jit.
Probe motivation + on-chip numbers: tools/cache_layout_probe.py and the
BASELINE.md round-4 cache-layout rows.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mocov2_whisper_flamingo_tpu.decode import beam_search
from mocov2_whisper_flamingo_tpu.models.whisper import (
    WhisperConfig, WhisperDecoder)

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
    enc_out = jnp.asarray(rng.standard_normal((3, 16, 48)).astype(np.float32))
    return dec, params, enc_out


def _run(dec, params, enc_out, **kw):
    res = beam_search(dec, params, enc_out, PREFIX, beam_size=3, max_len=24,
                      eos_id=EOS, **kw)
    return np.asarray(res.sequences), np.asarray(res.scores)


def test_init_cache_bhjtd_shapes(setup):
    dec, params, enc_out = setup
    cache = dec.init_cache(params, enc_out, max_len=24, beam_groups=3,
                           layout="bhjtd")
    s = cache[0]["self"]
    assert s["k"].shape == (3, CFG.n_heads, 3, 24, CFG.head_dim)
    assert s["v"].shape == s["k"].shape
    # cross cache stays B-major regardless of the self layout
    assert cache[0]["cross"]["k"].shape[0] == 3
    quant = dec.init_cache(params, enc_out, max_len=24, beam_groups=3,
                           layout="bhjtd", quant="int8")
    qs = quant[0]["self"]
    assert qs["k"].dtype == jnp.int8
    assert qs["k_scale"].shape == (3, CFG.n_heads, 3, 24)


def test_init_cache_rejects_unknown_layout(setup):
    dec, params, enc_out = setup
    with pytest.raises(ValueError, match="layout"):
        dec.init_cache(params, enc_out, max_len=8, layout="thbd")


def test_bhjtd_matches_rows(setup):
    dec, params, enc_out = setup
    seq_r, sc_r = _run(dec, params, enc_out)
    seq_n, sc_n = _run(dec, params, enc_out, cache_layout="bhjtd")
    np.testing.assert_array_equal(seq_n, seq_r)
    np.testing.assert_allclose(sc_n, sc_r, atol=1e-5)


def test_bhjtd_composes_with_windows(setup):
    dec, params, enc_out = setup
    seq_r, sc_r = _run(dec, params, enc_out)
    seq_n, sc_n = _run(dec, params, enc_out, cache_layout="bhjtd",
                       read_windows=(8, 16, 24))
    np.testing.assert_array_equal(seq_n, seq_r)
    np.testing.assert_allclose(sc_n, sc_r, atol=1e-5)


@pytest.mark.parametrize("layout", ["rows", "bhjtd"])
def test_prefix_in_window_matches_full_cache_prefix(setup, layout):
    """The ``_prefix_in_window`` A/B knob (teacher-force the prefix on the
    first-rung cache slice — measured slower on chip, default off) must be
    exact in both layouts: rungs are filtered to hold the whole prefix, and
    positions past the write head contribute zero either way."""
    dec, params, enc_out = setup
    kw = dict(cache_layout=layout, read_windows=(8, 16, 24))
    seq_w, sc_w = _run(dec, params, enc_out, _prefix_in_window=True, **kw)
    seq_f, sc_f = _run(dec, params, enc_out, **kw)
    np.testing.assert_array_equal(seq_w, seq_f)
    np.testing.assert_allclose(sc_w, sc_f, atol=1e-5)


@pytest.mark.parametrize("quant", ["int8", "int8-cross"])
def test_bhjtd_composes_with_cache_quant(setup, quant):
    """Layout is orthogonal to cache quantization: the int8 values AND the
    folded scales must land in the native layout and reproduce the rows
    layout's tokens exactly (identical quantized values -> identical
    algebra)."""
    dec, params, enc_out = setup
    seq_r, sc_r = _run(dec, params, enc_out, cache_quant=quant)
    seq_n, sc_n = _run(dec, params, enc_out, cache_quant=quant,
                       cache_layout="bhjtd")
    np.testing.assert_array_equal(seq_n, seq_r)
    np.testing.assert_allclose(sc_n, sc_r, atol=1e-5)
    seq_w, sc_w = _run(dec, params, enc_out, cache_quant=quant,
                       cache_layout="bhjtd", read_windows=(8, 16, 24))
    np.testing.assert_array_equal(seq_w, seq_r)


def test_bhjtd_jit_matches_eager(setup):
    dec, params, enc_out = setup
    f = jax.jit(lambda p, e: beam_search(
        dec, p, e, PREFIX, beam_size=3, max_len=24, eos_id=EOS,
        cache_layout="bhjtd", read_windows=(8, 16, 24)).sequences)
    out = np.asarray(f(params, enc_out))
    ref, _ = _run(dec, params, enc_out)
    np.testing.assert_array_equal(out, ref)


def test_bhjtd_requires_ancestry(setup):
    dec, params, enc_out = setup
    with pytest.raises(ValueError, match="use_ancestry"):
        beam_search(dec, params, enc_out, PREFIX, beam_size=3, max_len=24,
                    eos_id=EOS, cache_layout="bhjtd", use_ancestry=False)


def test_decode_step_bhjtd_rejects_rowwise_read(setup):
    """The native layout is readable only through the ancestry path — a
    row-aligned decode_step against it must fail loudly, not misread."""
    dec, params, enc_out = setup
    cache = dec.init_cache(params, enc_out, max_len=8, beam_groups=1,
                           layout="bhjtd")
    tok = jnp.full((3, 1), 1, jnp.int32)
    with pytest.raises(ValueError, match="ancestry"):
        dec.decode_step(params, tok, cache, jnp.int32(0))


def test_streaming_bhjtd_matches_rows(setup):
    """StreamingDecoder with the bhjtd chunk cache must reproduce the rows
    layout token-for-token across chunks — incl. the beam-commit gather at
    each chunk boundary and a window rollover (the persistent-cache reader
    the layout plumbing was added for)."""
    from mocov2_whisper_flamingo_tpu.decode import StreamingDecoder

    dec, params, enc_out = setup
    rng = np.random.default_rng(7)
    chunks = [enc_out[:1],
              jnp.asarray(rng.standard_normal((1, 16, 48)).astype(np.float32)),
              jnp.asarray(rng.standard_normal((1, 16, 48)).astype(np.float32))]

    def run(layout):
        sd = StreamingDecoder(dec, params, PREFIX, max_len=24, eos_id=EOS,
                              max_tokens_per_chunk=8, beam_size=3,
                              cache_layout=layout)
        for c in chunks:  # 3 chunks x 8 tokens vs budget 24 -> one rollover
            sd.process_chunk(c)
        return sd.collected_tokens()

    assert run("bhjtd") == run("rows")


def test_streaming_rejects_unknown_layout(setup):
    from mocov2_whisper_flamingo_tpu.decode import StreamingDecoder

    dec, params, _ = setup
    with pytest.raises(ValueError, match="cache_layout"):
        StreamingDecoder(dec, params, PREFIX, cache_layout="thbd")


def test_bhjtd_write_gate_preserves_rows(setup):
    """write_gate=False must leave the bhjtd cache slot (values AND int8
    scales) untouched — streaming's fixed-trip overrun guard."""
    dec, params, enc_out = setup
    b, k = 3, 2
    anc = jnp.broadcast_to(
        jnp.eye(k, dtype=jnp.float32)[None, :, :, None], (b, k, k, 8)) + 0.0
    for quant in (None, "int8"):
        cache = dec.init_cache(params, enc_out, max_len=8, beam_groups=k,
                               layout="bhjtd", quant=quant)
        tok = jnp.full((b * k, 1), 1, jnp.int32)
        _, c1 = dec.decode_step(params, tok, cache, jnp.int32(2),
                                ancestry=anc, write_gate=jnp.bool_(True))
        _, c2 = dec.decode_step(params, tok, c1, jnp.int32(2),
                                ancestry=anc, write_gate=jnp.bool_(False))
        for key in c1[0]["self"]:
            np.testing.assert_array_equal(np.asarray(c2[0]["self"][key]),
                                          np.asarray(c1[0]["self"][key]))
        # and the gated-on write did write: slot 2 is nonzero
        assert np.abs(np.asarray(
            c1[0]["self"]["k"][:, :, :, 2])).sum() > 0
