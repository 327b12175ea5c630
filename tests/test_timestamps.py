"""Word timestamps (decode/timestamps.py): DTW vs a brute-force path
oracle, median filter vs a naive reference, alignment-matrix math,
cross-weight extraction parity with the plain decoder forward, and
end-to-end token/word timing sanity on a toy decoder."""

import itertools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mocov2_whisper_flamingo_tpu.decode.timestamps import (
    SECONDS_PER_FRAME, WordTiming, alignment_matrix,
    default_alignment_heads, dtw, median_filter, token_timestamps,
    word_timestamps)
from mocov2_whisper_flamingo_tpu.models.whisper import (
    WhisperConfig, WhisperDecoder)

CFG = WhisperConfig(
    n_mels=80, d_model=48, encoder_layers=1, decoder_layers=2, n_heads=4,
    d_ff=96, vocab_size=50, max_source_positions=16, max_target_positions=32,
)


@pytest.fixture(scope="module")
def setup():
    dec = WhisperDecoder(CFG)
    params = dec.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    enc_out = jnp.asarray(rng.standard_normal((1, 16, 48)).astype(np.float32))
    return dec, params, enc_out


# -- DTW ---------------------------------------------------------------------


def _brute_force_dtw_cost(cost):
    """Min total cost over all monotonic paths from (0,0) to (n-1,m-1)
    with moves down/right/diagonal, by exhaustive enumeration."""
    n, m = cost.shape
    best = [np.inf]

    def walk(i, j, acc):
        acc += cost[i, j]
        if acc >= best[0]:
            return
        if i == n - 1 and j == m - 1:
            best[0] = acc
            return
        for di, dj in ((1, 1), (1, 0), (0, 1)):
            if i + di < n and j + dj < m:
                walk(i + di, j + dj, acc)

    walk(0, 0, 0.0)
    return best[0]


def test_dtw_matches_brute_force():
    rng = np.random.default_rng(1)
    for n, m in ((3, 4), (4, 4), (5, 3)):
        cost = rng.standard_normal((n, m)) ** 2
        ti, fi = dtw(cost)
        # valid path: starts (0,0), ends (n-1,m-1), monotone steps
        assert (ti[0], fi[0]) == (0, 0)
        assert (ti[-1], fi[-1]) == (n - 1, m - 1)
        steps = set(zip(np.diff(ti), np.diff(fi)))
        assert steps <= {(0, 1), (1, 0), (1, 1)}
        path_cost = cost[ti, fi].sum()
        np.testing.assert_allclose(path_cost, _brute_force_dtw_cost(cost),
                                   rtol=1e-12)


def test_dtw_diagonal_identity():
    # strongly diagonal cost -> the path is the diagonal
    n = 6
    cost = 1.0 - np.eye(n)
    ti, fi = dtw(cost)
    diag = [(i, i) for i in range(n)]
    assert list(zip(ti, fi)) == diag


# -- median filter -----------------------------------------------------------


def test_median_filter_matches_naive():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 20))
    w = 7
    out = median_filter(x, w)
    half = w // 2
    padded = np.concatenate(
        [np.repeat(x[:, :1], half, axis=1), x,
         np.repeat(x[:, -1:], half, axis=1)], axis=1)
    naive = np.stack([
        [np.median(padded[r, j:j + w]) for j in range(x.shape[1])]
        for r in range(x.shape[0])])
    np.testing.assert_allclose(out, naive)
    np.testing.assert_array_equal(median_filter(x, 1), x)
    with pytest.raises(ValueError):
        median_filter(x, 4)


# -- alignment matrix --------------------------------------------------------


def test_default_alignment_heads():
    heads = default_alignment_heads(4, 3)
    assert heads == list(itertools.product((2, 3), (0, 1, 2)))


def test_alignment_matrix_shape_and_normalization():
    rng = np.random.default_rng(3)
    w = rng.random((2, 1, 4, 5, 9))  # [L, B, H, Ttok, Tenc]
    m = alignment_matrix(w, medfilt_width=1)
    assert m.shape == (5, 9)
    # default heads = all heads of the top half of layers (layer 1 here);
    # with width-1 filter, rows are the mean of head matrices z-normalized
    # over the TOKEN axis (openai std_mean(dim=-2): per-frame columns)
    sel = w[1, 0]  # [H, Ttok, Tenc]
    z = (sel - sel.mean(-2, keepdims=True)) / sel.std(-2, keepdims=True)
    np.testing.assert_allclose(m, z.mean(axis=0), rtol=1e-10)
    # explicit heads
    m2 = alignment_matrix(w, alignment_heads=[(0, 1)], medfilt_width=1)
    z01 = w[0, 0, 1]
    z01 = (z01 - z01.mean(-2, keepdims=True)) / z01.std(-2, keepdims=True)
    np.testing.assert_allclose(m2, z01, rtol=1e-10)
    # frames are cropped BEFORE the statistics (openai order); with
    # token-axis stats this matters through the median filter's edge
    # padding at the crop boundary
    m3 = alignment_matrix(w, medfilt_width=1, n_frames=6)
    sel6 = w[1, 0, :, :, :6]
    z6 = (sel6 - sel6.mean(-2, keepdims=True)) / sel6.std(-2, keepdims=True)
    np.testing.assert_allclose(m3, z6.mean(axis=0), rtol=1e-10)
    assert m3.shape == (5, 6)
    m5 = alignment_matrix(w, medfilt_width=5, n_frames=6)
    m5_after = alignment_matrix(w, medfilt_width=5)[:, :6]
    assert not np.allclose(m5, m5_after)


# -- cross-weight extraction -------------------------------------------------


def test_apply_with_weights_matches_plain(setup):
    dec, params, enc_out = setup
    toks = jnp.asarray([[1, 2, 5, 7, 3]], dtype=jnp.int32)
    ref = np.asarray(dec.apply(params, toks, enc_out))
    out, w = dec.apply(params, toks, enc_out, return_cross_weights=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)
    w = np.asarray(w)
    assert w.shape == (CFG.decoder_layers, 1, CFG.n_heads, 5, 16)
    np.testing.assert_allclose(w.sum(-1), 1.0, rtol=1e-5)
    assert (w >= 0).all()


def test_apply_with_weights_respects_encoder_valid(setup):
    dec, params, enc_out = setup
    toks = jnp.asarray([[1, 2, 5]], dtype=jnp.int32)
    valid = jnp.arange(16)[None, :] < 10
    _, w = dec.apply(params, toks, enc_out, encoder_valid=valid,
                     return_cross_weights=True)
    w = np.asarray(w)
    assert np.abs(w[..., 10:]).max() < 1e-9
    np.testing.assert_allclose(w.sum(-1), 1.0, rtol=1e-5)


# -- end-to-end token/word timings ------------------------------------------


def test_token_timestamps_monotonic(setup):
    dec, params, enc_out = setup
    tokens = [1, 2, 5, 7, 9, 3]
    starts, ends = token_timestamps(dec, params, tokens, enc_out)
    assert starts.shape == ends.shape == (len(tokens),)
    assert (np.diff(starts) >= 0).all()
    assert (ends >= starts).all()
    assert (ends[:-1] == starts[1:]).all()
    assert ends[-1] <= 16 * SECONDS_PER_FRAME + 1e-9


def test_token_timestamps_n_frames_caps_times(setup):
    dec, params, enc_out = setup
    tokens = [1, 2, 5, 7, 3]
    starts, ends = token_timestamps(dec, params, tokens, enc_out, n_frames=8)
    assert ends[-1] <= 8 * SECONDS_PER_FRAME + 1e-9


def test_word_timestamps_grouping(setup):
    dec, params, enc_out = setup
    tokens = [1, 2, 10, 11, 12, 13, 3]  # 2 prefix, 4 text, EOS

    def group_fn(text):
        assert text == [10, 11, 12, 13, 3]
        return [("hello", 2), ("world", 2)]

    words = word_timestamps(dec, params, tokens, enc_out, group_fn,
                            n_prefix=2)
    assert [w.word for w in words] == ["hello", "world"]
    assert words[0].tokens == [10, 11]
    assert words[1].tokens == [12, 13]
    assert words[0].start <= words[0].end <= words[1].start + 1e-9 \
        or words[0].end <= words[1].end
    # word starts come from the text-sliced DTW (prefix rows excluded from
    # the path, openai matrix[len(sot_sequence):] slice)
    starts, _ = token_timestamps(dec, params, tokens, enc_out, n_prefix=2)
    assert words[0].start == pytest.approx(float(starts[0]))
    assert isinstance(words[0], WordTiming)


def test_token_timestamps_prefix_rows_excluded(setup):
    """n_prefix/n_drop_last slice the DTW to the text rows: result length
    shrinks accordingly and the text path starts at frame 0."""
    dec, params, enc_out = setup
    tokens = [1, 2, 10, 11, 3]
    starts, ends = token_timestamps(dec, params, tokens, enc_out,
                                    n_prefix=2, n_drop_last=1)
    assert starts.shape == ends.shape == (2,)
    assert starts[0] == 0.0  # DTW paths start at (0, 0)
    assert (ends >= starts).all()


def test_native_dtw_matches_numpy():
    """The C++ DP (native/avsr_io.cpp avsr_dtw) must be path-identical to
    the numpy fallback — including tie-breaking (diagonal preferred)."""
    from mocov2_whisper_flamingo_tpu.datamodule import native
    from mocov2_whisper_flamingo_tpu.decode.timestamps import _dtw_numpy

    if native.load_library() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    cases = [rng.standard_normal((n, m)) for n, m in
             ((1, 1), (1, 9), (9, 1), (12, 30), (40, 25))]
    cases.append(np.zeros((6, 6)))          # all ties -> pure tie-break path
    cases.append(np.tile(rng.standard_normal(8), (5, 1)))  # row ties
    for cost in cases:
        got = native.dtw(cost)
        assert got is not None
        ref = _dtw_numpy(cost)
        np.testing.assert_array_equal(got[0], ref[0])
        np.testing.assert_array_equal(got[1], ref[1])


# -- word splitting & punctuation merge (openai tokenizer.py/timing.py) ------


def test_split_tokens_on_unicode_multibyte():
    """Bytes of one accented character stay in one piece; decoding never
    leaks U+FFFD for valid text (openai split_tokens_on_unicode)."""
    from mocov2_whisper_flamingo_tpu.decode.timestamps import (
        split_tokens_on_unicode)
    from mocov2_whisper_flamingo_tpu.utils.tokenizer import ByteTokenizer

    tok = ByteTokenizer()
    ids = tok.encode("chào", add_special_tokens=False)
    pieces = split_tokens_on_unicode(tok, ids)
    assert "".join(p for p, _ in pieces) == "chào"
    assert all("�" not in p for p, _ in pieces)
    # the two UTF-8 bytes of 'à' ride together
    assert any(len(t) == 2 for _, t in pieces)
    assert sum(len(t) for _, t in pieces) == len(ids)


def test_split_tokens_on_unicode_genuine_replacement_char():
    """Text that genuinely contains U+FFFD terminates — openai's
    decoded_full offset check fires instead of stalling the emitter — and
    every token lands in some piece (our tail handling; openai drops
    unconsumed tokens). The replacement char itself may split imperfectly:
    a truncated multi-byte prefix is indistinguishable from a genuine
    U+FFFD at that offset, the same ambiguity openai has."""
    from mocov2_whisper_flamingo_tpu.decode.timestamps import (
        split_tokens_on_unicode)
    from mocov2_whisper_flamingo_tpu.utils.tokenizer import ByteTokenizer

    tok = ByteTokenizer()
    ids = tok.encode("a�b", add_special_tokens=False)
    pieces = split_tokens_on_unicode(tok, ids)
    assert sum(len(t) for _, t in pieces) == len(ids)
    joined = "".join(p for p, _ in pieces)
    assert joined.startswith("a") and joined.endswith("b")
    assert "�" in joined


def test_split_tokens_on_spaces_punctuation_starts_word():
    """A punctuation piece opens its own word even without a leading space
    (openai split_tokens_on_spaces), so merge_punctuations can re-attach it."""
    from mocov2_whisper_flamingo_tpu.decode.timestamps import (
        split_tokens_on_spaces)
    from mocov2_whisper_flamingo_tpu.utils.tokenizer import ByteTokenizer

    tok = ByteTokenizer()
    ids = tok.encode("hi, em", add_special_tokens=False)
    words = split_tokens_on_spaces(tok, ids)
    assert [w for w, _ in words] == ["hi", ",", " em"]


def test_merge_punctuations_openai_semantics():
    """Opening marks fold into the FOLLOWING word, closing marks into the
    PRECEDING one; survivors keep their own timings; inputs unmutated
    (openai timing.py merge_punctuations)."""
    from mocov2_whisper_flamingo_tpu.decode.timestamps import (
        merge_punctuations)

    words = [WordTiming(' "', 0.0, 1.0, [1]), WordTiming("hi", 1.0, 2.0, [2]),
             WordTiming(",", 2.0, 3.0, [3]),
             WordTiming(" there", 3.0, 4.0, [4]),
             WordTiming("!", 4.0, 5.0, [5])]
    merged = merge_punctuations(words)
    assert [w.word for w in merged] == [' "hi,', " there!"]
    assert merged[0].tokens == [1, 2, 3]
    assert merged[1].tokens == [4, 5]
    assert (merged[0].start, merged[0].end) == (1.0, 2.0)
    assert (merged[1].start, merged[1].end) == (3.0, 4.0)
    assert words[1].word == "hi" and words[1].tokens == [2]


def test_word_timestamps_merges_punctuation(setup):
    """End-to-end: a lone punctuation group disappears into its neighbor
    by default and stays separate with merging disabled."""
    dec, params, enc_out = setup
    tokens = [1, 10, 11, 12, 3]  # 1 prefix, 3 text, EOS

    def group_fn(text):
        return [("hi", 1), (",", 1), (" em", 1)]

    words = word_timestamps(dec, params, tokens, enc_out, group_fn,
                            n_prefix=1)
    assert [w.word for w in words] == ["hi,", " em"]
    assert words[0].tokens == [10, 11]
    raw = word_timestamps(dec, params, tokens, enc_out, group_fn,
                          n_prefix=1, prepend_punctuations=None,
                          append_punctuations=None)
    assert [w.word for w in raw] == ["hi", ",", " em"]


def test_token_timestamps_pad_bucketing_bit_identical(setup):
    """pad_tokens_to runs the forward at a bucketed length but crops the
    pad rows before the normalization statistics — times must match the
    unpadded forward exactly (causal attention leaves real rows alone)."""
    dec, params, enc_out = setup
    tokens = [1, 2, 10, 11, 12, 3]
    kw = dict(n_prefix=2, n_drop_last=1)
    a_starts, a_ends = token_timestamps(dec, params, tokens, enc_out, **kw)
    b_starts, b_ends = token_timestamps(dec, params, tokens, enc_out, **kw,
                                        pad_tokens_to=16, pad_id=3)
    np.testing.assert_array_equal(a_starts, b_starts)
    np.testing.assert_array_equal(a_ends, b_ends)
