"""Word-level timestamps via cross-attention DTW alignment.

The reference has no notion of timestamps (it argmaxes a linear head,
reference: train.py:130-141), but its backbone is HF Whisper (reference:
models/av_net.py:22), and every production Whisper stack offers
word timestamps — openai ``transcribe(word_timestamps=True)`` /
HF ``generate(return_token_timestamps=True)`` — by dynamic-time-warping the
decoder's cross-attention against the audio frames (openai
whisper/timing.py ``find_alignment``). Implemented here with the same
pipeline:

1. one teacher-forced decoder forward over the FINAL token sequence that
   also returns the per-layer cross-attention probabilities
   (``WhisperDecoder.apply(..., return_cross_weights=True)`` — a single
   compiled dispatch; the [L, B, H, Ttok, Tenc] stack is the only output
   that leaves the device);
2. select alignment heads (a model-specific ``(layer, head)`` list when
   known, else openai's fallback: all heads of the top half of layers);
3. per head: crop to the real-audio frames, z-normalize over the TOKEN
   axis (per-frame-column statistics, openai ``std_mean(dim=-2)``),
   median-filter along time (width 7), average heads -> one
   [Ttok, Tenc] alignment matrix, sliced to the text rows;
4. monotonic DTW over ``-matrix`` (moves: down, right, diagonal) on the
   host — the matrix is tiny (<=448 x 1500) and the DP is inherently
   sequential, so numpy is the right tool, not the MXU;
5. token times = 0.02 s per encoder frame at the path's jumps; words are
   formed by a caller-supplied grouping (tokenizer-aware) and take
   start/end from their first/last token.

TPU note: steps 1 is the only device work and keeps all heavy math in one
jit; steps 2-3 are cheap vector ops done in numpy on the host alongside
the DP (moving them on-device would save nothing and cost a dispatch).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

# Whisper's encoder emits one frame per 20 ms (2x conv stride over 10 ms
# hops); openai TOKENS_PER_SECOND = 50.
SECONDS_PER_FRAME = 0.02

# openai transcribe defaults (whisper/transcribe.py cli):
# punctuation marks merged into the following / preceding word.
PREPEND_PUNCTUATIONS = "\"'\u201c\u00bf([{-"
APPEND_PUNCTUATIONS = "\"'.\u3002,\uff0c!\uff01?\uff1f:\uff1a\u201d)]}\u3001"

# string.punctuation + the CJK/quote marks openai's word splitter treats
# as word-starting punctuation (tokenizer.py split_tokens_on_spaces uses
# `subword.strip() in string.punctuation`; the wider set keeps the merge
# sets above consistent).
_PUNCT_CHARS = set("!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~") \
    | set(PREPEND_PUNCTUATIONS) | set(APPEND_PUNCTUATIONS)


@dataclasses.dataclass
class WordTiming:
    word: str
    start: float
    end: float
    tokens: list[int]


def _decode(tokenizer, ids: list[int]) -> str:
    """Decode with U+FFFD replacement on invalid/partial UTF-8 when the
    tokenizer supports it (ByteTokenizer ``errors=``; HF byte-level decode
    already replaces)."""
    try:
        return tokenizer.decode(ids, errors="replace")
    except TypeError:
        return tokenizer.decode(ids)


def split_tokens_on_unicode(tokenizer, tokens) -> list[tuple[str, list[int]]]:
    """Group tokens into minimal decodable units (openai
    whisper/tokenizer.py ``split_tokens_on_unicode``).

    Byte-level BPE can split one multi-byte UTF-8 character (every accented
    Vietnamese letter) across tokens; decoding a lone piece then yields
    U+FFFD. Accumulate tokens until the decoded text carries no replacement
    character — unless the full decode genuinely contains U+FFFD at that
    offset (openai's ``decoded_full[...] == replacement_char`` check)."""
    tokens = [int(t) for t in tokens]
    decoded_full = _decode(tokenizer, tokens)
    replacement = "\ufffd"
    out: list[tuple[str, list[int]]] = []
    current: list[int] = []
    offset = 0
    for tok in tokens:
        current.append(tok)
        decoded = _decode(tokenizer, current)
        if (replacement not in decoded
                or (offset + decoded.index(replacement) < len(decoded_full)
                    and decoded_full[offset + decoded.index(replacement)]
                    == replacement)):
            out.append((decoded, current))
            current = []
            offset += len(decoded)
    if current:  # undecodable tail (truncated sequence): keep the tokens
        out.append((_decode(tokenizer, current), current))
    return out


def split_tokens_on_spaces(tokenizer, tokens) -> list[tuple[str, list[int]]]:
    """Unicode-safe word split for space-delimited scripts (openai
    whisper/tokenizer.py ``split_tokens_on_spaces``): a new word starts at
    a leading space or a punctuation-only piece; everything else glues onto
    the previous word. Words KEEP their leading space (openai convention —
    display writers strip; merge_punctuations keys on it)."""
    words: list[tuple[str, list[int]]] = []
    for subword, sub_tokens in split_tokens_on_unicode(tokenizer, tokens):
        stripped = subword.strip()
        punctuation = bool(stripped) and all(
            c in _PUNCT_CHARS for c in stripped)
        if subword.startswith(" ") or punctuation or not words:
            words.append((subword, list(sub_tokens)))
        else:
            prev_w, prev_t = words[-1]
            words[-1] = (prev_w + subword, prev_t + list(sub_tokens))
    return words


def merge_punctuations(
    words: list[WordTiming],
    prepended: str = PREPEND_PUNCTUATIONS,
    appended: str = APPEND_PUNCTUATIONS,
) -> list[WordTiming]:
    """openai whisper/timing.py ``merge_punctuations``: a lone
    space-prefixed opening mark merges into the FOLLOWING word (which keeps
    its own start/end); a closing mark merges into the PRECEDING word
    (ditto). Emptied entries are dropped. Returns a new list; inputs are
    not mutated."""
    merged = [dataclasses.replace(w, tokens=list(w.tokens)) for w in words]
    # prepended: scan backwards, folding opening marks forward
    i, j = len(merged) - 2, len(merged) - 1
    while i >= 0:
        prev, foll = merged[i], merged[j]
        if prev.word.startswith(" ") and prev.word.strip() in prepended:
            foll.word = prev.word + foll.word
            foll.tokens = prev.tokens + foll.tokens
            prev.word, prev.tokens = "", []
        else:
            j = i
        i -= 1
    # appended: scan forwards, folding closing marks backward
    i, j = 0, 1
    while j < len(merged):
        prev, foll = merged[i], merged[j]
        if not prev.word.endswith(" ") and foll.word in appended:
            prev.word = prev.word + foll.word
            prev.tokens = prev.tokens + foll.tokens
            foll.word, foll.tokens = "", []
        else:
            i = j
        j += 1
    return [w for w in merged if w.word]


def median_filter(x: np.ndarray, width: int = 7) -> np.ndarray:
    """Median filter along the last axis with edge padding (openai
    timing.py ``median_filter`` semantics; width must be odd)."""
    if width <= 1:
        return x
    if width % 2 == 0:
        raise ValueError("median_filter width must be odd")
    half = width // 2
    padded = np.concatenate(
        [x[..., :1].repeat(half, axis=-1), x,
         x[..., -1:].repeat(half, axis=-1)], axis=-1)
    windows = np.lib.stride_tricks.sliding_window_view(padded, width, axis=-1)
    return np.median(windows, axis=-1)


def dtw(cost: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Monotonic DTW over a [N, M] cost matrix; returns the aligned
    (text_indices, time_indices) path, forward order (openai timing.py
    ``dtw_cpu``: moves are (i-1,j), (i,j-1), (i-1,j-1); backtrace prefers
    the diagonal; the path starts at (0,0) and ends at (N-1, M-1)).

    Dispatches to the native C++ DP (native/avsr_io.cpp ``avsr_dtw``,
    ~100x the Python loop at the 448x1500 Whisper shape — openai uses a
    numba/triton kernel for the same reason); ``_dtw_numpy`` is the
    always-available fallback with identical semantics."""
    from mocov2_whisper_flamingo_tpu.datamodule import native

    got = native.dtw(cost)
    if got is not None:
        return got
    return _dtw_numpy(cost)


def _dtw_numpy(cost: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    n, m = cost.shape
    acc = np.full((n + 1, m + 1), np.inf, dtype=np.float64)
    trace = np.zeros((n + 1, m + 1), dtype=np.int8)
    acc[0, 0] = 0.0
    for i in range(1, n + 1):
        row_prev = acc[i - 1]
        row = acc[i]
        c = cost[i - 1]
        for j in range(1, m + 1):
            c0 = row_prev[j - 1]   # diagonal
            c1 = row_prev[j]       # up (advance text)
            c2 = row[j - 1]        # left (advance time)
            best = c0
            t = 0
            if c1 < best:
                best, t = c1, 1
            if c2 < best:
                best, t = c2, 2
            row[j] = c[j - 1] + best
            trace[i, j] = t
    i, j = n, m
    text_idx, time_idx = [], []
    while i > 0 or j > 0:
        text_idx.append(i - 1)
        time_idx.append(j - 1)
        t = trace[i, j]
        if i > 0 and j > 0 and t == 0:
            i, j = i - 1, j - 1
        elif i > 0 and (j == 0 or t == 1):
            i -= 1
        else:
            j -= 1
    return np.array(text_idx[::-1]), np.array(time_idx[::-1])


def default_alignment_heads(n_layers: int, n_heads: int) -> list[tuple[int, int]]:
    """openai fallback when no model-specific head list is known: every
    head of the top half of the decoder layers (timing.py
    ``find_alignment``'s default via ``model.alignment_heads``)."""
    return [(l, h) for l in range(n_layers // 2, n_layers)
            for h in range(n_heads)]


def alignment_matrix(
    cross_weights: np.ndarray,
    alignment_heads: list[tuple[int, int]] | None = None,
    medfilt_width: int = 7,
    example: int = 0,
    n_frames: int | None = None,
) -> np.ndarray:
    """[L, B, H, Ttok, Tenc] cross-attention stack -> [Ttok, Tenc']
    alignment matrix, openai timing.py ``find_alignment`` order: pick
    heads, CROP to the ``n_frames`` that carry real audio (before any
    statistics — padded frames must not contaminate them), z-normalize
    each head over the TOKEN axis (``std_mean(dim=-2)``: per-frame-column
    statistics, population std), median-filter along time, average heads."""
    w = np.asarray(cross_weights, dtype=np.float64)
    n_layers, _, n_heads = w.shape[:3]
    heads = alignment_heads or default_alignment_heads(n_layers, n_heads)
    sel = np.stack([w[l, example, h] for l, h in heads])  # [A, Ttok, Tenc]
    if n_frames is not None:
        sel = sel[:, :, :n_frames]
    std = sel.std(axis=-2, keepdims=True)
    sel = (sel - sel.mean(axis=-2, keepdims=True)) / np.maximum(std, 1e-10)
    sel = median_filter(sel, medfilt_width)
    return sel.mean(axis=0)


def token_timestamps(
    decoder,
    params: dict,
    tokens,
    encoder_out: jnp.ndarray,
    n_frames: int | None = None,
    alignment_heads: list[tuple[int, int]] | None = None,
    medfilt_width: int = 7,
    encoder_valid: jnp.ndarray | None = None,
    n_prefix: int = 0,
    n_drop_last: int = 0,
    apply_fn=None,
    pad_tokens_to: int | None = None,
    pad_id: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-token (start, end) times in seconds for ONE example.

    ``apply_fn(params, tokens, encoder_out) -> (logits, cross_weights)``:
    optional replacement for the eager ``decoder.apply`` — pass a jitted
    wrapper (with ``return_cross_weights=True`` and any ``encoder_valid``
    baked in) so the teacher-forced alignment forward is ONE compiled
    dispatch instead of hundreds of eager ops per call.

    ``pad_tokens_to``: run the forward at this (bucketed) length by
    appending ``pad_id`` rows, bounding jit recompiles to one per bucket.
    The pad rows are cropped from the cross-weight stack BEFORE the
    normalization statistics, so results are bit-identical to the unpadded
    forward (causal self-attention keeps real rows unaffected by trailing
    pads).

    ``tokens``: the full decoded sequence (prefix + text + EOS) as a flat
    int list/array; ``encoder_out``: [1, Tenc, D]. ``n_frames`` restricts
    the alignment to the leading frames that carry real audio (cropped
    BEFORE the normalization statistics, openai order). The DTW runs over
    ``tokens[n_prefix : len - n_drop_last]`` only (openai slices the
    matrix to ``sot_sequence.. -1``: forced prefix rows and the EOT row
    must not consume audio frames on the path). Returns (starts, ends),
    each of length ``len(tokens) - n_prefix - n_drop_last``."""
    tokens = [int(t) for t in tokens]
    n_real = len(tokens)
    if pad_tokens_to is not None and pad_tokens_to > n_real:
        tokens = tokens + [pad_id] * (pad_tokens_to - n_real)
    toks = jnp.asarray(tokens, dtype=jnp.int32)[None, :]
    if apply_fn is not None:
        _, w = apply_fn(params, toks, encoder_out)
    else:
        _, w = decoder.apply(params, toks, encoder_out,
                             encoder_valid=encoder_valid,
                             return_cross_weights=True)
    w = np.asarray(w)[:, :, :, :n_real, :]  # crop pad rows pre-statistics
    matrix = alignment_matrix(w, alignment_heads, medfilt_width,
                              n_frames=n_frames)
    end = matrix.shape[0] - n_drop_last
    matrix = matrix[n_prefix:end]
    # Each row must attend somewhere: DTW over the negated alignment score.
    text_idx, time_idx = dtw(-matrix)
    n_tok = matrix.shape[0]
    # jump j: first time index where the path reaches token j
    jumps = np.zeros(n_tok, dtype=np.int64)
    seen = np.zeros(n_tok, dtype=bool)
    for ti, fi in zip(text_idx, time_idx):
        if not seen[ti]:
            jumps[ti] = fi
            seen[ti] = True
    starts = jumps * SECONDS_PER_FRAME
    ends = np.empty_like(starts, dtype=np.float64)
    ends[:-1] = starts[1:]
    last_frame = time_idx[-1] + 1 if len(time_idx) else jumps[-1] + 1
    ends[-1] = last_frame * SECONDS_PER_FRAME
    return starts.astype(np.float64), ends


def word_timestamps(
    decoder,
    params: dict,
    tokens,
    encoder_out: jnp.ndarray,
    group_fn,
    n_prefix: int = 0,
    n_text: int | None = None,
    n_frames: int | None = None,
    alignment_heads: list[tuple[int, int]] | None = None,
    medfilt_width: int = 7,
    encoder_valid: jnp.ndarray | None = None,
    prepend_punctuations: str | None = PREPEND_PUNCTUATIONS,
    append_punctuations: str | None = APPEND_PUNCTUATIONS,
    apply_fn=None,
    pad_tokens_to: int | None = None,
    pad_id: int = 0,
) -> list[WordTiming]:
    """Word-level timings: align all tokens, then group the TEXT tokens
    (``tokens[n_prefix : n_prefix + n_text]``; ``n_text=None`` takes the
    whole tail — exclude a trailing EOS by bounding it) into words.

    ``group_fn(text_token_ids) -> list[(word_str, token_count)]`` is the
    tokenizer-aware split (``split_tokens_on_spaces`` for space-delimited
    scripts); each word takes start from its first token and end from its
    last. Lone punctuation words are then folded into their neighbors
    (``merge_punctuations``, openai transcribe defaults; pass ``None`` to
    keep them separate)."""
    tokens = [int(t) for t in tokens]
    text = tokens[n_prefix:] if n_text is None \
        else tokens[n_prefix:n_prefix + n_text]
    if not text:
        return []
    n_drop_last = len(tokens) - n_prefix - len(text)
    starts, ends = token_timestamps(
        decoder, params, tokens, encoder_out, n_frames=n_frames,
        alignment_heads=alignment_heads, medfilt_width=medfilt_width,
        encoder_valid=encoder_valid, n_prefix=n_prefix,
        n_drop_last=n_drop_last, apply_fn=apply_fn,
        pad_tokens_to=pad_tokens_to, pad_id=pad_id)
    out: list[WordTiming] = []
    pos = 0  # index into the text range (= into starts/ends)
    for word, count in group_fn(text):
        if count <= 0:
            continue
        span = text[pos:pos + count]
        out.append(WordTiming(
            word=word, start=float(starts[pos]),
            end=float(ends[min(pos + count - 1, len(text) - 1)]),
            tokens=span))
        pos += count
    if prepend_punctuations is not None or append_punctuations is not None:
        out = merge_punctuations(out, prepend_punctuations or "",
                                 append_punctuations or "")
    return out
