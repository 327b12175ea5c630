"""KV-cached beam search under jit, with hypothesis banking.

Hard part #2 from SURVEY.md §7: the whole search is compiled — static
[B, K, L] shapes, beams flattened into the batch for the decoder step, and
EOS masking instead of early Python exits. The reference has no beam search
to mirror (reference: train.py:130-141 argmaxes a linear head; its
``beam_width`` config key is dead, quirk Q4), so the semantics implemented
here are the *standard* seq2seq beam semantics (HF ``GenerationMixin``
beam search, which is also how OpenAI Whisper decodes), verified token-exact
against HF ``generate`` in tests/test_decode_oracle.py:

- each step expands the K live beams to the top **2K** candidates;
- a candidate whose new token is EOS is **banked** into a K-slot hypothesis
  pool (only candidates ranked < K may bank), scored by
  ``sum_logprob / gen_len**length_penalty`` with gen_len counting the EOS;
- the K best non-finished candidates continue as live beams — finished
  hypotheses do NOT occupy live slots;
- at the last step every live candidate is force-banked (the HF
  max-length stopping criterion / ``finalize`` analog);
- ``early_stopping=True`` freezes the pool once it holds K hypotheses;
  ``early_stopping=False`` (default) stops banking once the best
  attainable live score can no longer beat the worst pooled score (HF's
  heuristic, transformers generation/utils.py ``_check_early_stop_heuristic``).

TPU design notes (each measured — see docs/DESIGN.md):
- the decode step runs on [B*K] rows so the MXU sees one batched matmul per
  projection rather than K small ones;
- the loop is a fixed-trip-count ``lax.scan``; ``while_loop``/``cond``
  serialize with ~200 ms/step host round-trips on remote-execution backends;
  once a batch stops banking the extra steps are masked no-ops;
- the SELF caches are **append-only**: instead of physically reordering
  them each step, a one-hot ancestry tensor is folded into the attention
  (models/whisper.py ``_ancestry_attention``) — 2.76 -> 1.01 ms/step,
  because every physical reorder (however expressed) forced a ~50 us
  relayout copy per cache leaf of tile-padded [.., 12, 64] trailing dims;
- where LARGE physical gathers remain (``use_ancestry=False`` cache
  fallback, streaming chunk commit), they are one-hot matmuls, not
  ``take_along_axis`` — the general gather lowers ~100x slower on large
  KV caches (small [B, K, L] token-buffer gathers stay
  ``take_along_axis``: they are tiny and the one-hot form measured no
  better);
- cross K/V rows are beam-invariant by construction (computed from the
  un-repeated encoder output); the cross cache is computed once per
  utterance and never touched by beam bookkeeping.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

NEG_INF = -1e30


@dataclasses.dataclass
class BeamResult:
    sequences: jnp.ndarray  # [B, K, L] token ids, best hypothesis first
    scores: jnp.ndarray     # [B, K] length-normalized log probs


def default_read_windows(max_len: int,
                         batch: int | None = None) -> tuple[int, ...] | None:
    """Default windowed-prefix ladder, batch-aware.

    Wide batches (``batch >= 16``): fifths of ``max_len`` rounded to 8 —
    measured on v5e at the B=16 bucket (max_len 160): (32, 64, 96, 128,
    160) took the decode from 10.24 -> 6.25 ms/step (thirds: 7.71), tokens
    bit-identical (BASELINE.md round 4). Narrow batches (default): thirds
    floored to 16 — at B=4 the fifths ladder's extra segment concats cost
    more than they save (1.27 -> 1.49 ms/step measured round 5) while the
    thirds ladder (48, 96, 160) wins 1.277 -> 1.233 (-3.4%), tokens exact.
    None below 48 tokens: at short budgets the segments would be noise."""
    if max_len < 48:
        return None
    if batch is not None and batch >= 16:
        n, q = 5, 8
        rung = lambda i: int(round(max_len * i / n / q)) * q
    else:
        n, q = 3, 16
        rung = lambda i: int(max_len * i / n / q) * q
    rungs = []
    for i in range(1, n):
        w = rung(i)
        if w >= 16 and (not rungs or w > rungs[-1]) and w < max_len:
            rungs.append(w)
    return tuple(rungs) + (max_len,) if rungs else None


def _gather_beams(tree, beam_idx: jnp.ndarray, b: int, k: int):
    """Reorder the leading [B*K] axis of every leaf by per-batch beam index
    [B, K_new] (values in [0, K)). Used by the ``use_ancestry=False``
    fallback search (the default ancestry path never physically reorders,
    and the streaming chunk commit has its own einsum over the ancestry
    rows — decode/streaming.py).

    Implemented as a one-hot matmul (perm [B, K_new, K] against the beam
    axis, trailing dims flattened into the dot — the measured-faster form
    for the batched program: 2.74 vs 3.10 ms/step at cache length 164)
    rather than take_along_axis: general gathers lower poorly on TPU for
    large operands (measured ~200 ms/step on the KV caches), while the
    small permutation contraction is MXU work XLA handles at full speed.
    """
    k_new = beam_idx.shape[1]
    perm = (beam_idx[..., None] == jnp.arange(k)[None, None, :])  # [B, K_new, K]

    def gather(leaf):
        shaped = leaf.reshape(b, k, -1)
        p = perm.astype(leaf.dtype if jnp.issubdtype(leaf.dtype, jnp.floating)
                        else jnp.float32)
        out = jax.lax.dot_general(
            p, shaped.astype(p.dtype), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=p.dtype)  # [B, K_new, K*F]
        return out.astype(leaf.dtype).reshape(b * k_new, *leaf.shape[1:])

    return jax.tree.map(gather, tree)


def beam_search(
    decoder,
    params: dict,
    encoder_out: jnp.ndarray,
    prefix_ids,
    beam_size: int = 5,
    max_len: int = 224,
    eos_id: int = 0,
    length_penalty: float = 1.0,
    encoder_valid: jnp.ndarray | None = None,
    early_stopping: bool = False,
    use_ancestry: bool = True,
    logit_rules=None,
    renorm_after_rules: bool = False,
    cache_quant: str | None = None,
    read_windows=None,
    cache_layout: str = "rows",
    _prefix_in_window: bool = False,
) -> BeamResult:
    """Batched beam search; returns the K best finished hypotheses per
    example, best first. EOS-terminated hypotheses include their EOS; the
    token buffer is EOS-filled beyond each sequence's end.

    ``use_ancestry`` (default, measured faster): the self caches are
    append-only and a one-hot ancestry tensor is folded into the attention
    (models/whisper.py ``_ancestry_attention``) instead of physically
    reordering every cache leaf each step — bit-identical results. False
    falls back to the classic cache-reordering search.

    ``logit_rules``: optional ``decode.logit_rules.LogitRules`` — HF-default
    Whisper decode semantics (suppress/begin-suppress/forced tokens,
    timestamp grammar), applied to the log-softmaxed scores each step
    exactly where HF's logits processors run in its beam loop. HF never
    renormalizes after its processors, so accumulated scores are deflated
    wherever a rule masked probability mass; ``renorm_after_rules=True``
    re-log_softmaxes after the rules instead (openai's convention — its
    decoder applies logit filters to raw logits and normalizes AFTER), so
    scores are true logprobs over the allowed set. The per-row shift can
    change cross-beam ranking where rules masked different mass per beam —
    that IS openai's beam semantics; keep the default for HF token-exact
    parity, use True when scores feed quality gates
    (decode_with_fallback).

    ``cache_quant="int8"``: int8 KV caches with folded scales
    (models/whisper.py ``init_cache``) — halves per-step cache HBM traffic
    for bandwidth-bound wide buckets at ~0.4% per-row quantization error.

    ``read_windows``: ascending static cache-window ladder ending at
    ``max_len`` (e.g. ``(48, 96, 160)``) — the windowed-prefix scan. The
    fixed-shape scan otherwise touches the FULL max_len-sized self cache
    and ancestry tensor every step even when only ``i`` positions are
    live; profiling the B=16 bucket showed the step cost scaling with the
    ALLOCATED length (2.7 ms/step at L=36 vs 8.7 at L=160), so the decode
    runs as consecutive scan segments, each attending a static prefix
    slice sized to its ladder rung. One jit, no extra host round trips;
    segment boundaries cost one cache-window concat each. Positions beyond
    ``i`` contribute exactly zero probability either way, so results are
    identical to the unwindowed scan. Requires ``use_ancestry``.

    ``cache_layout="bhjtd"``: einsum-native [B, H, K, T, Dh] self caches
    (models/whisper.py ``init_cache``) — the ancestry einsums' batch dims
    lead, so the per-step cache write and the score dot agree on the
    physical layout; measured faster at the wide serving buckets where the
    rows layout pays per-step relayout copies (B=16 on v5e: 10.24 -> 7.52
    ms/step unwindowed, 6.25 -> 5.34 with the fifths ladder). MEASURED
    token-exact vs "rows": the algebra is the same but the prefix pass and
    the differently-laid-out einsums may reduce in different order, so
    exactness is verified empirically — tests/test_cache_layout.py and the
    ``tokens_match`` field of tools/cache_layout_ab.py (true in every
    on-chip run). Requires ``use_ancestry``."""
    b = encoder_out.shape[0]
    k = beam_size
    k2 = 2 * k
    prefix = jnp.asarray(prefix_ids, dtype=jnp.int32)
    n_prefix = int(prefix.shape[0])
    lp = float(length_penalty)
    if cache_layout not in ("rows", "bhjtd"):
        raise ValueError(f"unknown cache_layout {cache_layout!r}; "
                         "expected 'rows' or 'bhjtd'")
    if cache_layout != "rows" and not use_ancestry:
        raise ValueError(f"cache_layout={cache_layout!r} requires "
                         "use_ancestry=True (the cache-reorder fallback "
                         "reads row-aligned caches)")

    # Self caches get B*K rows; the cross K/V stays B-major (beam rows would
    # be identical copies) — each example's cross cache is computed and read
    # once per step regardless of beam width, and never reordered.
    enc_valid = encoder_valid
    cache = decoder.init_cache(params, encoder_out, max_len=max_len, beam_groups=k,
                               quant=cache_quant, layout=cache_layout)

    run_tokens = jnp.full((b, k, max_len), eos_id, dtype=jnp.int32)
    run_tokens = run_tokens.at[:, :, :n_prefix].set(prefix[None, None, :])
    # Live beam 0 active, others at -inf so the first expansion draws K
    # distinct continuations of the single prefix.
    run_scores = jnp.tile(jnp.array([0.0] + [NEG_INF] * (k - 1))[None], (b, 1))
    pool_tokens = jnp.full((b, k, max_len), eos_id, dtype=jnp.int32)
    pool_scores = jnp.full((b, k), NEG_INF)
    heur_ok = jnp.ones((b,), bool)  # "can the pool still improve?"
    # ancestry[b, n, j, t] = 1 iff beam n's position-t KV lives in physical
    # cache row j. Starts as identity (rows write their own slots); future
    # positions stay identity because each step's writer row IS the beam
    # index at write time.
    eye_k = jnp.eye(k, dtype=jnp.float32)
    anc = jnp.broadcast_to(eye_k[None, :, :, None], (b, k, k, max_len)) + 0.0 \
        if use_ancestry else None

    # Teacher-force the prefix through the cache (all beams identical here).
    # The bhjtd layout is readable only through the ancestry path; identity
    # ancestry IS row-aligned attention (each row reads its own slots), so
    # passing it here is exact. The rows layout keeps the cheaper masked
    # single-row attention. (Cost note: prefix steps attend the cache view
    # they are given — the full cache by default; n_prefix is ~4 so the
    # max_len-regime prefix cost is ~0.09 ms/step amortized at B=16, and
    # the rung-sliced alternative measured WORSE — see the
    # ``_prefix_in_window`` note in the windowed branch below.)
    def run_prefix(cache_view, anc_view):
        p_anc = anc_view if cache_layout != "rows" else None

        def prefix_step(carry, i):
            cur = jnp.broadcast_to(prefix[i], (b * k, 1)).astype(jnp.int32)
            _, carry = decoder.decode_step(params, cur, carry, i,
                                           encoder_valid=enc_valid,
                                           ancestry=p_anc)
            return carry, None

        if n_prefix > 1:
            cache_view, _ = jax.lax.scan(prefix_step, cache_view,
                                         jnp.arange(n_prefix - 1))
        return cache_view

    def body(state, _):
        (i, run_tokens, run_scores, pool_tokens, pool_scores, heur_ok,
         cache, anc) = state
        cur = jax.lax.dynamic_slice_in_dim(
            run_tokens.reshape(b * k, max_len), i, 1, axis=1)
        logits, cache = decoder.decode_step(params, cur, cache, i,
                                            encoder_valid=enc_valid,
                                            ancestry=anc)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        if logit_rules is not None:
            logp = logit_rules(logp, run_tokens.reshape(b * k, max_len),
                               i + 1, n_prefix)
            if renorm_after_rules:
                logp = jax.nn.log_softmax(logp, axis=-1)
        # Two-stage expansion: per-beam top-2K over the vocab, then top-2K
        # over the K*2K union. Every global top-2K candidate is inside its
        # own beam's top-2K, so this is exact — and it avoids flattening
        # [B, K, V] to [B, K*V], which forced two physical relayout copies
        # of the ~4 MB padded-lane score tensor per step (round-2 HLO).
        # (top_k stays rank-2: the batched rank-3 form lowers to a full
        # sort on TPU — measured 1.6 ms/step — while rank-2 hits the
        # partial-selection TopK path.)
        s1, t1 = jax.lax.top_k(logp, k2)  # [B*K, 2K]
        s1 = s1.reshape(b, k, k2)
        t1 = t1.reshape(b, k, k2)
        total1 = run_scores[..., None] + s1
        s2k, flat = jax.lax.top_k(total1.reshape(b, k * k2), k2)  # [B, 2K]
        beam2k = flat // k2
        tok2k = jnp.take_along_axis(t1.reshape(b, k * k2), flat, axis=1
                                    ).astype(jnp.int32)
        # A candidate is finished when it just emitted EOS, or when this step
        # fills the last buffer slot (max-length criterion: force-bank all).
        hits = (tok2k == eos_id) | (i + 2 >= max_len)

        cand_tokens = jnp.take_along_axis(run_tokens, beam2k[..., None], axis=1)
        cand_tokens = jax.lax.dynamic_update_slice(
            cand_tokens, tok2k[..., None], (0, 0, i + 1))

        # ---- bank finished candidates into the hypothesis pool ----
        gen_len = (i + 2 - n_prefix).astype(jnp.float32)
        bank = s2k / jnp.power(gen_len, lp)
        bank_ok = hits & (jnp.arange(k2) < k)[None, :]  # only top-K ranks bank
        pool_full = jnp.all(pool_scores > NEG_INF / 2, axis=-1)
        if early_stopping:
            bank_ok &= ~pool_full[:, None]  # pool frozen once it holds K
        bank_ok &= heur_ok[:, None]
        bank = jnp.where(bank_ok, bank, NEG_INF)
        merged_scores = jnp.concatenate([pool_scores, bank], axis=1)  # [B, 3K]
        merged_tokens = jnp.concatenate([pool_tokens, cand_tokens], axis=1)
        pool_scores, pool_idx = jax.lax.top_k(merged_scores, k)
        pool_tokens = jnp.take_along_axis(merged_tokens, pool_idx[..., None], axis=1)

        # ---- select the K best non-finished candidates to continue ----
        run_s2k = s2k + hits * NEG_INF
        run_scores, sel = jax.lax.top_k(run_s2k, k)
        sel_beam = jnp.take_along_axis(beam2k, sel, axis=1)  # [B, K] old beam
        run_tokens = jnp.take_along_axis(cand_tokens, sel[..., None], axis=1)
        if use_ancestry:
            # Compose this step's selection into the ancestry tensor (the
            # caches themselves are append-only and never move); position
            # i+1 is re-pinned to identity — next step's writer row is the
            # new beam index by construction.
            perm = (sel_beam[..., None] == jnp.arange(k)[None, None, :]
                    ).astype(anc.dtype)  # [B, Knew, Kold]
            anc = jnp.einsum("bnm,bmjt->bnjt", perm, anc)
            anc = jax.lax.dynamic_update_slice(
                anc, jnp.broadcast_to(eye_k[None, :, :, None], (b, k, k, 1)
                                      ).astype(anc.dtype),
                (0, 0, 0, i + 1))
        else:
            cache = [
                {"self": _gather_beams(layer["self"], sel_beam, b, k),
                 "cross": layer["cross"]}
                for layer in cache
            ]

        # ---- early-stop heuristic (pool can no longer improve) ----
        best_possible = run_scores[:, 0] / jnp.power(gen_len, lp)
        pool_done = jnp.all(pool_scores > NEG_INF / 2, axis=-1)
        worst = jnp.min(pool_scores, axis=-1)
        heur_ok = heur_ok & (~pool_done | (best_possible > worst))

        return (i + 1, run_tokens, run_scores, pool_tokens, pool_scores,
                heur_ok, cache, anc), None

    if read_windows is None:
        cache = run_prefix(cache, anc)
        state = (jnp.int32(n_prefix - 1), run_tokens, run_scores, pool_tokens,
                 pool_scores, heur_ok, cache, anc)
        state, _ = jax.lax.scan(body, state, None, length=max_len - n_prefix)
    else:
        if not use_ancestry:
            raise ValueError("read_windows requires use_ancestry=True "
                             "(the cache-reorder fallback rewrites full "
                             "cache leaves each step)")
        windows = [int(w) for w in read_windows]
        if windows != sorted(set(windows)) or windows[-1] != max_len:
            raise ValueError(f"read_windows must be ascending and end at "
                             f"max_len={max_len}: {windows}")
        # Drop rungs too small to host the first step's ancestry pin at
        # position n_prefix (scan s covers i while i+1 <= W-1).
        windows = [w for w in windows if w >= n_prefix + 2] or [max_len]
        if windows[-1] != max_len:
            windows.append(max_len)

        # Time axis of every self-cache leaf: 1 in the rows layout
        # ([rows, T, H, Dh] / [rows, T, H] scales), 3 in bhjtd
        # ([B, H, J, T, Dh] / [B, H, J, T] scales).
        t_ax = 3 if cache[0]["self"]["k"].ndim == 5 else 1

        def t_slice(vv, lo, hi):
            return jax.lax.slice_in_dim(vv, lo, hi, axis=t_ax)

        def window_self(cache, anc, w):
            win, tail = [], []
            for layer in cache:
                win.append({"self": {kk: t_slice(vv, 0, w)
                                     for kk, vv in layer["self"].items()},
                            "cross": layer["cross"]})
                tail.append({kk: t_slice(vv, w, vv.shape[t_ax])
                             for kk, vv in layer["self"].items()})
            return win, tail, anc[..., :w], anc[..., w:]

        if not _prefix_in_window:
            cache = run_prefix(cache, anc)
        cache_win, cache_tail, anc_win, anc_tail = window_self(
            cache, anc, windows[0])
        # ``_prefix_in_window=True`` teacher-forces the prefix on the
        # first-rung slice instead (exact: the rung filter above guarantees
        # every prefix position lives inside windows[0], and positions past
        # the write head contribute zero either way). Measured a NEGATIVE
        # on chip and left off: B=16 bhjtd fifths 5.34 -> 5.79 ms/step
        # (+8%, tokens exact, tools/prefix_window_ab.py) — the expected
        # saving was only ~0.09 ms/step (3 prefix steps leave the
        # max_len regime), and pre-slicing the cache before the prefix
        # writes costs the first segment its DUS aliasing, which dwarfs it.
        if _prefix_in_window:
            cache_win = run_prefix(cache_win, anc_win)
        i_cur = n_prefix - 1
        state = (jnp.int32(i_cur), run_tokens, run_scores, pool_tokens,
                 pool_scores, heur_ok, cache_win, anc_win)
        for si, w in enumerate(windows):
            stop = max_len - 1 if si == len(windows) - 1 else w - 1
            steps = stop - i_cur
            if steps > 0:
                state, _ = jax.lax.scan(body, state, None, length=steps)
                i_cur = stop
            if si < len(windows) - 1:
                delta = windows[si + 1] - w
                (i_, rt, rs, pt, ps, ho, cache_win, anc_win) = state
                cache_win = [
                    {"self": {kk: jnp.concatenate(
                        [vv, t_slice(cache_tail[li][kk], 0, delta)],
                        axis=t_ax)
                        for kk, vv in layer["self"].items()},
                     "cross": layer["cross"]}
                    for li, layer in enumerate(cache_win)]
                cache_tail = [{kk: t_slice(vv, delta, vv.shape[t_ax])
                               for kk, vv in t.items()}
                              for t in cache_tail]
                anc_win = jnp.concatenate(
                    [anc_win, anc_tail[..., :delta]], axis=3)
                anc_tail = anc_tail[..., delta:]
                state = (i_, rt, rs, pt, ps, ho, cache_win, anc_win)
    _, _, _, pool_tokens, pool_scores, _, _, _ = state
    # lax.top_k keeps the pool sorted best-first.
    return BeamResult(sequences=pool_tokens, scores=pool_scores)
