"""Whisper decode-time logit rules: suppress / begin-suppress / forced
tokens and the timestamp grammar.

The reference decodes by argmaxing a linear head (reference:
train.py:130-141) so it never needed these; but its AVNet loads HF Whisper
(reference: models/av_net.py:22) and any real-weight WER comparison goes
through HF ``WhisperForConditionalGeneration.generate``, which applies these
processors BY DEFAULT (suppress_tokens, begin_suppress_tokens, and — with
``return_timestamps`` — the timestamp grammar). Token-exact parity with HF
therefore requires them; semantics here mirror
``transformers.generation.logits_process`` (v4.57):

- ``SuppressTokensLogitsProcessor``: −inf at the suppress ids, every step;
- ``SuppressTokensAtBeginLogitsProcessor``: −inf at the begin ids only when
  choosing the FIRST generated position (``pos == begin_index``);
- ``ForceTokensLogitsProcessor`` (removed upstream, semantics preserved):
  at a forced position, −inf everywhere and **0.0** at the forced token —
  the hypothesis score is unchanged by a forced step;
- ``WhisperTimeStampLogitsProcessor``: timestamps come in pairs (a lone
  timestamp must be followed by text; a second consecutive timestamp must
  be followed by a non-text token), timestamps never decrease, the initial
  token must be a timestamp (optionally capped at
  ``max_initial_timestamp_index``), ``<|notimestamps|>`` is suppressed, and
  when total timestamp probability beats every single text token the text
  tokens are suppressed (``_detect_timestamp_from_logprob``).

TPU design: everything is static masks + vector ops on the [.., V] score
row — no data-dependent shapes, no host control flow — so the rules fold
into the beam/greedy/streaming ``lax.scan`` bodies at zero structural cost.
Scores arrive ALREADY log-softmaxed (HF beam search normalizes before
processing and never renormalizes after; the detection rule's internal
re-log_softmax is a no-op on normalized scores, which keeps greedy —
where HF processes raw logits — bit-consistent too).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


@dataclasses.dataclass(frozen=True)
class LogitRules:
    """Static decode-time token rules (hashable → jit-cache friendly).

    Positions are ABSOLUTE indices into the decoded sequence (prefix
    included), matching HF's ``input_ids.shape[-1]`` convention:
    ``begin_index`` is the length of the forced prefix, i.e. the position of
    the first freely generated token.
    """

    vocab_size: int
    suppress: tuple[int, ...] = ()
    begin_suppress: tuple[int, ...] = ()
    forced: tuple[tuple[int, int], ...] = ()  # (absolute position, token id)
    # Timestamp grammar (None = disabled). ``timestamp_begin`` is
    # no_timestamps_token_id + 1 in real Whisper vocabularies.
    timestamp_begin: int | None = None
    no_timestamps_id: int | None = None
    eos_id: int = 0
    max_initial_timestamp_index: int | None = 1
    detect_timestamp_from_logprob: bool = True
    # Upper bound of the TEXT token range, when the vocabulary follows the
    # real Whisper layout (text < eot < specials < timestamps). Set by
    # ``for_whisper``; lets the transcript/conditioning stream drop any
    # special id in [prompt_eot, timestamp_begin) that an incomplete
    # suppress list let through (openai keeps ``token < tokenizer.eot``).
    # None for toy/front-special vocabularies where no such bound exists.
    prompt_eot: int | None = None

    @classmethod
    def for_whisper(cls, generation_config, vocab_size: int,
                    timestamps: bool = False) -> "LogitRules":
        """Build from an HF ``GenerationConfig``-like object or a plain dict
        (e.g. a loaded ``generation_config.json`` — the published Whisper
        checkpoints carry their suppress lists there)."""
        if isinstance(generation_config, dict):
            get = lambda k, d=None: generation_config.get(k, d)
        else:
            get = lambda k, d=None: getattr(generation_config, k, d)
        return cls(
            vocab_size=vocab_size,
            suppress=tuple(get("suppress_tokens") or ()),
            begin_suppress=tuple(get("begin_suppress_tokens") or ()),
            forced=tuple((int(p), int(t))
                         for p, t in (get("forced_decoder_ids") or ())),
            timestamp_begin=(int(get("no_timestamps_token_id")) + 1
                             if timestamps and get("no_timestamps_token_id")
                             is not None else None),
            no_timestamps_id=(int(get("no_timestamps_token_id"))
                              if get("no_timestamps_token_id") is not None
                              else None),
            eos_id=int(get("eos_token_id") or 0),
            max_initial_timestamp_index=get("max_initial_timestamp_index", 1),
            prompt_eot=(int(get("eos_token_id"))
                        if get("eos_token_id") is not None else None),
        )

    # -- static bias tables (built once per trace) ---------------------------

    def _bias(self, ids: tuple[int, ...]) -> jnp.ndarray:
        vec = np.zeros((self.vocab_size,), np.float32)
        vec[list(ids)] = NEG_INF
        return jnp.asarray(vec)

    def __call__(self, logp: jnp.ndarray, tokens: jnp.ndarray,
                 pos: jnp.ndarray, begin_index: int) -> jnp.ndarray:
        """Apply all rules to one step's scores.

        logp: [..., V] log-softmaxed scores; tokens: [..., L] token buffer
        (positions < ``pos`` are committed); pos: traced scalar — absolute
        position of the token being chosen; begin_index: static int.
        Returns scores with rule masks applied (same shape/dtype).
        """
        v = self.vocab_size
        if self.suppress:
            logp = logp + self._bias(self.suppress)
        if self.begin_suppress:
            logp = jnp.where(jnp.equal(pos, begin_index),
                             logp + self._bias(self.begin_suppress), logp)
        for fpos, ftok in self.forced:
            forced_row = jnp.full((v,), NEG_INF, logp.dtype).at[ftok].set(0.0)
            logp = jnp.where(jnp.equal(pos, fpos), forced_row, logp)
        if self.timestamp_begin is not None:
            logp = self._timestamp_rules(logp, tokens, pos, begin_index)
        return logp

    # -- timestamp grammar ---------------------------------------------------

    def _timestamp_rules(self, logp, tokens, pos, begin_index):
        """Vectorized WhisperTimeStampLogitsProcessor (semantics above)."""
        ts0 = self.timestamp_begin
        v = self.vocab_size
        arange_v = jnp.arange(v)
        is_ts_col = arange_v >= ts0  # [V]

        # <|notimestamps|> is always suppressed under the grammar.
        if self.no_timestamps_id is not None:
            logp = logp + self._bias((self.no_timestamps_id,))

        l_ = tokens.shape[-1]
        positions = jnp.arange(l_)
        gen_mask = (positions >= begin_index) & (positions < pos)  # [L]
        tok_is_ts = (tokens >= ts0) & gen_mask  # [..., L]

        n_gen = pos - begin_index

        def tok_at(idx):  # tokens[..., idx] for a traced scalar idx
            idx_arr = jnp.broadcast_to(
                jnp.maximum(idx, 0).astype(jnp.int32),
                tokens.shape[:-1])[..., None]
            return jnp.take_along_axis(tokens, idx_arr, axis=-1)[..., 0]

        last_tok = tok_at(pos - 1)
        penult_tok = tok_at(pos - 2)
        last_was_ts = (n_gen >= 1) & (last_tok >= ts0)
        penult_was_ts = (n_gen < 2) | (penult_tok >= ts0)

        # Pair rule: after a completed pair the next token must be text;
        # after a lone timestamp the next token may not be normal text.
        pair_mask = jnp.where(
            (last_was_ts & penult_was_ts)[..., None], is_ts_col * NEG_INF, 0.0)
        lone_mask = jnp.where(
            (last_was_ts & ~penult_was_ts)[..., None],
            (arange_v < self.eos_id) * NEG_INF, 0.0)
        logp = logp + pair_mask + lone_mask

        # Non-decreasing timestamps: forbid ts tokens < the most recent
        # timestamp (+1 when the pair is complete, to avoid re-emitting it).
        any_ts = jnp.any(tok_is_ts, axis=-1)
        last_ts_pos = jnp.max(
            jnp.where(tok_is_ts, positions, -1), axis=-1)  # [...]
        ts_last = jnp.take_along_axis(
            tokens, jnp.maximum(last_ts_pos, 0)[..., None], axis=-1)[..., 0]
        ts_floor = jnp.where(last_was_ts & ~penult_was_ts, ts_last, ts_last + 1)
        dec_mask = is_ts_col & (arange_v < ts_floor[..., None])
        logp = logp + jnp.where(any_ts[..., None] & dec_mask, NEG_INF, 0.0)

        # Initial token must be a timestamp, optionally capped.
        at_begin = jnp.equal(pos, begin_index)
        begin_mask = (~is_ts_col).astype(jnp.float32) * NEG_INF
        if self.max_initial_timestamp_index is not None:
            last_allowed = ts0 + self.max_initial_timestamp_index
            begin_mask = begin_mask + (arange_v > last_allowed) * NEG_INF
        logp = jnp.where(at_begin, logp + begin_mask, logp)

        # Probability-mass detection: if total timestamp probability beats
        # every individual text token, suppress text.
        if self.detect_timestamp_from_logprob:
            norm = jax.nn.log_softmax(logp, axis=-1)
            ts_lp = jax.nn.logsumexp(
                jnp.where(is_ts_col, norm, -jnp.inf), axis=-1)
            text_lp = jnp.max(jnp.where(is_ts_col, -jnp.inf, norm), axis=-1)
            force_ts = (ts_lp > text_lp)[..., None] & ~is_ts_col
            logp = jnp.where(force_ts, NEG_INF, logp)
        return logp
