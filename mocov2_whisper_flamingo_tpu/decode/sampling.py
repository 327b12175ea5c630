"""Temperature sampling decode + Whisper's quality-gated fallback.

The reference decodes by argmaxing a linear head (reference:
train.py:130-141), but its AVNet is built around HF Whisper (reference:
models/av_net.py:22), and every production Whisper decoding stack — openai
``transcribe`` and HF ``generate(temperature=..., do_sample=True)`` — pairs
the deterministic decode with a **temperature fallback**: when a window's
output is degenerate (repetition loops, low confidence), the window is
re-decoded by sampling at escalating temperature. Long-form robustness
(BASELINE config 5) needs these semantics the moment real weights land, so
they are implemented here with openai's exact gate rules
(whisper/transcribe.py):

- ``compression_ratio > 2.4``  -> too repetitive (zlib ratio of the text);
- ``avg_logprob < -1.0``       -> too low confidence;
- a failed gate retries the decode at the next temperature in
  ``(0.0, 0.2, 0.4, 0.6, 0.8, 1.0)``; the first passing attempt (or the
  last attempt) wins. t=0 is beam search; t>0 draws ``best_of``
  independent samples and keeps the highest-average-logprob row.

TPU design: the whole sampler is ONE compiled ``lax.scan`` (fixed trip
count, EOS masking — same shape discipline as decode/beam.py; per-token
host loops cost ~200 ms/step through the remote tunnel). The ``best_of``
rows ride the batch axis as ``beam_groups`` rows of the KV cache machinery
— rows never reorder (no ancestry tensor needed), and the cross K/V stays
one copy per example. Scoring follows openai exactly: the summed logprob
accumulates the UN-tempered (but rule-masked, renormalized) logprob of each
chosen token up to and including the EOS emission, and ``avg_logprob``
divides by that scored-step count (transcribe.py's
``sum_logprobs / (len(tokens) + 1)``).

The temperature ladder itself is host-side control flow: each temperature
is a static Python float, so each rung is one compiled program (compile
cache makes rung N free after its first use), and the gates run on the
committed host-side text — this is the one decode path that is *supposed*
to sync per attempt (it exists to inspect the output).
"""

from __future__ import annotations

import dataclasses
import zlib

import jax
import jax.numpy as jnp
import numpy as np

from mocov2_whisper_flamingo_tpu.decode.beam import NEG_INF, beam_search


@dataclasses.dataclass
class SampleResult:
    sequences: jnp.ndarray    # [B, N, L] token ids (EOS-filled past the end)
    sum_logprob: jnp.ndarray  # [B, N] summed logprob over scored steps
    avg_logprob: jnp.ndarray  # [B, N] sum / n_scored (openai convention)


def sample_decode(
    decoder,
    params: dict,
    encoder_out: jnp.ndarray,
    prefix_ids,
    key: jax.Array,
    temperature: float = 1.0,
    num_samples: int = 1,
    max_len: int = 224,
    eos_id: int = 0,
    encoder_valid: jnp.ndarray | None = None,
    logit_rules=None,
    cache_quant: str | None = None,
) -> SampleResult:
    """Draw ``num_samples`` independent sampled continuations per example.

    ``temperature=0`` degenerates to greedy (all rows identical — useful
    only for testing the shared scan body). Rules (``logit_rules``) are
    applied to the log-softmaxed scores before BOTH the sampling draw and
    the scoring re-normalization, mirroring where openai applies its logit
    filters. Returns every row; callers rank by ``avg_logprob`` (see
    ``decode_with_fallback``)."""
    b = encoder_out.shape[0]
    n = num_samples
    rows = b * n
    prefix = jnp.asarray(prefix_ids, dtype=jnp.int32)
    n_prefix = int(prefix.shape[0])
    t = float(temperature)

    cache = decoder.init_cache(params, encoder_out, max_len=max_len,
                               beam_groups=n, quant=cache_quant)
    tokens = jnp.full((rows, max_len), eos_id, dtype=jnp.int32)
    tokens = tokens.at[:, :n_prefix].set(prefix[None, :])

    def prefix_step(cache, i):
        cur = jnp.broadcast_to(prefix[i], (rows, 1)).astype(jnp.int32)
        _, cache = decoder.decode_step(params, cur, cache, i,
                                       encoder_valid=encoder_valid)
        return cache, None

    if n_prefix > 1:
        cache, _ = jax.lax.scan(prefix_step, cache, jnp.arange(n_prefix - 1))

    def body(state, _):
        i, tokens, sum_lp, n_scored, done, cache = state
        cur = jax.lax.dynamic_slice_in_dim(tokens, i, 1, axis=1)
        logits, cache = decoder.decode_step(params, cur, cache, i,
                                            encoder_valid=encoder_valid)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        if logit_rules is not None:
            logp = logit_rules(logp, tokens, i + 1, n_prefix)
            # Rules mask with -inf; renormalize so scores are true logprobs
            # over the allowed set (openai log_softmaxes AFTER its filters).
            logp = jax.nn.log_softmax(logp, axis=-1)
        if t > 0.0:
            nxt = jax.random.categorical(
                jax.random.fold_in(key, i), logp / t, axis=-1)
        else:
            nxt = jnp.argmax(logp, axis=-1)
        nxt = jnp.where(done, eos_id, nxt).astype(jnp.int32)
        tok_lp = jnp.take_along_axis(logp, nxt[:, None], axis=-1)[:, 0]
        # The EOS-emitting step is scored; steps after it are not
        # (openai: ``sum_logprobs += current_logprobs * (prev != eot)``).
        sum_lp = sum_lp + jnp.where(done, 0.0, tok_lp)
        n_scored = n_scored + (~done).astype(jnp.int32)
        done = done | (nxt == eos_id)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, i + 1))
        return (i + 1, tokens, sum_lp, n_scored, done, cache), None

    state = (jnp.int32(n_prefix - 1), tokens,
             jnp.zeros((rows,), jnp.float32), jnp.zeros((rows,), jnp.int32),
             jnp.zeros((rows,), bool), cache)
    state, _ = jax.lax.scan(body, state, None, length=max_len - n_prefix)
    _, tokens, sum_lp, n_scored, _, _ = state

    avg = sum_lp / jnp.maximum(n_scored, 1).astype(jnp.float32)
    return SampleResult(
        sequences=tokens.reshape(b, n, max_len),
        sum_logprob=sum_lp.reshape(b, n),
        avg_logprob=avg.reshape(b, n),
    )


def no_speech_probability(
    decoder,
    params: dict,
    encoder_out: jnp.ndarray,
    prefix_ids,
    no_speech_id: int,
    sot_index: int = 0,
    encoder_valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Probability of ``<|nospeech|>`` at the SOT position — openai
    ``DecodingTask._main_loop`` reads ``probs_at_sot[:, no_speech_token]``
    from the initial forward pass; ``transcribe`` then skips windows where
    it exceeds ``no_speech_threshold`` (unless avg_logprob is confident).

    One compiled prefix-length scan per (prefix length) shape — the probe
    teacher-forces ``prefix_ids[: sot_index + 1]`` and softmaxes the logits
    produced by feeding the SOT token. Returns [B] float probabilities."""
    b = encoder_out.shape[0]
    prefix = jnp.asarray(prefix_ids, dtype=jnp.int32)
    n = int(sot_index) + 1
    cache = decoder.init_cache(params, encoder_out, max_len=n + 1)

    def step(cache, i):
        cur = jnp.broadcast_to(prefix[i], (b, 1)).astype(jnp.int32)
        logits, cache = decoder.decode_step(params, cur, cache, i,
                                            encoder_valid=encoder_valid)
        return cache, logits

    _, all_logits = jax.lax.scan(step, cache, jnp.arange(n))
    probs = jax.nn.softmax(all_logits[-1].astype(jnp.float32), axis=-1)
    return probs[:, no_speech_id]


# -- quality gates (openai whisper/transcribe.py semantics) -------------------


def compression_ratio(text: str | bytes) -> float:
    """UTF-8 length / zlib-compressed length — openai's repetition
    detector (>2.4 means the window is looping)."""
    data = text.encode("utf-8") if isinstance(text, str) else bytes(text)
    if not data:
        return 0.0
    return len(data) / len(zlib.compress(data))


def needs_fallback(
    avg_logprob: float,
    text: str | bytes,
    logprob_threshold: float | None = -1.0,
    compression_ratio_threshold: float | None = 2.4,
    no_speech_prob: float | None = None,
    no_speech_threshold: float | None = None,
) -> bool:
    """openai transcribe.py: retry when the text is too repetitive OR the
    average logprob is too low — but a confident silence detection
    overrides BOTH (openai sets ``needs_fallback = False`` last when
    ``no_speech_prob > no_speech_threshold``: silence must not escalate
    the temperature ladder). ``None`` disables a gate."""
    needs = False
    if (compression_ratio_threshold is not None
            and compression_ratio(text) > compression_ratio_threshold):
        needs = True
    if (logprob_threshold is not None
            and float(avg_logprob) < logprob_threshold):
        needs = True
    if (no_speech_threshold is not None and no_speech_prob is not None
            and float(no_speech_prob) > no_speech_threshold):
        needs = False
    return needs


@dataclasses.dataclass
class FallbackResult:
    sequences: np.ndarray      # [B, L] winning sequence per example
    avg_logprob: np.ndarray    # [B]
    temperature: np.ndarray    # [B] temperature that produced each row
    gates_passed: np.ndarray   # [B] bool — False = last rung still failing
    compression_ratio: np.ndarray | None = None  # [B] of the winning rows
    no_speech_prob: np.ndarray | None = None  # [B] when probed (see below)


def _beam_avg_logprob(sequences: np.ndarray, scores: np.ndarray,
                      n_prefix: int, eos_id: int,
                      length_penalty: float) -> np.ndarray:
    """Recover openai-convention avg logprob from a BeamResult row:
    score = sum / gen**lp with gen counting the EOS, so
    avg = score * gen**lp / gen."""
    l_ = sequences.shape[-1]
    pos = np.arange(l_)
    nonfill = np.where(sequences != eos_id, pos, 0).max(axis=-1)
    # end-of-sequence position: the EOS right after the last non-EOS token
    # (or the buffer end when the budget ran out before EOS).
    gen = np.minimum(nonfill + 1, l_ - 1) - n_prefix + 1
    gen = np.maximum(gen, 1).astype(np.float64)
    return scores * np.power(gen, length_penalty) / gen


def decode_with_fallback(
    decoder,
    params: dict,
    encoder_out: jnp.ndarray,
    prefix_ids,
    key: jax.Array,
    temperatures=(0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
    beam_size: int = 5,
    best_of: int = 5,
    max_len: int = 224,
    eos_id: int = 0,
    encoder_valid: jnp.ndarray | None = None,
    logit_rules=None,
    length_penalty: float = 1.0,
    logprob_threshold: float | None = -1.0,
    compression_ratio_threshold: float | None = 2.4,
    text_fn=None,
    no_speech_id: int | None = None,
    sot_index: int | None = None,
    no_speech_threshold: float | None = None,
) -> FallbackResult:
    """openai ``decode_with_fallback``: beam search at t=0, then sampled
    retries at escalating temperature until the quality gates pass.

    Batch semantics: every rung decodes the full batch (static shapes — no
    recompiles as examples converge), but an example's result freezes at
    the first rung whose gates IT passes; later rungs only update still-
    failing examples. ``text_fn(token_list) -> str`` detokenizes for the
    compression gate; without one the gate runs on the raw token-id bytes
    (a loop in id space compresses just as well — documented approximation).

    ``no_speech_id`` additionally probes ``no_speech_probability`` at
    ``sot_index`` (default: first occurrence of nothing — the prefix start)
    and returns it on the result. With ``no_speech_threshold`` also set, a
    probed probability above it ACCEPTS the current rung regardless of the
    quality gates (openai's silence override inside decode_with_fallback —
    a silent window must not burn the whole temperature ladder); the skip
    decision itself still lives in the ``transcribe`` window loop.
    """
    temperatures = tuple(temperatures)
    if not temperatures:
        raise ValueError("temperatures must be non-empty")
    n_prefix = len(list(prefix_ids))
    b = encoder_out.shape[0]
    best_seq = np.full((b, max_len), eos_id, np.int32)
    best_avg = np.full((b,), -np.inf, np.float64)
    best_temp = np.zeros((b,), np.float64)
    best_cr = np.zeros((b,), np.float64)
    frozen = np.zeros((b,), bool)

    ns_prob = None
    if no_speech_id is not None:
        ns_prob = np.asarray(no_speech_probability(
            decoder, params, encoder_out, prefix_ids, no_speech_id,
            sot_index=0 if sot_index is None else sot_index,
            encoder_valid=encoder_valid))

    def to_text(row: np.ndarray) -> str | bytes:
        ids = [int(x) for x in row[n_prefix:]]
        while ids and ids[-1] == eos_id:
            ids.pop()
        if text_fn is not None:
            return text_fn(ids)
        return np.asarray(ids, np.int32).tobytes()

    for t in temperatures:
        if t == 0.0:
            # renorm_after_rules: score on openai's convention (true
            # logprobs over the rule-allowed set) so the t=0 rung's
            # avg_logprob sits on the same scale as the sampled rungs and
            # the logprob gate — HF's no-renorm convention deflates scores
            # at grammar-constrained steps (forced timestamps etc.).
            from mocov2_whisper_flamingo_tpu.decode.beam import (
                default_read_windows)

            r = beam_search(decoder, params, encoder_out, prefix_ids,
                            beam_size=beam_size, max_len=max_len,
                            eos_id=eos_id, length_penalty=length_penalty,
                            encoder_valid=encoder_valid,
                            logit_rules=logit_rules,
                            renorm_after_rules=True,
                            read_windows=default_read_windows(
                                max_len, batch=encoder_out.shape[0]))
            seq = np.asarray(r.sequences[:, 0])
            avg = _beam_avg_logprob(seq, np.asarray(r.scores[:, 0]),
                                    n_prefix, eos_id, length_penalty)
        else:
            r = sample_decode(decoder, params, encoder_out, prefix_ids,
                              key=jax.random.fold_in(key, int(t * 1000)),
                              temperature=t, num_samples=best_of,
                              max_len=max_len, eos_id=eos_id,
                              encoder_valid=encoder_valid,
                              logit_rules=logit_rules)
            pick = np.asarray(jnp.argmax(r.avg_logprob, axis=-1))
            seq = np.asarray(r.sequences)[np.arange(b), pick]
            avg = np.asarray(r.avg_logprob)[np.arange(b), pick]

        for e in range(b):
            if frozen[e]:
                continue
            best_seq[e], best_avg[e], best_temp[e] = seq[e], avg[e], t
            text = to_text(seq[e])
            best_cr[e] = compression_ratio(text)
            if not needs_fallback(avg[e], text,
                                  logprob_threshold,
                                  compression_ratio_threshold,
                                  no_speech_prob=None if ns_prob is None
                                  else float(ns_prob[e]),
                                  no_speech_threshold=no_speech_threshold):
                frozen[e] = True
        if frozen.all():
            break

    return FallbackResult(sequences=best_seq, avg_logprob=best_avg,
                          temperature=best_temp, gates_passed=frozen.copy(),
                          compression_ratio=best_cr, no_speech_prob=ns_prob)
