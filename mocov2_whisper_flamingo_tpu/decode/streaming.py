"""Long-form streaming decode: 30 s chunks with a persistent KV cache.

North-star config 5 (BASELINE.md): the reference bounds sequence length
instead of streaming (SURVEY.md §5.7 — 12 s segments, hard caps at 3000 mel
frames / 400 video frames; reference: av_dataset.py:211-219). Here long audio
is processed as consecutive 30 s chunks through the encoder while the
*decoder state persists*: generated tokens stay in the self-attention KV
cache across chunks and each chunk swaps in fresh cross-attention K/V — so
the transcript continues seamlessly without re-decoding, and per-chunk work
is one encoder pass + one compiled decode dispatch.

TPU design (v2 — replaces the round-1 host-driven per-token loop):
- the whole per-chunk decode is ONE jitted ``lax.scan`` with a fixed trip
  count (``max_tokens_per_chunk``); per-token host round-trips cost ~200 ms
  each through the remote-execution tunnel (CLAUDE.md), which made the v1
  loop orders of magnitude slower than the batched beam path;
- beam search is supported (``beam_size`` >= 1; greedy == beam 1): within a
  chunk the K beams evolve exactly as in ``decode/beam.py`` (append-only
  ancestry-mask attention, EOS freezing); at the chunk boundary the best
  beam is COMMITTED —
  its tokens and self-cache are broadcast to all K rows and the next chunk
  restarts the beam from that single hypothesis (standard streaming-beam
  "path commit": hypotheses cannot straddle a chunk boundary, which keeps
  state size constant over arbitrarily long audio);
- cache-resume correctness: the committed position ``i`` is recomputed from
  the token buffer (last non-filler position), and any self-K/V written past
  it by finished beams is invisible on resume because ``decode_step`` masks
  key positions ``>= cache_index + 1`` (models/whisper.py decode path). The
  per-position self K/V depends only on (token id, position) at layer 0 and
  on the *then-active* chunk's encoder context at deeper layers — the latter
  is precisely the persistent-context semantics this decoder implements;
- **window rollover** (v3): the decoder's learned PE and token buffer cap a
  window at ``max_len`` (448 for real Whisper) — real Whisper long-form
  decoding restarts the decoder context per window, optionally conditioning
  on the previous text (openai ``condition_on_previous_text`` /
  HF ``prompt_ids`` semantics). Here, when the NEXT chunk could overflow
  the buffer (tracked host-side as a conservative bound — no extra device
  sync), the window is committed (one sync, amortized over ~(max_len /
  max_tokens_per_chunk) chunks), the decoder state is reset, and the next
  chunk re-primes with ``<|startofprev|> + last context_tokens of
  committed text + prefix`` against ITS OWN encoder output — so the
  transcript continues unbounded with constant device state. Steps past
  buffer exhaustion (only reachable with ``rollover=False``) are true
  no-ops: the cache write is gated (models/whisper.py ``write_gate``), so
  the committed self-cache can never hold a wrong beam's K/V.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from mocov2_whisper_flamingo_tpu.decode.beam import NEG_INF
from mocov2_whisper_flamingo_tpu.models import layers as L

logger = logging.getLogger(__name__)


def _cross_caches(decoder, params, encoder_out):
    """Per-layer cross-attention K/V for one chunk ([B=1, T, H, Dh])."""
    cfg, prec = decoder.config, decoder.precision
    dtype = prec.compute_dtype
    enc = prec.cast(encoder_out)
    out = []
    for lp in params["layers"]:
        k = L.linear(lp["cross_attn"]["k"], enc, prec)
        v = L.linear(lp["cross_attn"]["v"], enc, prec)
        b, t, _ = k.shape
        out.append({
            "k": k.reshape(b, t, cfg.n_heads, cfg.head_dim).astype(dtype),
            "v": v.reshape(b, t, cfg.n_heads, cfg.head_dim).astype(dtype),
        })
    return out


class StreamingDecoder:
    """Feed chunks of encoder features; carries transcript + decoder cache.

    ``beam_size=1`` is greedy; ``beam_size>1`` runs chunk-local beam search
    with best-path commit at each chunk boundary. All decode work per chunk
    is a single compiled dispatch.

    ``rollover`` (default True): when the next chunk could overflow the
    ``max_len`` token/PE budget, commit the window and restart the decoder
    context, re-priming with ``sot_prev_id`` + the last ``context_tokens``
    committed text tokens + the prefix (Whisper's
    condition_on_previous_text window-restart semantics;
    ``context_tokens=0`` restarts from the bare prefix). The transcript
    then grows without bound while device state stays constant. With
    ``rollover=False`` decoding hard-stops at ``max_len`` tokens.

    ``logit_rules``: optional ``decode.logit_rules.LogitRules`` applied
    inside each chunk's scan; begin-index rules fire at each window's first
    generated position (matching HF's per-window processor reset).
    """

    def __init__(self, decoder, params: dict, prefix_ids, max_len: int = 448,
                 eos_id: int = 0, max_tokens_per_chunk: int = 64,
                 beam_size: int = 1, length_penalty: float = 1.0,
                 rollover: bool = True, context_tokens: int = 0,
                 sot_prev_id: int | None = None, logit_rules=None,
                 initial_context: list[int] | None = None,
                 cache_layout: str = "rows"):
        if cache_layout not in ("rows", "bhjtd"):
            raise ValueError(f"unknown cache_layout {cache_layout!r}; "
                             "expected 'rows' or 'bhjtd'")
        self.decoder = decoder
        self.params = params
        # Persistent-chunk-cache layout (see models/whisper.py init_cache):
        # "rows" [K, L, H, Dh] is the measured default at the streaming
        # B=1 x K shape (narrow batch keeps DUS aliasing, like the B=4
        # batch decode where rows wins); "bhjtd" [1, H, K, L, Dh] is the
        # einsum-native layout that wins at wide buckets — selectable here
        # so wide-batch streaming variants can pick it.
        self.cache_layout = cache_layout
        self.prefix_ids = [int(t) for t in prefix_ids]
        # Conditioning prompt (openai ``initial_prompt``): decoded against
        # but never committed. It sits at the FRONT of each rollover's
        # context pool, so — exactly like openai's tail-clamped prompt —
        # it conditions windows until the transcript context fills the
        # budget, then falls out. ``sot_prev_id`` is prepended
        # automatically.
        self.initial_context = [int(t) for t in (initial_context or [])]
        self.max_len = max_len
        self.eos_id = eos_id
        self.max_tokens_per_chunk = max_tokens_per_chunk
        self.beam_size = beam_size
        self.length_penalty = length_penalty
        self.rollover = rollover
        self.context_tokens = context_tokens
        self.sot_prev_id = sot_prev_id
        self.logit_rules = logit_rules
        self._fns: dict = {}
        self.reset()

    def reset(self) -> None:
        self.tokens = list(self.prefix_ids)
        # Transcript committed from CLOSED, DRAINED windows (original prefix
        # included; window re-prime context is never re-emitted).
        self._committed = list(self.prefix_ids)
        # Closed windows NOT yet read back: (token row [L], i_new, window
        # prefix length) device triples — the sync-free rollover path.
        self._stash: list[tuple] = []
        # The current window's forced prefix (context + prefix after a
        # rollover; initial_context + prefix for window 0).
        self._window_prefix = self._context_prefix(self.initial_context)
        self._state = None  # (self_caches, tokens_buf [K, L], i) on device
        # Host-side conservative bound on the device position ``i`` — lets
        # the rollover decision run WITHOUT a device sync per chunk.
        self._i_bound = len(self._window_prefix) - 1

    def _context_prefix(self, ctx: list[int]) -> list[int]:
        """sot_prev + context + prefix (the window's forced tokens). The
        context is clamped to half the token budget (openai's prompt
        clamp) so every window keeps room to generate."""
        budget = self.max_len // 2 - len(self.prefix_ids) - 1
        ctx = list(ctx)[-budget:] if budget > 0 else []
        if ctx and self.sot_prev_id is not None:
            ctx = [self.sot_prev_id] + ctx
        return ctx + list(self.prefix_ids)

    # -- compiled chunk step -------------------------------------------------

    def _init_state(self, window_prefix: list[int]):
        cfg = self.decoder.config
        k, l_ = self.beam_size, self.max_len
        dtype = self.decoder.precision.compute_dtype
        tokens = np.full((k, l_), self.eos_id, np.int32)
        tokens[:, : len(window_prefix)] = window_prefix
        if self.cache_layout == "bhjtd":
            kv_shape = (1, cfg.n_heads, k, l_, cfg.head_dim)
        else:
            kv_shape = (k, l_, cfg.n_heads, cfg.head_dim)
        caches = [
            {"k": jnp.zeros(kv_shape, dtype), "v": jnp.zeros(kv_shape, dtype)}
            for _ in range(cfg.decoder_layers)
        ]
        return caches, jnp.asarray(tokens), jnp.int32(len(window_prefix) - 1)

    def _chunk_fn(self, n_prime: int, has_valid: bool, begin_index: int):
        """Build (and cache) the jitted per-chunk decode function.

        Distinct (n_prime, begin_index) pairs occur only at window starts —
        window 0 and the (identical once steady) rollover windows — so the
        compile count stays at ~3 variants regardless of stream length."""
        key = (n_prime, has_valid, begin_index)
        if key in self._fns:
            return self._fns[key]

        decoder, eos = self.decoder, self.eos_id
        k, l_, v = self.beam_size, self.max_len, decoder.config.vocab_size
        n_steps = self.max_tokens_per_chunk
        lp_pow = self.length_penalty
        rules = self.logit_rules
        # With rollover the window restarts BEFORE the buffer can exhaust,
        # so the exhaustion write-gate (and its per-layer slice cost) is
        # only traced into the no-rollover program.
        gate_writes = not self.rollover

        native = self.cache_layout == "bhjtd"

        def fn(params, encoder_out, enc_valid, self_caches, tokens, i0):
            cross = _cross_caches(decoder, params, encoder_out)
            cache = [{"self": s, "cross": c} for s, c in zip(self_caches, cross)]

            # Ancestry-mask beam attention (see decode/beam.py): caches are
            # append-only within the chunk; the one physical gather happens
            # at the commit below, amortized over the whole chunk.
            eye_k = jnp.eye(k, dtype=jnp.float32)
            anc0 = jnp.broadcast_to(eye_k[None, :, :, None], (1, k, k, l_)) + 0.0

            def prime_step(cache, i):
                cur = jnp.broadcast_to(tokens[:1, i], (k,))[:, None]
                _, cache = decoder.decode_step(
                    params, cur, cache, i, encoder_valid=enc_valid,
                    # bhjtd caches are readable only through the ancestry
                    # path; identity ancestry IS row-aligned attention, so
                    # priming with it is exact (see decode/beam.py
                    # prefix_anc). The rows layout keeps the cheaper masked
                    # single-row read.
                    ancestry=anc0 if native else None)
                return cache, None

            if n_prime > 0:
                cache, _ = jax.lax.scan(prime_step, cache, jnp.arange(n_prime))

            scores = jnp.array([0.0] + [NEG_INF] * (k - 1), jnp.float32)
            done = jnp.zeros((k,), bool)

            def body(state, _):
                i, tokens, scores, done, cache, anc = state
                done = done | (i > l_ - 2)  # no room to write at i+1
                idx = jnp.minimum(i, l_ - 2)
                cur = jax.lax.dynamic_slice(tokens, (0, idx), (k, 1))
                logits, cache = decoder.decode_step(
                    params, cur, cache, idx, encoder_valid=enc_valid,
                    ancestry=anc,
                    # Past buffer exhaustion the scan keeps running (fixed
                    # trip count) — gate the cache write so the final slot
                    # is never rewritten with post-reorder rows. (Rollover
                    # restarts the window before exhaustion is reachable,
                    # so the gate is traced only when rollover is off.)
                    write_gate=(i <= l_ - 2) if gate_writes else None)
                logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
                if rules is not None:
                    logp = rules(logp, tokens, idx + 1, begin_index)
                eos_only = jnp.full((v,), NEG_INF).at[eos].set(0.0)
                logp = jnp.where(done[:, None], eos_only[None, :], logp)

                # Two-stage expansion (see decode/beam.py): per-beam top-K
                # over the vocab, then top-K of the union — exact, and it
                # avoids the physical relayout copy of the flattened scores.
                s1, t1 = jax.lax.top_k(logp, k)  # [K, K] over vocab
                total1 = scores[:, None] + s1
                top_scores, flat = jax.lax.top_k(total1.reshape(1, k * k), k)
                beam_idx = flat // k  # [1, K]
                token_idx = jnp.take_along_axis(
                    t1.reshape(1, k * k), flat, axis=1)[0].astype(jnp.int32)

                tokens = jnp.take_along_axis(tokens, beam_idx.T, axis=0)
                done = jnp.take_along_axis(done[None], beam_idx, axis=1)[0]
                perm = (beam_idx[..., None] == jnp.arange(k)[None, None, :]
                        ).astype(anc.dtype)  # [1, Knew, Kold]
                anc = jnp.einsum("bnm,bmjt->bnjt", perm, anc)
                anc = jax.lax.dynamic_update_slice(
                    anc, jnp.broadcast_to(
                        eye_k[None, :, :, None], (1, k, k, 1)).astype(anc.dtype),
                    (0, 0, 0, idx + 1))
                token_idx = jnp.where(done, eos, token_idx)
                prev = jax.lax.dynamic_slice(tokens, (0, idx + 1), (k, 1))[:, 0]
                written = jnp.where(i > l_ - 2, prev, token_idx)
                tokens = jax.lax.dynamic_update_slice(
                    tokens, written[:, None], (0, idx + 1))
                done = done | (token_idx == eos)
                return (i + 1, tokens, top_scores[0], done, cache, anc), None

            state = (i0, tokens, scores, done, cache, anc0)
            (i_end, tokens, scores, done, cache, anc), _ = jax.lax.scan(
                body, state, None, length=n_steps)

            # Commit the best beam (chunk-local length-normalized score).
            # The chunk's ONLY physical cache gather happens here: beam
            # ``best``'s per-position ancestry row A[j, t] selects its KV
            # line out of the append-only cache, broadcast to all K rows so
            # the next chunk restarts from one committed hypothesis.
            gen = jnp.sum(tokens != eos, axis=-1) - (i0 + 1)
            norm = scores / jnp.power(
                jnp.maximum(gen, 1).astype(jnp.float32), lp_pow)
            best = jnp.argmax(norm)
            tokens = jnp.broadcast_to(tokens[best][None], (k, l_))
            sel = anc[0, best]  # [J, T]: one-hot row choice per position
            if native:  # [1, H, J, T, Dh]: select the line, replicate over J
                self_caches = [
                    {name: jnp.broadcast_to(
                        jnp.einsum("jt,bhjtd->bhtd",
                                   sel.astype(buf.dtype), buf)[:, :, None],
                        buf.shape)
                     for name, buf in layer["self"].items()}
                    for layer in cache]
            else:
                self_caches = [
                    {name: jnp.broadcast_to(
                        jnp.einsum("jt,jthd->thd", sel.astype(buf.dtype), buf),
                        buf.shape)
                     for name, buf in layer["self"].items()}
                    for layer in cache]

            pos = jnp.arange(l_)
            i_new = jnp.max(jnp.where(tokens[0] != eos, pos, 0))
            i_new = jnp.maximum(i_new, i0)
            return self_caches, tokens, i_new.astype(jnp.int32)

        jitted = jax.jit(fn)
        self._fns[key] = jitted
        return jitted

    # -- window rollover -----------------------------------------------------

    def _drain_stash(self) -> None:
        """Read back the stashed closed windows into the committed
        transcript (the only sync the sync-free rollover path ever pays,
        deferred to the caller's next natural sync point)."""
        for row, i_new, wp_len in self._stash:
            r = np.asarray(row)
            self._committed.extend(
                int(t) for t in r[wp_len: int(i_new) + 1])
        self._stash = []

    def _window_generation(self) -> list[int]:
        """Sync and return the current window's generated tokens (window
        prefix excluded)."""
        if self._state is None:
            return []
        _, tokens, i_new = self._state
        row = np.asarray(tokens[0])
        return [int(t) for t in row[len(self._window_prefix): int(i_new) + 1]]

    def _maybe_rollover(self) -> None:
        """Restart the decoder window if the next chunk could overflow the
        token/PE budget. Host-side trigger on ``_i_bound`` (each chunk adds
        at most ``max_tokens_per_chunk``), so steady-state chunks stay
        sync-free. With ``context_tokens=0`` the rollover itself is ALSO
        sync-free: the closed window's token row is stashed on device and
        read back at the next natural sync point (a collected chunk or
        ``collected_tokens``), so a deferred-collect stream never stalls
        mid-flight. Text conditioning needs the actual tokens, so
        ``context_tokens>0`` pays one sync per rollover (~once per
        max_len/max_tokens_per_chunk chunks)."""
        if not self.rollover or self._state is None:
            return
        if self._i_bound + self.max_tokens_per_chunk <= self.max_len - 2:
            return
        _, tokens, i_new = self._state
        if self.context_tokens > 0:
            self._drain_stash()
            self._committed = self._committed + self._window_generation()
            # context is TEXT only: drop eos and (with the timestamp
            # grammar active) timestamp tokens — openai prompts never
            # carry timestamps
            ts0 = getattr(self.logit_rules, "timestamp_begin", None) \
                if self.logit_rules is not None else None
            pool = [t for t in self._committed[len(self.prefix_ids):]
                    if t != self.eos_id and (ts0 is None or t < ts0)]
            # initial_context ahead of the rolling transcript, tail-clamped
            # (openai prompt semantics: the initial prompt conditions
            # windows until the transcript context fills the budget, then
            # drops out of the tail slice)
            ctx = (self.initial_context + pool)[
                -max(self.context_tokens, len(self.initial_context)):]
            self._window_prefix = self._context_prefix(ctx)
            self.tokens = list(self._committed)
        else:
            self._stash.append((tokens[0], i_new, len(self._window_prefix)))
            self._window_prefix = self._context_prefix(self.initial_context)
        self._state = None
        self._i_bound = len(self._window_prefix) - 1

    # -- public API ----------------------------------------------------------

    def process_chunk(self, encoder_out: jnp.ndarray,
                      encoder_valid: jnp.ndarray | None = None,
                      collect: bool = True) -> list[int]:
        """Decode against one chunk's encoder output ([1, T, D]); returns the
        newly committed token ids (EOS terminates the chunk, not the
        stream).

        ``collect=False`` skips the device->host sync entirely (the chunk
        dispatch stays async and overlaps the next chunk's encode — on a
        remote-tunnel TPU each sync costs ~3 round trips); call
        ``collected_tokens()`` at any boundary to drain the transcript.
        Window rollovers still happen (they sync only at the boundary they
        fire on)."""
        self._maybe_rollover()
        first = self._state is None
        if first:
            self._state = self._init_state(self._window_prefix)
        caches, tokens, i0 = self._state
        n_prime = max(len(self._window_prefix) - 1, 0) if first else 0
        fn = self._chunk_fn(n_prime, encoder_valid is not None,
                            len(self._window_prefix))
        caches, tokens, i_new = fn(
            self.params, encoder_out, encoder_valid, caches, tokens, i0)
        self._state = (caches, tokens, i_new)
        self._i_bound = min(self._i_bound + self.max_tokens_per_chunk,
                            self.max_len - 1)
        if not collect:
            return []
        self._drain_stash()  # collecting syncs anyway
        row = np.asarray(tokens[0])
        start, end = int(i0) + 1, int(i_new) + 1
        # Replace the conservative bound with the true position (avoids
        # premature rollovers after short chunks).
        self._i_bound = int(i_new)
        new_tokens = [int(t) for t in row[start:end]]
        self.tokens = self._committed + [
            int(t) for t in row[len(self._window_prefix): end]]
        return new_tokens

    def collected_tokens(self) -> list[int]:
        """Sync and return the FULL transcript committed so far (original
        prefix included, window re-prime context excluded) — the one-sync
        companion of ``process_chunk(collect=False)``. Also reconciles
        ``self.tokens``."""
        self._drain_stash()
        self.tokens = self._committed + self._window_generation()
        return list(self.tokens)


def transcribe_long_form(
    encoder,
    decoder,
    encoder_params: dict,
    decoder_params: dict,
    audio,
    prefix_ids,
    eos_id: int = 0,
    chunk_seconds: float = 30.0,
    sample_rate: int = 16_000,
    max_len: int = 448,
    max_tokens_per_chunk: int = 64,
    beam_size: int = 1,
    length_penalty: float = 1.0,
    mel_fn=None,
    rollover: bool = True,
    context_tokens: int = 0,
    sot_prev_id: int | None = None,
    initial_prompt_ids=None,
    logit_rules=None,
    temperatures=None,
    best_of: int = 5,
    logprob_threshold: float | None = -1.0,
    compression_ratio_threshold: float | None = 2.4,
    no_speech_threshold: float | None = None,
    no_speech_id: int | None = None,
    sot_id: int | None = None,
    text_fn=None,
    key=None,
    return_segments: bool = False,
    cache_layout: str = "rows",
) -> list[int] | tuple[list[int], list[dict]]:
    """End-to-end long-form ASR: waveform of arbitrary length -> 30 s chunks
    -> log-mel -> encoder -> streaming decode with a persistent KV cache
    (BASELINE config 5). Returns all generated token ids (prefix excluded);
    with ``rollover`` (default) the transcript length is unbounded by the
    decoder's ``max_len`` budget (window restart + optional text
    conditioning — see ``StreamingDecoder``).

    ``return_segments``: also return per-window segment dicts
    ``{"id", "start", "end", "tokens"}`` (start/end = the 30 s window
    bounds, clipped to the audio length). Quality mode adds the openai
    per-segment diagnostics (``temperature``, ``avg_logprob``,
    ``gates_passed``, and ``no_speech_prob`` when probed); windows skipped
    as silence produce no segment (openai behavior). When ``logit_rules``
    enable the timestamp grammar, quality mode further runs openai's
    timestamp-conditioned window loop (decode/segments.py): timestamp
    pairs split windows into precisely timed segments (timestamp tokens
    kept in segment ``tokens``), the next window SEEKS to the last
    predicted timestamp, the unfinished tail segment is re-decoded, and
    the flat return keeps text tokens only.

    Per chunk: one compiled encoder dispatch + one compiled decode dispatch
    (the whole token loop runs on-device under ``lax.scan``).

    ``temperatures`` switches to QUALITY mode — openai ``transcribe``'s
    window loop: each 30 s chunk is decoded independently (context prompt =
    ``sot_prev_id`` + the last ``context_tokens`` committed tokens) through
    ``decode.sampling.decode_with_fallback``, escalating temperature when
    the compression-ratio / avg-logprob gates fail, and (with
    ``no_speech_threshold`` + ``no_speech_id``) skipping windows whose
    ``<|nospeech|>`` probability at the SOT position marks them as silence.
    This path syncs per chunk by design (the gates inspect the output) and
    recompiles per distinct (context length, temperature) pair — it trades
    the streaming path's throughput for real-weight robustness semantics.
    """
    from mocov2_whisper_flamingo_tpu.ops.mel import whisper_log_mel

    mel_fn = mel_fn or (lambda wav: whisper_log_mel(
        wav, pad_to=int(chunk_seconds * sample_rate)))
    chunk_samples = int(chunk_seconds * sample_rate)
    audio = jnp.asarray(audio)
    n_chunks = max(-(-audio.shape[-1] // chunk_samples), 1)
    duration = audio.shape[-1] / sample_rate

    def window_bounds(i):
        return (i * chunk_seconds,
                min((i + 1) * chunk_seconds, duration))

    encode = jax.jit(encoder.apply)

    def features_at(start_sample):
        chunk = audio[..., start_sample : start_sample + chunk_samples]
        pad = chunk_samples - chunk.shape[-1]
        if pad > 0:  # keep mel/encoder shapes static across chunks
            chunk = jnp.pad(chunk, [(0, 0)] * (chunk.ndim - 1) + [(0, pad)])
        return encode(encoder_params, mel_fn(chunk)[None])

    def chunk_features(i):
        return features_at(i * chunk_samples)

    if temperatures is not None:
        from mocov2_whisper_flamingo_tpu.decode.sampling import (
            decode_with_fallback)

        from mocov2_whisper_flamingo_tpu.decode.segments import (
            TIME_PRECISION, segments_from_window, strip_timestamps)

        key = key if key is not None else jax.random.PRNGKey(0)
        prefix = [int(t) for t in prefix_ids]
        # openai ``initial_prompt``: conditioning text ahead of the
        # committed transcript in the context pool. Like openai's
        # tail-clamped prompt it conditions windows until the transcript
        # context fills the budget, then falls out of the tail slice; with
        # ``context_tokens == 0`` it conditions every window (openai with
        # condition_on_previous_text=False).
        prompt0 = [int(t) for t in (initial_prompt_ids or [])]
        committed: list[int] = []
        segments: list[dict] = []
        probe_ns = no_speech_threshold is not None and no_speech_id is not None
        # Timestamp-conditioned seek (openai transcribe): with the timestamp
        # grammar active, windows advance to the last predicted timestamp
        # instead of a fixed 30 s stride, and timestamp pairs split a window
        # into precisely timed segments.
        ts0 = getattr(logit_rules, "timestamp_begin", None) \
            if logit_rules is not None else None
        seek = 0.0
        window_index = 0
        # Conditioning reset (openai prompt_reset_since): a window that had
        # to escalate past t=0.5 likely committed unreliable text — stop
        # feeding it forward so a hallucination loop cannot propagate.
        reset_since = 0
        # Safety bound for the seek loop (a pathological model could emit
        # tiny advances forever; openai has no guard): past 10x the
        # fixed-stride window count, degrade to full-window strides, which
        # bounds total windows at ~11x n_chunks.
        max_windows = n_chunks * 10 + 10
        while (seek < duration - 1e-9) if ts0 is not None \
                else window_index < n_chunks:
            pool = [t for t in committed[reset_since:] if t != eos_id] \
                [-context_tokens:] if context_tokens > 0 else []
            # Quantize the transcript-context length to a power of two
            # (truncating the oldest tokens): decode_with_fallback compiles
            # one program per (prefix length, temperature), and remote TPU
            # compiles cost 30 s-10 min — this bounds the compile count to
            # a log set while changing only how much conditioning text the
            # window sees. The initial prompt is static, so it stays whole.
            if pool:
                b = 1
                while b * 2 <= len(pool):
                    b *= 2
                pool = pool[-b:]
            ctx = prompt0 + pool
            # openai clamps the prompt to half the context budget: the
            # forced tokens must leave room to generate under max_len.
            ctx_budget = max_len // 2 - len(prefix) - 1
            ctx = ctx[-ctx_budget:] if ctx_budget > 0 else []
            if ctx and sot_prev_id is not None:
                ctx = [sot_prev_id] + ctx
            window_prefix = ctx + prefix
            # SOT position within this window's prefix (for the no-speech
            # probe): the given sot_id, else the start of ``prefix_ids``.
            sot_index = (window_prefix.index(sot_id)
                         if sot_id is not None and sot_id in window_prefix
                         else len(ctx))
            start_sample = (int(round(seek * sample_rate)) if ts0 is not None
                            else window_index * chunk_samples)
            r = decode_with_fallback(
                decoder, decoder_params, features_at(start_sample),
                window_prefix, key=jax.random.fold_in(key, window_index),
                temperatures=temperatures,
                beam_size=beam_size, best_of=best_of, max_len=max_len,
                eos_id=eos_id, logit_rules=logit_rules,
                length_penalty=length_penalty,
                logprob_threshold=logprob_threshold,
                compression_ratio_threshold=compression_ratio_threshold,
                text_fn=text_fn,
                no_speech_id=no_speech_id if probe_ns else None,
                sot_index=sot_index,
                no_speech_threshold=no_speech_threshold if probe_ns
                else None)
            window_index += 1
            skipped = False
            if probe_ns:
                # openai transcribe: skip the window as silence, unless the
                # decode is nonetheless confident (avg_logprob above gate).
                skipped = float(r.no_speech_prob[0]) > no_speech_threshold
                if (logprob_threshold is not None
                        and float(r.avg_logprob[0]) > logprob_threshold):
                    skipped = False
            if skipped:
                seek += chunk_seconds
                continue
            row = [int(t) for t in r.sequences[0][len(window_prefix):]]
            while row and row[-1] == eos_id:
                row.pop()
            diag = {"temperature": float(r.temperature[0]),
                    "avg_logprob": float(r.avg_logprob[0]),
                    "compression_ratio": float(r.compression_ratio[0]),
                    "gates_passed": bool(r.gates_passed[0])}
            if probe_ns:
                diag["no_speech_prob"] = float(r.no_speech_prob[0])
            if ts0 is not None:
                window_dur = min(chunk_seconds, duration - seek)
                segs, advance = segments_from_window(
                    row, ts0, time_offset=seek,
                    segment_duration=window_dur)
                for s in segs:
                    s.update(diag)
                    s["id"] = len(segments)
                    s["seek"] = seek  # window origin (openai segment key)
                    segments.append(s)
                    # flat stream keeps TEXT tokens only (openai
                    # all_tokens < tokenizer.eot); segments keep the
                    # timestamps
                    committed.extend(strip_timestamps(
                        s["tokens"], ts0,
                        eot=getattr(logit_rules, "prompt_eot", None)))
                advance = max(advance, TIME_PRECISION)
                if window_index >= max_windows:
                    logger.warning(
                        "timestamp seek exceeded %d windows at %.2f s — "
                        "degrading to full-window strides", max_windows,
                        seek)
                    advance = max(advance, chunk_seconds)
                seek += advance
            else:
                start, end = window_bounds(window_index - 1)
                segments.append({"id": len(segments), "start": start,
                                 "end": end, "seek": start, "tokens": row,
                                 **diag})
                committed.extend(row)
            if float(r.temperature[0]) > 0.5:
                reset_since = len(committed)
        return (committed, segments) if return_segments else committed

    stream = StreamingDecoder(
        decoder, decoder_params, prefix_ids, max_len=max_len, eos_id=eos_id,
        max_tokens_per_chunk=max_tokens_per_chunk, beam_size=beam_size,
        length_penalty=length_penalty, rollover=rollover,
        context_tokens=context_tokens, sot_prev_id=sot_prev_id,
        logit_rules=logit_rules,
        initial_context=[int(t) for t in (initial_prompt_ids or [])] or None,
        cache_layout=cache_layout)
    out: list[int] = []
    segments = []
    for i in range(n_chunks):
        new = stream.process_chunk(chunk_features(i))
        if new:
            start, end = window_bounds(i)
            segments.append({"id": len(segments), "start": start,
                             "end": end, "seek": start, "tokens": new})
        out.extend(new)
    return (out, segments) if return_segments else out
