"""Iteration-level (continuous) batching for the KV-cached beam decode.

New capability beyond the whole-utterance ``ServingEngine`` (the reference's
entire inference surface is a batch eval loop, reference: train.py:172-216;
the round-4 engine batches whole utterances, so a request's latency floor is
one full bucket decode — B=16 p50 1.17 s). Here the decode runs as a
PERPETUAL sequence of fixed 32-step SEGMENT programs over a fixed pool of
rows, and requests are admitted into free rows at segment boundaries — so
admission is bounded by one segment (~0.2 s at the wide bucket) instead of a
full decode, and a row whose beam search finishes early (EOS pool frozen) is
retired and refilled at the next boundary instead of riding out the full
token budget. This is the vLLM-style continuous-batching idea re-derived for
XLA's static-shape world.

TPU-first design (docs/DESIGN.md "continuous batching" seam):

- **One compiled program, zero dynamic shapes.** The segment program has a
  single static signature: state in, state out. Rows at different decode
  phases coexist because position becomes PER-ROW data, not program
  structure.
- **Phase-striped physical cache.** The self caches hold ``m`` stripes of
  ``S`` positions. At engine tick ``j`` EVERY row writes physical stripe
  ``j % m`` — so the per-step cache write keeps the shared-scalar
  ``dynamic_update_slice`` that wins on TPU (no per-row scatter). A row
  admitted at tick ``a`` has its logical segment ``l`` in physical stripe
  ``(a + l) % m``; the mapping never needs to be materialized — the
  append-only ancestry tensor is physically indexed, and a per-row validity
  mask (stripe written since admission?) hides every stale slot, so a
  freed row is reusable WITHOUT clearing its cache.
- **Per-row logical positions.** The learned PE is gathered at per-row
  positions ([rows] gather of the 448xD table — noise); the token buffer
  read/write use per-row one-hot selects over [R, K, L] int32 (tiny). The
  heavy per-step ops (QKV matmuls, ancestry einsums, the cache write) stay
  batched exactly as in decode/beam.py.
- **Forced-prefix steps are masked beam steps.** A row's first
  ``n_prefix - 1`` steps teacher-force its prefix: the program computes the
  normal beam expansion for all rows and per-row selects identity
  (scores/tokens/ancestry frozen) where ``pos + 1 < n_prefix`` — no
  separate priming program, no extra compile.
- **Exactness.** Per-row beam semantics are decode/beam.py's verbatim
  (two-stage 2K expansion, EOS banking, force-bank at budget, early-stop
  heuristic), so a row admitted mid-flight decodes IDENTICALLY to a solo
  ``beam_search`` of the same utterance (tests/test_continuous.py asserts
  bit-equal tokens, including rows re-admitted into a dirty slot).

Cost note: every step attends over the full allocated cache length
(rows sit at spread phases, so there is no shared prefix window to slice —
the windowed-prefix ladder fundamentally needs phase-aligned rows). At the
B=16 bucket that is the unwindowed bhjtd regime (~7.5 ms/step measured) vs
the aligned ladder's 5.3 — the price of segment-bounded admission and
early-exit row reuse; with real weights that EOS early, reuse wins it back.
"""

from __future__ import annotations

import logging
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass
from typing import Callable, Sequence

import numpy as np

from mocov2_whisper_flamingo_tpu.serving.engine import ServeResult, trim_at_eos

logger = logging.getLogger(__name__)

NEG_INF = -1e30
# admit_tick sentinel for free rows: far enough in the future that
# pos = (tick - FREE_TICK) * S + s stays negative for any realistic tick.
FREE_TICK = np.int32(2**30)


def init_state(decoder, *, capacity: int, beam_size: int, seg_steps: int,
               n_segments: int, enc_len: int, eos_id: int,
               cache_layout: str = "bhjtd") -> dict:
    """Device state for the continuous engine: per-layer self caches
    (phase-striped, never cleared between occupants), per-row cross caches,
    the physically-indexed ancestry tensor, per-row beam state, and the
    admission bookkeeping ([R] admit ticks + the scalar tick)."""
    import jax.numpy as jnp

    cfg = decoder.config
    r, k = capacity, beam_size
    l_ = seg_steps * n_segments
    dtype = decoder.precision.compute_dtype
    if cache_layout == "bhjtd":
        kv_shape = (r, cfg.n_heads, k, l_, cfg.head_dim)
    elif cache_layout == "rows":
        kv_shape = (r * k, l_, cfg.n_heads, cfg.head_dim)
    else:
        raise ValueError(f"unknown cache_layout {cache_layout!r}")
    caches = [
        {"self": {"k": jnp.zeros(kv_shape, dtype),
                  "v": jnp.zeros(kv_shape, dtype)},
         "cross": {"k": jnp.zeros((r, enc_len, cfg.n_heads, cfg.head_dim), dtype),
                   "v": jnp.zeros((r, enc_len, cfg.n_heads, cfg.head_dim), dtype)}}
        for _ in range(cfg.decoder_layers)
    ]
    eye = jnp.eye(k, dtype=jnp.float32)
    return {
        "caches": caches,
        "enc_valid": jnp.zeros((r, enc_len), bool),
        "anc": jnp.broadcast_to(eye[None, :, :, None], (r, k, k, l_)) + 0.0,
        "run_tokens": jnp.full((r, k, l_), eos_id, jnp.int32),
        "run_scores": jnp.zeros((r, k), jnp.float32),
        "pool_tokens": jnp.full((r, k, l_), eos_id, jnp.int32),
        "pool_scores": jnp.full((r, k), NEG_INF, jnp.float32),
        "heur_ok": jnp.zeros((r,), bool),
        "admit_tick": jnp.full((r,), FREE_TICK, jnp.int32),
        "tick": jnp.int32(0),
    }


def make_admit_fn(decoder, prefix_ids: Sequence[int], eos_id: int,
                  beam_size: int, max_len: int) -> Callable:
    """jitted ``admit(params, state, enc_out [1,T,D], enc_valid [1,T],
    row i32) -> state``: splice the utterance's cross K/V + validity into
    row ``row`` and reset that row's beam state. The row index is a traced
    scalar, so ONE compile serves every slot. The self cache and ancestry
    are NOT touched — stale slots are invisible behind the per-row
    written-since-admission mask (module docstring)."""
    import jax
    import jax.numpy as jnp

    from mocov2_whisper_flamingo_tpu.decode.streaming import _cross_caches

    k = beam_size
    n_prefix = len(prefix_ids)
    prefix = np.asarray(prefix_ids, np.int32)

    def admit(params, state, enc_out, enc_valid, row):
        dus = jax.lax.dynamic_update_slice
        cross = _cross_caches(decoder, params, enc_out)
        caches = []
        for layer, c in zip(state["caches"], cross):
            cr = layer["cross"]
            caches.append({"self": layer["self"], "cross": {
                "k": dus(cr["k"], c["k"].astype(cr["k"].dtype), (row, 0, 0, 0)),
                "v": dus(cr["v"], c["v"].astype(cr["v"].dtype), (row, 0, 0, 0)),
            }})
        tokens0 = jnp.full((1, k, max_len), eos_id, jnp.int32)
        tokens0 = tokens0.at[:, :, :n_prefix].set(prefix[None, None])
        scores0 = jnp.array([[0.0] + [NEG_INF] * (k - 1)], jnp.float32)
        return {
            **state,
            "caches": caches,
            "enc_valid": dus(state["enc_valid"],
                             enc_valid.astype(bool), (row, 0)),
            "run_tokens": dus(state["run_tokens"], tokens0, (row, 0, 0)),
            "run_scores": dus(state["run_scores"], scores0, (row, 0)),
            "pool_tokens": dus(state["pool_tokens"],
                               jnp.full((1, k, max_len), eos_id, jnp.int32),
                               (row, 0, 0)),
            "pool_scores": dus(state["pool_scores"],
                               jnp.full((1, k), NEG_INF, jnp.float32),
                               (row, 0)),
            "heur_ok": dus(state["heur_ok"], jnp.ones((1,), bool), (row,)),
            "admit_tick": dus(state["admit_tick"],
                              state["tick"][None], (row,)),
        }

    # Donate the state: admit only DUSes one row's slices — without
    # donation every admission copies the full ~300 MB cache tree
    # (measured 84 ms/row on v5e; donated it is slice-sized).
    return jax.jit(admit, donate_argnums=(1,))


def make_segment_fn(decoder, *, beam_size: int, seg_steps: int,
                    n_segments: int, n_prefix: int, eos_id: int,
                    length_penalty: float = 1.0) -> Callable:
    """jitted ``segment(params, state) -> state``: advance EVERY row by
    ``seg_steps`` of its own logical timeline (decode/beam.py body
    semantics per row, per-row phase over the shared physical stripe —
    module docstring)."""
    import jax
    import jax.numpy as jnp

    k = beam_size
    k2 = 2 * k
    s_len = seg_steps
    m = n_segments
    max_len = s_len * m
    lp = float(length_penalty)

    def segment(params, state):
        caches = state["caches"]
        anc = state["anc"]
        enc_valid = state["enc_valid"]
        admit_tick = state["admit_tick"]
        j = state["tick"]
        r = state["run_tokens"].shape[0]
        stripe = jnp.mod(j, m)
        base = stripe * s_len
        # Physical-slot geometry (static [L] arrays x traced scalars).
        q_idx = jnp.arange(max_len) // s_len     # stripe of each slot
        o_idx = jnp.arange(max_len) % s_len      # offset within its stripe
        d = jnp.mod(stripe - q_idx, m)           # segments since last write
        tick_written = j - d                     # [L]
        written_since = tick_written[None, :] >= admit_tick[:, None]  # [R, L]
        phase = j - admit_tick                   # [R] (negative sentinel = free)
        eye_k = jnp.eye(k, dtype=jnp.float32)
        arange_l = jnp.arange(max_len)

        def body(carry, s):
            (run_tokens, run_scores, pool_tokens, pool_scores, heur_ok,
             caches, anc) = carry
            w = base + s                          # shared physical write slot
            pos = phase * s_len + s               # [R] per-row logical position
            posc = jnp.clip(pos, 0, max_len - 1)
            is_pre = pos + 1 < n_prefix           # forced-prefix step
            live = (pos >= 0) & (pos + 1 <= max_len - 1)
            keep = is_pre | ~live                 # beam state frozen this step

            # Identity pin at the slot being written (beam.py pins i+1 after
            # composing; pinning at step START is the same invariant without
            # a stripe-wrap special case — the write rows ARE the current
            # beam indices, and this step's compose below re-maps slot w for
            # the newly selected beams).
            anc = jax.lax.dynamic_update_slice(
                anc, jnp.broadcast_to(eye_k[None, :, :, None],
                                      (r, k, k, 1)).astype(anc.dtype),
                (0, 0, 0, w))
            kv_valid = written_since & ((d > 0) | (o_idx <= s))[None, :]

            cur = jnp.take_along_axis(
                run_tokens, jnp.broadcast_to(posc[:, None, None], (r, k, 1)),
                axis=2)
            logits, caches = decoder.decode_step(
                params, cur.reshape(r * k, 1), caches, w,
                encoder_valid=enc_valid, ancestry=anc,
                positions=jnp.repeat(posc, k), self_kv_valid=kv_valid)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

            # decode/beam.py body verbatim, batched over R rows.
            s1, t1 = jax.lax.top_k(logp, k2)
            s1 = s1.reshape(r, k, k2)
            t1 = t1.reshape(r, k, k2)
            total1 = run_scores[..., None] + s1
            s2k, flat = jax.lax.top_k(total1.reshape(r, k * k2), k2)
            beam2k = flat // k2
            tok2k = jnp.take_along_axis(t1.reshape(r, k * k2), flat, axis=1
                                        ).astype(jnp.int32)
            hits = (tok2k == eos_id) | (pos[:, None] + 2 >= max_len)

            cand_tokens = jnp.take_along_axis(run_tokens, beam2k[..., None],
                                              axis=1)
            wr = jnp.clip(pos + 1, 0, max_len - 1)
            oh = (arange_l[None, :] == wr[:, None]) & live[:, None]  # [R, L]
            cand_tokens = jnp.where(oh[:, None, :], tok2k[..., None],
                                    cand_tokens)

            gen_len = jnp.maximum(
                (pos + 2 - n_prefix).astype(jnp.float32), 1.0)[:, None]
            bank = s2k / jnp.power(gen_len, lp)
            bank_ok = (hits & (jnp.arange(k2) < k)[None, :]
                       & (~keep)[:, None] & heur_ok[:, None])
            bank = jnp.where(bank_ok, bank, NEG_INF)
            merged_scores = jnp.concatenate([pool_scores, bank], axis=1)
            merged_tokens = jnp.concatenate([pool_tokens, cand_tokens], axis=1)
            pool_scores_new, pool_idx = jax.lax.top_k(merged_scores, k)
            pool_tokens_new = jnp.take_along_axis(
                merged_tokens, pool_idx[..., None], axis=1)

            run_s2k = s2k + hits * NEG_INF
            run_scores_new, sel = jax.lax.top_k(run_s2k, k)
            sel_beam = jnp.take_along_axis(beam2k, sel, axis=1)
            run_tokens_new = jnp.take_along_axis(cand_tokens, sel[..., None],
                                                 axis=1)

            # Frozen rows (prefix steps, budget-exhausted, free slots):
            # identity selection, state unchanged.
            sel_beam = jnp.where(keep[:, None], jnp.arange(k)[None], sel_beam)
            run_tokens = jnp.where(keep[:, None, None], run_tokens,
                                   run_tokens_new)
            run_scores = jnp.where(keep[:, None], run_scores, run_scores_new)
            pool_tokens = jnp.where(keep[:, None, None], pool_tokens,
                                    pool_tokens_new)
            pool_scores = jnp.where(keep[:, None], pool_scores,
                                    pool_scores_new)

            perm = (sel_beam[..., None] == jnp.arange(k)[None, None, :]
                    ).astype(anc.dtype)
            anc = jnp.einsum("bnm,bmjt->bnjt", perm, anc)

            best_possible = run_scores[:, 0] / jnp.power(gen_len[:, 0], lp)
            pool_done = jnp.all(pool_scores > NEG_INF / 2, axis=-1)
            heur_new = heur_ok & (~pool_done
                                  | (best_possible > jnp.min(pool_scores,
                                                             axis=-1)))
            heur_ok = jnp.where(keep, heur_ok, heur_new)
            return (run_tokens, run_scores, pool_tokens, pool_scores,
                    heur_ok, caches, anc), None

        carry = (state["run_tokens"], state["run_scores"],
                 state["pool_tokens"], state["pool_scores"],
                 state["heur_ok"], caches, anc)
        carry, _ = jax.lax.scan(body, carry, jnp.arange(s_len))
        (run_tokens, run_scores, pool_tokens, pool_scores, heur_ok,
         caches, anc) = carry
        return {
            **state,
            "caches": caches, "anc": anc,
            "run_tokens": run_tokens, "run_scores": run_scores,
            "pool_tokens": pool_tokens, "pool_scores": pool_scores,
            "heur_ok": heur_ok, "tick": j + 1,
        }

    return jax.jit(segment, donate_argnums=(1,))


@dataclass
class _Slot:
    future: Future
    t_enqueue: float
    t_admit: float
    admit_tick: int


class ContinuousEngine:
    """Request/response service over the segment program.

    ``encode(params, payloads: list[tuple]) -> (features [n, T, D],
    valid [n, T])``: the utterance encoder, called ONCE per admission
    boundary with every payload admitted at that boundary — implementations
    should batch (the AV builder below pads to power-of-two buckets) so
    admission encode amortizes like the whole-utterance engine's.

    The loop thread: admit queued requests into free rows -> dispatch one
    segment -> sync the [R] heuristic flags (the segment's natural
    completion sync) -> retire rows that exhausted their ``n_segments``
    budget or whose hypothesis pool froze (early exit — exact: frozen-pool
    steps are no-ops in decode/beam.py's semantics). Results resolve as
    ``ServeResult`` (queue_ms = enqueue -> admission, decode_ms =
    admission -> retirement, bucket = row capacity).
    """

    def __init__(self, decoder, params: dict, encode: Callable, *,
                 prefix_ids: Sequence[int], eos_id: int, enc_len: int,
                 capacity: int = 16, beam_size: int = 5,
                 seg_steps: int = 32, n_segments: int = 5,
                 length_penalty: float = 1.0, cache_layout: str = "bhjtd",
                 tokenizer=None, postprocess=None):
        self.decoder = decoder
        self.params = params
        self.encode = encode
        self.capacity = capacity
        self.n_segments = n_segments
        self.eos_id = eos_id
        self.prefix = [int(t) for t in prefix_ids]
        self.max_len = seg_steps * n_segments
        self._post = postprocess or (lambda row: (
            trim_at_eos(row, eos_id, len(self.prefix)),
            tokenizer.decode([int(t) for t in trim_at_eos(
                row, eos_id, len(self.prefix))[len(self.prefix):]])
            if tokenizer is not None else None))
        self.state = init_state(
            decoder, capacity=capacity, beam_size=beam_size,
            seg_steps=seg_steps, n_segments=n_segments, enc_len=enc_len,
            eos_id=eos_id, cache_layout=cache_layout)
        self._admit = make_admit_fn(decoder, self.prefix, eos_id, beam_size,
                                    self.max_len)
        self._segment = make_segment_fn(
            decoder, beam_size=beam_size, seg_steps=seg_steps,
            n_segments=n_segments, n_prefix=len(self.prefix), eos_id=eos_id,
            length_penalty=length_penalty)
        # One traced-index row slicer per encode-batch shape (a Python-int
        # slice like feats[i:i+1] compiles a NEW tiny program per index —
        # measured seconds each through a remote-tunnel TPU). Shape-
        # specialized per admission bucket; warmup() compiles every bucket
        # so no slice compile lands inside live traffic.
        import jax

        self._take_row = jax.jit(lambda f, v, i: (
            jax.lax.dynamic_slice_in_dim(f, i, 1, axis=0),
            jax.lax.dynamic_slice_in_dim(v, i, 1, axis=0)))
        self._tick = 0
        self._slots: dict[int, _Slot] = {}
        self._pending: list[tuple[tuple, Future, float]] = []
        self._lock = threading.Condition()
        self._running = True
        self._segments_run = 0
        self._thread = threading.Thread(target=self._loop,
                                        name="continuous-decode", daemon=True)
        self._thread.start()

    # -- client API -----------------------------------------------------------

    def submit(self, *payload) -> Future:
        fut: Future = Future()
        with self._lock:
            if not self._running:
                raise RuntimeError("engine is closed")
            self._pending.append((payload, fut, time.monotonic()))
            self._lock.notify()
        return fut

    def transcribe(self, *payload, timeout: float | None = None) -> ServeResult:
        return self.submit(*payload).result(timeout=timeout)

    def warmup(self, example_payload: tuple,
               encode_buckets: Sequence[int] = (1, 2, 4, 8, 16)) -> None:
        """Compile every program before live traffic: the encode at each
        admission bucket (boundary admissions are padded to powers of two),
        then one full decode of the example (admit + segment + readback).
        Through a remote-tunnel TPU an un-warmed bucket compile is 30 s-10
        min, which would otherwise land inside live traffic."""
        for b in encode_buckets:
            if b <= self.capacity:
                feats, valid = self.encode(self.params,
                                           [tuple(example_payload)] * b)
                # Compile the boundary row slicer at this bucket's shape too
                # (first measured live: a warm wave of 8 paid a multi-second
                # take_row[8] compile that stalled the next admission).
                self._take_row(feats, valid, np.int32(0))
        self.transcribe(*example_payload, timeout=1800)

    def stats(self) -> dict:
        with self._lock:
            return {"segments_run": self._segments_run,
                    "pending": len(self._pending),
                    "live_rows": len(self._slots)}

    def close(self) -> None:
        with self._lock:
            self._running = False
            self._lock.notify_all()
        self._thread.join(timeout=60)
        with self._lock:
            for _, fut, _ in self._pending:
                fut.set_exception(RuntimeError("engine closed"))
            for slot in self._slots.values():
                slot.future.set_exception(RuntimeError("engine closed"))
            self._pending.clear()
            self._slots.clear()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- decode loop ------------------------------------------------------------

    def _loop(self) -> None:
        take_row = self._take_row
        while True:
            with self._lock:
                while self._running and not self._pending and not self._slots:
                    self._lock.wait()
                if not self._running:
                    return
                # Admission plan under the lock; device work outside it.
                free = [i for i in range(self.capacity) if i not in self._slots]
                to_admit = []
                while self._pending and free:
                    payload, fut, t_enq = self._pending.pop(0)
                    to_admit.append((free.pop(0), payload, fut, t_enq))
            try:
                if to_admit:
                    feats, valid = self.encode(
                        self.params, [p for _, p, _, _ in to_admit])
                    for i, (row, _, fut, t_enq) in enumerate(to_admit):
                        f_i, v_i = take_row(feats, valid, np.int32(i))
                        self.state = self._admit(
                            self.params, self.state, f_i, v_i, np.int32(row))
                        with self._lock:
                            self._slots[row] = _Slot(
                                fut, t_enq, time.monotonic(), self._tick)
                self.state = self._segment(self.params, self.state)
                self._tick += 1
                self._segments_run += 1
                heur = np.asarray(self.state["heur_ok"])  # segment sync
            except Exception as e:  # fail everything in flight, keep serving
                logger.exception("continuous decode segment failed")
                with self._lock:
                    for slot in self._slots.values():
                        slot.future.set_exception(e)
                    self._slots.clear()
                continue
            done_rows = []
            with self._lock:
                for row, slot in list(self._slots.items()):
                    phase = self._tick - slot.admit_tick
                    if phase >= self.n_segments or not heur[row]:
                        done_rows.append((row, slot))
                        del self._slots[row]
            if done_rows:
                # ONE host transfer for every retirement this boundary
                # ([R, K, L] int32 is ~50 KB; per-row device indexing
                # compiles a new slice program per row index — measured
                # 5 s each through the tunnel).
                pool = np.asarray(self.state["pool_tokens"])
            for row, slot in done_rows:
                try:
                    toks, text = self._post(pool[row, 0])
                    now = time.monotonic()
                    slot.future.set_result(ServeResult(
                        tokens=toks, text=text,
                        queue_ms=(slot.t_admit - slot.t_enqueue) * 1e3,
                        decode_ms=(now - slot.t_admit) * 1e3,
                        total_ms=(now - slot.t_enqueue) * 1e3,
                        bucket=self.capacity))
                except Exception as e:
                    slot.future.set_exception(e)


def make_continuous_av_engine(
    net,
    params: dict,
    prefix_ids: Sequence[int],
    tokenizer=None,
    beam_size: int = 5,
    max_len: int = 160,
    eos_id: int = 50257,
    capacity: int = 16,
    seg_steps: int = 32,
    weight_quant: str | None = None,
    video_resize: int = 64,
    cache_layout: str = "bhjtd",
) -> ContinuousEngine:
    """Continuous-batching engine over ``models.av_whisper.AVWhisperNet``
    (same per-request payload tuple as ``make_av_engine``). ``max_len``
    must be a multiple of ``seg_steps`` (the segment grid)."""
    import jax

    if max_len % seg_steps:
        raise ValueError(f"max_len={max_len} must be a multiple of "
                         f"seg_steps={seg_steps}")
    dec_params = net._decode_params(params, weight_quant=weight_quant)

    @jax.jit
    def _encode(p, batch):
        from mocov2_whisper_flamingo_tpu.ops.video import eval_video_pipeline

        audio, audio_mask, video_u8, video_mask, video_len = batch
        video = eval_video_pipeline(video_u8, resize=video_resize)
        return net.encode(p, (audio, audio_mask, video, video_mask,
                              video_len))

    def encode(_dec_params, payloads):
        # Pad the boundary's admissions to a power-of-two bucket (bounded
        # compile set: one encode program per bucket) and slice off the
        # pads — exact, rows are independent (serving/engine.py pad_rows).
        # The engine hands us its DECODER param tree; the AV encoder needs
        # the full net tree, closed over here (explicit jit arg keeps the
        # weights shared device buffers, not executable constants).
        from mocov2_whisper_flamingo_tpu.serving.engine import pad_rows

        n = len(payloads)
        bucket = 1
        while bucket < n:
            bucket *= 2
        batch = jax.device_put(pad_rows(payloads, bucket))
        feats, valid = _encode(params, batch)
        return feats[:n], valid[:n]

    # Probe the encoder feature length once (static): the AV trunk's fused
    # stream is min(audio 1500, video T) long.
    import jax.numpy as jnp

    enc_len = jax.eval_shape(
        lambda p, b: _encode(p, b)[0],
        jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params),
        (jnp.zeros((1, 3000, 80), jnp.float32), jnp.zeros((1, 3000), bool),
         jnp.zeros((1, 400, 3, 88, 88), jnp.uint8), jnp.zeros((1, 400), bool),
         jnp.zeros((1,), jnp.int32))).shape[1]

    return ContinuousEngine(
        net.decoder, dec_params, encode, prefix_ids=prefix_ids,
        eos_id=eos_id, enc_len=enc_len, capacity=capacity,
        beam_size=beam_size, seg_steps=seg_steps,
        n_segments=max_len // seg_steps, cache_layout=cache_layout,
        tokenizer=tokenizer)
