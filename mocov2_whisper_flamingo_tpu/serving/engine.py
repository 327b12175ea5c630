"""Online serving engine: dynamic batching over the compiled decode paths.

New capability (the reference has no serving surface; its inference is the
Lightning eval loop, reference: train.py:172-216). This engine turns the
jitted beam-decode programs into a request/response service:

    requests --> FIFO queue --> micro-batcher (static buckets, deadline)
             --> pad + stack --> jitted decode dispatch  (dispatch thread)
             --> device completes --> per-row futures     (completion thread)

TPU-first structure:

- **Two-stage pipeline.** JAX dispatch is asynchronous: the dispatch thread
  enqueues the compiled program and immediately returns to batching the
  next requests, while the completion thread blocks on the in-flight
  result. Host-side collate/tokenize therefore overlaps device decode —
  the same overlap the training loader gets from prefetching.
- **Bounded compile set.** Batch shapes come from the ``MicroBatcher``
  bucket ladder only; every other per-row dimension is canonicalized to a
  static shape before submit. ``warmup()`` pre-compiles every bucket so
  live traffic never eats a 30 s remote-tunnel compile.
- **Row independence.** Decode is mathematically per-row (beam search
  carries no cross-row state), so padding rows with zeros and slicing them
  off after the dispatch is exact, not approximate (tested in
  tests/test_serving.py against single-request decodes).
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Any, Callable, Sequence

import numpy as np

from mocov2_whisper_flamingo_tpu.serving.batcher import (
    DEFAULT_BUCKETS, MicroBatcher)


@dataclass
class ServeResult:
    """Per-request result: raw token row plus (optional) text and timing."""

    tokens: np.ndarray
    text: str | None
    queue_ms: float   # enqueue -> dispatch
    decode_ms: float  # dispatch -> device result ready (shared by the batch)
    total_ms: float   # enqueue -> future resolved
    bucket: int


@dataclass
class _Pending:
    payload: tuple
    future: Future
    t_enqueue: float


@dataclass
class _InFlight:
    rows: list  # of _Pending
    device_out: Any
    bucket: int
    t_dispatch: float


def pad_rows(payloads: Sequence[tuple], bucket: int) -> tuple:
    """Stack per-request payload tuples into one batch tree, zero-padding
    to ``bucket`` rows. Exact: pad rows are sliced off after decode.

    Rows may be host numpy (stacked on host, transferred by the engine's
    decode wrapper) or device ``jax.Array``s (stacked ON DEVICE via jnp —
    the zero-copy path for co-located pipelines whose payloads already
    live in HBM, e.g. a streaming front-end feeding the decoder)."""
    n = len(payloads)
    on_device = any(
        hasattr(x, "addressable_shards") for x in payloads[0])
    if on_device:
        import jax.numpy as jnp

        xp, stack, concat = jnp, jnp.stack, jnp.concatenate
    else:
        xp, stack, concat = np, np.stack, np.concatenate
    leaves = []
    for parts in zip(*payloads):
        stacked = stack([xp.asarray(p) for p in parts])
        if n < bucket:
            pad = xp.zeros((bucket - n,) + stacked.shape[1:], stacked.dtype)
            stacked = concat([stacked, pad])
        leaves.append(stacked)
    return tuple(leaves)


class ServingEngine:
    """Generic batched-decode service.

    ``decode_batch(batch_tree) -> tokens``: a jit-compiled function over a
    stacked payload tree (one leaf per payload element, leading batch dim =
    bucket) returning per-row token ids. jit's shape-keyed cache gives one
    compile per bucket automatically.

    ``postprocess(tokens_row) -> (tokens_row, text|None)``: host-side
    per-row finishing (EOS trim, tokenizer decode); runs on the completion
    thread so it overlaps the next device dispatch.
    """

    def __init__(
        self,
        decode_batch: Callable[[tuple], Any],
        buckets: Sequence[int] = DEFAULT_BUCKETS,
        max_wait_s: float = 0.005,
        postprocess: Callable[[np.ndarray], tuple] | None = None,
        max_queue: int = 1024,
    ):
        self._decode = decode_batch
        self._batcher = MicroBatcher(tuple(buckets), max_wait_s)
        self._post = postprocess or (lambda row: (row, None))
        self._pending: list[_Pending] = []
        self._lock = threading.Condition()
        self._inflight: queue.Queue[_InFlight | None] = queue.Queue(maxsize=4)
        self._running = True
        self._max_queue = max_queue
        self._stats_lock = threading.Lock()
        self._n_requests = 0
        self._n_batches = 0
        self._bucket_counts: dict[int, int] = {}
        self._latency_ms: list[float] = []  # bounded ring, see _record
        self._compiled: set[int] = set()
        self._dispatcher = threading.Thread(
            target=self._dispatch_loop, name="serve-dispatch", daemon=True)
        self._completer = threading.Thread(
            target=self._complete_loop, name="serve-complete", daemon=True)
        self._dispatcher.start()
        self._completer.start()

    # -- client API ---------------------------------------------------------------

    def submit(self, *payload) -> Future:
        """Enqueue one request (payload = per-row arrays matching the
        decode_batch tree). Returns a Future resolving to ``ServeResult``."""
        fut: Future = Future()
        with self._lock:
            if not self._running:
                raise RuntimeError("engine is closed")
            if len(self._pending) >= self._max_queue:
                raise RuntimeError(
                    f"serving queue full ({self._max_queue}); shed load")
            self._pending.append(_Pending(payload, fut, time.monotonic()))
            self._lock.notify()
        return fut

    def transcribe(self, *payload, timeout: float | None = None) -> ServeResult:
        """Blocking convenience wrapper around ``submit``."""
        return self.submit(*payload).result(timeout=timeout)

    def warmup(self, example_payload: tuple,
               buckets: Sequence[int] | None = None) -> None:
        """Pre-compile every bucket with a replicated example row so live
        traffic never waits on an XLA compile (30 s - 10 min through the
        remote TPU tunnel)."""
        for b in sorted(buckets or self._batcher.buckets):
            batch = pad_rows([tuple(example_payload)] * b, b)
            out = self._decode(batch)
            np.asarray(out)  # block
            with self._stats_lock:
                self._compiled.add(b)

    def stats(self) -> dict:
        with self._stats_lock:
            lat = sorted(self._latency_ms)
            pct = (lambda q: lat[min(len(lat) - 1, int(q * len(lat)))]
                   if lat else None)
            return {
                "requests": self._n_requests,
                "batches": self._n_batches,
                "bucket_counts": dict(self._bucket_counts),
                "compiled_buckets": sorted(self._compiled),
                "pending": len(self._pending),
                "latency_ms": {"p50": pct(0.50), "p90": pct(0.90),
                               "p99": pct(0.99)},
            }

    def close(self) -> None:
        with self._lock:
            self._running = False
            self._lock.notify_all()
        self._dispatcher.join(timeout=30)
        self._inflight.put(None)
        self._completer.join(timeout=30)
        with self._lock:
            for p in self._pending:
                p.future.set_exception(RuntimeError("engine closed"))
            self._pending.clear()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- pipeline threads -----------------------------------------------------------

    def _dispatch_loop(self) -> None:
        while True:
            with self._lock:
                while self._running:
                    now = time.monotonic()
                    plan = self._batcher.plan(
                        [p.t_enqueue for p in self._pending], now)
                    if plan is not None:
                        break
                    deadline = self._batcher.next_deadline(
                        [p.t_enqueue for p in self._pending])
                    self._lock.wait(timeout=None if deadline is None
                                    else max(deadline - now, 1e-4))
                if not self._running:
                    return
                rows = self._pending[: plan.count]
                del self._pending[: plan.count]
            batch = pad_rows([r.payload for r in rows], plan.bucket)
            t0 = time.monotonic()
            try:
                out = self._decode(batch)  # async JAX dispatch
            except Exception as e:  # compile/dispatch failure -> fail the rows
                for r in rows:
                    r.future.set_exception(e)
                continue
            with self._stats_lock:
                self._compiled.add(plan.bucket)
            self._inflight.put(_InFlight(rows, out, plan.bucket, t0))

    def _complete_loop(self) -> None:
        while True:
            item = self._inflight.get()
            if item is None:
                return
            try:
                tokens = np.asarray(item.device_out)  # blocks on the device
            except Exception as e:
                for r in item.rows:
                    r.future.set_exception(e)
                continue
            t_done = time.monotonic()
            decode_ms = (t_done - item.t_dispatch) * 1e3
            with self._stats_lock:
                self._n_batches += 1
                self._bucket_counts[item.bucket] = (
                    self._bucket_counts.get(item.bucket, 0) + 1)
            for i, r in enumerate(item.rows):
                try:
                    row, text = self._post(tokens[i])
                    res = ServeResult(
                        tokens=row, text=text,
                        queue_ms=(item.t_dispatch - r.t_enqueue) * 1e3,
                        decode_ms=decode_ms,
                        total_ms=(time.monotonic() - r.t_enqueue) * 1e3,
                        bucket=item.bucket)
                    r.future.set_result(res)
                    self._record(res.total_ms)
                except Exception as e:
                    r.future.set_exception(e)

    def _record(self, total_ms: float) -> None:
        with self._stats_lock:
            self._n_requests += 1
            self._latency_ms.append(total_ms)
            if len(self._latency_ms) > 4096:
                del self._latency_ms[:2048]


# -- model-specific engine constructors --------------------------------------------


def trim_at_eos(tokens: np.ndarray, eos_id: int, n_prefix: int) -> np.ndarray:
    """Cut a decode row at (and excluding) the first EOS past the prefix."""
    hits = np.nonzero(tokens[n_prefix:] == eos_id)[0]
    return tokens[: n_prefix + int(hits[0])] if hits.size else tokens


def make_audio_engine(
    asr,
    params: dict,
    prefix_ids: Sequence[int],
    tokenizer=None,
    beam_size: int = 5,
    max_len: int = 224,
    eos_id: int = 50257,
    seconds: float = 30.0,
    sample_rate: int = 16_000,
    logit_rules=None,
    weight_quant: str | None = None,
    buckets: Sequence[int] = DEFAULT_BUCKETS,
    max_wait_s: float = 0.005,
) -> ServingEngine:
    """Serving engine over ``models.asr.WhisperASR`` (audio-only, <=30 s
    clips; payload = one float32 waveform row, canonicalized by
    ``canonical_wav``). Text output when a tokenizer is given."""
    import jax

    n_samples = int(seconds * sample_rate)
    prefix = [int(t) for t in prefix_ids]

    # params as an explicit jit arg (not a closure constant) so the weight
    # buffers stay shared device arrays instead of executable-embedded
    # constants.
    @jax.jit
    def _decode(p, wav):
        return asr.transcribe_tokens(
            p, wav, prefix, beam_size=beam_size, max_len=max_len,
            eos_id=eos_id, pad_to=n_samples, logit_rules=logit_rules,
            weight_quant=weight_quant)

    def decode_batch(batch):
        # Explicit async device_put: handing numpy args straight to a
        # jitted call transfers them on the dispatch's slow path (measured
        # 7.6 s vs 1.6 s per B=16 AV batch through the axon tunnel);
        # device_put streams the bytes contiguously and returns immediately,
        # so the dispatch thread keeps overlapping with device decode.
        return _decode(params, jax.device_put(batch)[0])

    def post(row):
        row = trim_at_eos(row, eos_id, len(prefix))
        text = None
        if tokenizer is not None:
            text = tokenizer.decode([int(t) for t in row[len(prefix):]])
        return row, text

    return ServingEngine(decode_batch, buckets=buckets,
                         max_wait_s=max_wait_s, postprocess=post)


def canonical_wav(wav: np.ndarray, seconds: float = 30.0,
                  sample_rate: int = 16_000) -> np.ndarray:
    """Pad/trim a waveform to the engine's static length (zero-pad tail,
    matching whisper's pad-to-30 s front end)."""
    n = int(seconds * sample_rate)
    wav = np.asarray(wav, np.float32).reshape(-1)[:n]
    if wav.shape[0] < n:
        wav = np.pad(wav, (0, n - wav.shape[0]))
    return wav


def make_av_engine(
    net,
    params: dict,
    prefix_ids: Sequence[int],
    tokenizer=None,
    beam_size: int = 5,
    max_len: int = 224,
    eos_id: int = 50257,
    logit_rules=None,
    cache_quant: str | None = None,
    weight_quant: str | None = None,
    buckets: Sequence[int] = DEFAULT_BUCKETS,
    max_wait_s: float = 0.005,
    video_resize: int = 64,
    read_windows: Sequence[int] | None = "auto",
    cache_layout: str = "auto",
) -> ServingEngine:
    """Serving engine over ``models.av_whisper.AVWhisperNet``.

    Payload per request (static shapes, the bench/eval convention):
      mel [3000, 80] f32, audio_mask [3000] bool, video uint8
      [T, 3, H, W] raw ROI frames (device-side resize/normalize, the
      round-3 uint8-shipping path), video_mask [T] bool, video_len i32.

    ``read_windows="auto"`` (default): windowed-prefix decode scan with the
    batch-aware default ladder, chosen PER BUCKET at trace time (fifths at
    B>=16, thirds below — decode/beam.py ``default_read_windows``) —
    bit-identical tokens, measured -39%/step at the wide buckets where the
    per-step cache write loses in-place aliasing and -3.4% at B=4
    (BASELINE.md round-4/5 rows). Pass None for the single full-window
    scan, or an explicit ladder for every bucket.

    ``cache_layout="auto"`` (default): per-BUCKET self-cache layout — jit
    traces one program per bucket shape, so the traced-time batch size
    picks einsum-native "bhjtd" caches at B>=16 (round-5 on-chip A/B:
    6.25 -> 5.34 ms/step with the fifths ladder, tokens exact) and "rows"
    below (rows wins at B=4/8 where DUS aliasing holds). Pass "rows" or
    "bhjtd" to force one layout for every bucket.
    """
    import jax

    from mocov2_whisper_flamingo_tpu.decode.beam import default_read_windows

    prefix = [int(t) for t in prefix_ids]

    @jax.jit
    def _decode(p, batch):
        from mocov2_whisper_flamingo_tpu.ops.video import eval_video_pipeline

        audio, audio_mask, video_u8, video_mask, video_len = batch
        video = eval_video_pipeline(video_u8, resize=video_resize)
        # Static per-trace choices: jit compiles one program per bucket
        # shape, so the traced batch size picks the bucket's ladder/layout.
        windows = read_windows
        if windows == "auto":
            windows = default_read_windows(max_len, batch=audio.shape[0])
        windows = tuple(windows) if windows else None
        layout = cache_layout
        if layout == "auto":
            layout = "bhjtd" if audio.shape[0] >= 16 else "rows"
        return net.beam(
            p, (audio, audio_mask, video, video_mask, video_len),
            prefix, beam_size=beam_size, max_len=max_len, eos_id=eos_id,
            logit_rules=logit_rules, cache_quant=cache_quant,
            weight_quant=weight_quant, read_windows=windows,
            cache_layout=layout).sequences[:, 0]  # top hypothesis/row

    def decode_batch(batch):
        # Async device_put before the jitted call — see make_audio_engine.
        return _decode(params, jax.device_put(batch))

    def post(row):
        row = trim_at_eos(row, eos_id, len(prefix))
        text = None
        if tokenizer is not None:
            text = tokenizer.decode([int(t) for t in row[len(prefix):]])
        return row, text

    return ServingEngine(decode_batch, buckets=buckets,
                         max_wait_s=max_wait_s, postprocess=post)
