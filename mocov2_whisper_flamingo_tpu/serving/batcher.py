"""Dynamic micro-batching policy for online serving — pure and deterministic.

The reference has no serving story at all (its only inference surfaces are
the Lightning validation loop and the bit-rotted ONNX export, reference:
train.py:172-216, export_model.py); this subsystem is new capability built
for the production-serving north star.

TPU-first constraints shape the policy:

- **Static shape buckets.** Every distinct batch shape is a separate XLA
  compilation (30 s - 10 min each through a remote tunnel), so the batcher
  quantizes batch sizes to a small fixed ladder (default powers of two) and
  pads the tail. The compile set is bounded by ``len(buckets)`` forever.
- **Batch = throughput.** A single v5e decode step at B=4 is op-count-bound
  (BASELINE.md); filling wider buckets amortizes weight/cache traffic, so
  the policy waits up to ``max_wait_s`` for co-batchable requests before
  dispatching a partial bucket.
- **No data-dependent shapes.** Per-row payloads are canonicalized to fixed
  shapes (30 s audio / max_frames video) before they reach the batcher, so
  the only variable is the row count this module quantizes.

The policy itself is plain host Python (it runs between device dispatches)
and is kept pure — ``plan(...)`` is a function of (pending ages, now) — so
it can be unit-tested without threads or clocks.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence


DEFAULT_BUCKETS = (1, 2, 4, 8, 16)


def quantize_bucket(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= n (largest bucket if n overflows the ladder)."""
    if n <= 0:
        raise ValueError(f"need a positive row count, got {n}")
    for b in sorted(buckets):
        if b >= n:
            return b
    return max(buckets)


@dataclass(frozen=True)
class Plan:
    """One dispatch decision: take ``count`` requests, pad to ``bucket``."""

    count: int
    bucket: int


@dataclass(frozen=True)
class MicroBatcher:
    """Deadline-or-full micro-batching policy.

    Dispatch fires when either (a) a full largest bucket is waiting, or
    (b) the oldest pending request has waited ``max_wait_s``. Otherwise the
    caller should sleep until the oldest request's deadline and re-plan.
    ``max_wait_s=0`` degenerates to dispatch-immediately (lowest latency,
    smallest batches).
    """

    buckets: tuple = DEFAULT_BUCKETS
    max_wait_s: float = 0.005

    def __post_init__(self):
        if not self.buckets or min(self.buckets) < 1:
            raise ValueError(f"bad bucket ladder {self.buckets!r}")

    @property
    def max_bucket(self) -> int:
        return max(self.buckets)

    def plan(self, enqueue_times: Sequence[float], now: float) -> Plan | None:
        """Decide on a dispatch given the pending queue (FIFO enqueue
        timestamps, oldest first). Returns a ``Plan`` or ``None`` (keep
        waiting; next deadline is ``enqueue_times[0] + max_wait_s``)."""
        n = len(enqueue_times)
        if n == 0:
            return None
        if n >= self.max_bucket:
            return Plan(self.max_bucket, self.max_bucket)
        if now - enqueue_times[0] >= self.max_wait_s:
            return Plan(n, quantize_bucket(n, self.buckets))
        return None

    def next_deadline(self, enqueue_times: Sequence[float]) -> float | None:
        """Absolute time at which the oldest pending request forces a
        dispatch (None when the queue is empty)."""
        if not enqueue_times:
            return None
        return enqueue_times[0] + self.max_wait_s
