"""Tracing / profiling helpers.

The reference's only tracing was opt-in shape logging via ``enable_logging``
flags and wall-clock prints (SURVEY.md §5.1 — no torch profiler, no NVTX).
TPU-native equivalent: ``jax.profiler`` traces viewable in TensorBoard /
Perfetto, plus named trace annotations around the hot phases.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace for the enclosed block:

        with profiling.trace("logs/profile"):
            train_step(...)

    Open the resulting trace in TensorBoard's profile plugin or Perfetto.
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region that shows up on the trace timeline."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Wall-clock step timing with an EMA, for throughput logs (the
    TPU-side replacement for the reference's test.py timing prints)."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema: float | None = None
        self._t0: float | None = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.ema = dt if self.ema is None else (1 - self.alpha) * self.ema + self.alpha * dt

    @property
    def seconds(self) -> float:
        return self.ema or 0.0


def device_memory_report() -> dict:
    """Per-device memory stats (bytes in use / peak), where the backend
    exposes them (TPU does)."""
    import jax

    report = {}
    for dev in jax.local_devices():
        stats = dev.memory_stats() or {}
        report[str(dev)] = {
            "bytes_in_use": stats.get("bytes_in_use", 0),
            "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
            "bytes_limit": stats.get("bytes_limit", 0),
        }
    return report
