"""Profiling and timing utilities.

Replaces the reference's observability odds and ends — the TF chrome-trace
``Timeliner`` (``phi/tf/profiling.py:6-37``), ad-hoc ``time.time`` prints,
and the ``Printer`` timing logger (``smoke/ddpm/utils.py:154-225``) — with
``jax.profiler`` traces (viewable in Perfetto/TensorBoard) and a simple
section timer.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax

__all__ = ["trace", "Timer", "device_memory_stats"]


@contextlib.contextmanager
def trace(logdir: str, *, host_tracer_level: int = 2):
    """Capture a device+host profile into ``logdir`` (Perfetto-compatible).

        with profiling.trace("/tmp/trace"):
            step(...)  # traced
    """
    jax.profiler.start_trace(logdir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Named-section wall-clock accumulator (Printer equivalent)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str, *, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        lines = []
        for name, tot in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name}: total {tot:.3f}s count {n} mean {tot / n * 1e3:.1f}ms")
        return "\n".join(lines)


def device_memory_stats() -> Optional[dict]:
    """Per-device HBM usage if the backend exposes it."""
    try:
        dev = jax.devices()[0]
        return dev.memory_stats()
    except Exception:
        return None
