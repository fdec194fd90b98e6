"""Profiling & observability.

The reference's story is manual wall-clock tables in the final report and a
per-block ``std::cerr`` trace (Final Report p.10-11; project.cpp:290).
Here:

* ``trace(logdir)`` — context manager around the JAX profiler; view the
  result with TensorBoard/xprof (device timelines, fusion costs).
* ``StageTimer`` — lightweight named wall-clock accumulator for host-side
  stage breakdowns (blocks until device results are ready, so timings are
  honest under async dispatch).
* ``Throughput`` — running samples/s + x-real-time meter used by the CLI.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler.trace wrapper (TensorBoard-compatible)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulate wall-clock per named stage; blocks on device outputs."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        t0 = time.perf_counter()
        yield
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def time_fn(self, name: str, fn, *args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1
        return out

    def report(self) -> str:
        lines = []
        for name, tot in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:<30} {tot * 1e3:9.2f} ms total "
                         f"({tot / n * 1e3:8.3f} ms/call, {n} calls)")
        return "\n".join(lines)


class Throughput:
    """Running IQ-samples/s and x-real-time meter."""

    def __init__(self, rf_fs: float, ema: float = 0.9):
        self.rf_fs = rf_fs
        self.ema = ema
        self.rate: Optional[float] = None
        self._last: Optional[float] = None

    def update(self, iq_samples: int) -> float:
        now = time.perf_counter()
        if self._last is not None:
            inst = iq_samples / (now - self._last)
            self.rate = (inst if self.rate is None
                         else self.ema * self.rate + (1 - self.ema) * inst)
        self._last = now
        return self.rate or 0.0

    @property
    def x_realtime(self) -> float:
        return (self.rate or 0.0) / self.rf_fs
