"""Tracing / profiling utilities.

The reference's only observability is wall-clock ``time.time()`` spans and
tqdm bars (SURVEY.md §5: performance.py:136-144, adil.py:162). This module
adds the TPU-native equivalents:

- ``annotate(name)``: a ``jax.profiler.TraceAnnotation`` context so training
  phases show up named in XLA profiler traces;
- ``trace(dir)``: capture a full profiler trace viewable in TensorBoard /
  Perfetto;
- ``StepTimer``: blocking per-step wall-clock statistics (compile time
  excluded after the first step) for throughput reporting.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


def annotate(name: str):
    """Named span visible in device traces (and a no-op without a profiler)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace into ``log_dir`` (None -> no-op)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step statistics with warmup (compile) exclusion.

    Usage::

        timer = StepTimer(warmup=1)
        for batch in data:
            with timer.step():
                out = train_step(...)
                jax.block_until_ready(out)
        print(timer.summary())
    """

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times: List[float] = []
        self._count = 0

    @contextlib.contextmanager
    def step(self):
        start = time.perf_counter()
        yield
        elapsed = time.perf_counter() - start
        self._count += 1
        if self._count > self.warmup:
            self.times.append(elapsed)

    def record(self, elapsed: float) -> None:
        """Record an externally measured step duration (same warmup rule).

        Used by pipelined loops where a ``with timer.step()`` block would
        time only the async dispatch: the caller measures completion-to-
        completion deltas instead and feeds them here.
        """
        self._count += 1
        if self._count > self.warmup:
            self.times.append(elapsed)

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else float("nan")

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {"steps": 0, "mean_s": float("nan"),
                    "steps_per_sec": float("nan")}
        return {
            "steps": len(self.times),
            "mean_s": self.mean,
            "min_s": min(self.times),
            "max_s": max(self.times),
            "steps_per_sec": 1.0 / self.mean,
        }
