"""Tracing / profiling.

The reference has no profiler (SURVEY §5.1 — wall-clock prints only).
Here: jax.profiler trace capture around training sections plus simple
step-time statistics."""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/ampnet_trace", enabled: bool = True):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTraceCapture:
    """Bounded jax.profiler capture inside a training loop.

    Traces optimizer steps [skip, skip + num_steps) — skipping step 0 so
    the compile isn't in the trace — and writes a TensorBoard/Perfetto
    trace to log_dir. Wired to TrainConfig.profile_steps (the reference
    has no profiler at all, SURVEY §5.1).
    """

    def __init__(self, log_dir: str, num_steps: int, skip: int = 1):
        self.log_dir = log_dir
        self.start_at = skip
        self.stop_at = skip + num_steps
        self._seen = 0
        self._active = False

    def before_step(self):
        if self._seen == self.start_at and not self._active:
            jax.profiler.start_trace(self.log_dir)
            self._active = True

    def after_step(self, block_on=None):
        self._seen += 1
        if self._active:
            if block_on is not None:
                # sync so the traced window holds whole device steps
                jax.block_until_ready(block_on)
            if self._seen >= self.stop_at:
                jax.profiler.stop_trace()
                self._active = False

    def close(self):
        if self._active:  # loop ended before stop_at steps ran
            jax.profiler.stop_trace()
            self._active = False


class StepTimer:
    """Per-step wall-clock stats (mean/p50/p99) for loop instrumentation."""

    def __init__(self):
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        if self._t0 is not None:
            self.times.append(time.perf_counter() - self._t0)
            self._t0 = None

    @contextlib.contextmanager
    def step(self):
        self.start()
        try:
            yield
        finally:
            self.stop()

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        ts = sorted(self.times)
        n = len(ts)
        return {
            "steps": n,
            "mean_s": sum(ts) / n,
            "p50_s": ts[n // 2],
            "p99_s": ts[min(n - 1, int(n * 0.99))],
            "total_s": sum(ts),
        }
