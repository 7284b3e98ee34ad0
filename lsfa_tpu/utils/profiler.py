"""Throughput + phase timing, with optional device profiling.

Behavioral targets: Speedometer (dff_rfcn/core/callback.py:19-51 —
samples/sec every `frequent` batches) and the data/net/post per-frame
breakdown logged by pred_eval (core/tester.py:237-295).

TPU addition: `trace()` wraps a region with jax.profiler for XLA-level
traces (the reference had no profiler integration, SURVEY.md section 5).
"""

from __future__ import annotations

import contextlib
import time


class Speedometer:
    def __init__(self, batch_size: int, frequent: int = 20, logger=None):
        self.batch_size = batch_size
        self.frequent = frequent
        self.logger = logger
        self._t0 = None
        self._count = 0

    def __call__(self, step: int, metrics: dict | None = None):
        self._count += 1
        if self._t0 is None:
            self._t0 = time.perf_counter()
            self._count = 0
            return
        if self._count % self.frequent == 0:
            dt = time.perf_counter() - self._t0
            speed = self.frequent * self.batch_size / dt
            msg = f"step [{step}]\tspeed: {speed:.2f} samples/sec"
            if metrics:
                msg += "\t" + "\t".join(
                    f"{k}={float(v):.5f}" for k, v in metrics.items())
            (self.logger.info if self.logger else print)(msg)
            self._t0 = time.perf_counter()


class PhaseTimer:
    """data/net/post phase accumulator (the pred_eval breakdown)."""

    def __init__(self):
        self.totals: dict = {}
        self.count = 0

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        yield
        self.totals[name] = self.totals.get(name, 0.0) + time.perf_counter() - t0

    def tick(self):
        self.count += 1

    def summary(self) -> str:
        if not self.count:
            return "no frames"
        parts = [f"{k} {v / self.count * 1e3:.1f}ms" for k, v in self.totals.items()]
        return f"per-frame: {' '.join(parts)} over {self.count} frames"


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/lsfa_tpu_trace"):
    """XLA-level device profiling around a region."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
