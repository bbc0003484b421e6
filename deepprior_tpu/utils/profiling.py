"""Profiling/tracing hooks.

The reference exposes print-based timing only (SURVEY.md §5): ms/frame in
computeOutput (netbase.py:308-310), per-stage ms in the realtime pipeline,
epochs/sec in the trainer.  This module preserves that surface and adds
proper `jax.profiler` traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional


class StageTimer:
    """Named stage timings with running averages (the fps/ms surface)."""

    def __init__(self, window: int = 100):
        self.window = window
        self._hist: Dict[str, list] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            h = self._hist.setdefault(name, [])
            h.append(time.perf_counter() - t0)
            del h[: -self.window]

    def ms(self, name: str) -> float:
        h = self._hist.get(name, [])
        return 1000.0 * sum(h) / len(h) if h else 0.0

    def fps(self, name: str) -> float:
        ms = self.ms(name)
        return 1000.0 / ms if ms > 0 else 0.0

    def report(self) -> str:
        return " ".join(f"{k}={self.ms(k):.2f}ms" for k in sorted(self._hist))


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/jax-trace"):
    """jax.profiler trace around a region — view in TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def time_batched_inference(fn: Callable, args, iters: int = 20) -> float:
    """ms/batch for a jitted function (computeOutput(timeit=True) analog,
    netbase.py:308-310).  Blocks on the result each iteration."""
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return 1000.0 * (time.perf_counter() - t0) / iters
