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


def _drain(out):
    """Completion barrier that works through the axon tunnel, where
    jax.block_until_ready returns before execution finishes (CLAUDE.md):
    fetch one element of one result to the host.  Executions run in order
    per device, so a tail fetch drains every queued computation."""
    import numpy as np
    import jax

    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


def device_loop_latency(
    step: Callable, carry0, iters: int = 100, args=()
) -> float:
    """Pure device ms/iteration for `step` (carry -> carry), measured by
    running `iters` iterations inside ONE jitted `lax.fori_loop` — zero
    per-iteration dispatch, so the number is the device's serving floor
    rather than the host/tunnel round trip that dominates eager per-call
    timing on remote backends.

    `step` must thread a loop-carried dependency (e.g. return
    `output[..., :3] * 1e-32` and add it to an input) so XLA cannot hoist
    the loop-invariant body out of the loop or dead-code-eliminate it.

    Loop-invariant device arrays (the batch, the params) must go through
    `args` — step(carry, *args) — NOT a Python closure: jit inlines closed
    -over arrays as HLO constants, which bloats the program (and blows the
    axon tunnel's remote-compile request limit for real batches).

    Single host fetch drains the loop; one fetch round-trip (measured on
    an already-complete result) is subtracted, per CLAUDE.md's barrier
    contract (netbase.py:308-310 is the reference's ms/frame surface)."""
    import jax

    loop = jax.jit(
        lambda c, *a: jax.lax.fori_loop(
            0, iters, lambda i, cc: step(cc, *a), c
        )
    )
    out = loop(carry0, *args)
    _drain(out)
    t0 = time.perf_counter()
    _drain(out)
    fetch_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = loop(carry0, *args)
    _drain(out)
    return 1000.0 * max(time.perf_counter() - t0 - fetch_s, 0.0) / iters


def time_batched_inference(fn: Callable, args, iters: int = 20) -> float:
    """ms/batch for a jitted function (computeOutput(timeit=True) analog,
    netbase.py:308-310).

    Queues all iterations and drains with a single host fetch — the only
    reliable barrier on remote-device setups — then subtracts one fetch
    round-trip (measured separately on the warmup result)."""
    out = fn(*args)
    _drain(out)
    # fetch round-trip cost, measured on an already-complete result
    t0 = time.perf_counter()
    _drain(out)
    fetch_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _drain(out)
    return 1000.0 * max(time.perf_counter() - t0 - fetch_s, 0.0) / iters
