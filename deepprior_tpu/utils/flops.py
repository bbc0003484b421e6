"""Flop accounting and MFU normalization for the perf story.

The reference reports fps only (realtimehandposepipeline.py:459-462);
a TPU-first rebuild should also normalize against the hardware:
MFU = executed flops / (wall time x peak matmul flops).

Model/XLA flops come from XLA's own HLO cost analysis
(``compiled.cost_analysis()['flops']``), which counts every dot/conv the
compiled program actually executes.  Pallas kernels are opaque custom
calls to that analysis, so the crop kernel's selection matmuls are
counted analytically (`crop_selection_flops` mirrors the dot shapes in
ops/pallas_crop.py::_crop_kernel).

Peak numbers are per-chip dense matmul peaks (bf16) from the public TPU
spec sheets; override with the DEEPPRIOR_PEAK_TFLOPS env var for unknown
hardware.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

# per-chip dense bf16 matmul peak, TFLOP/s (public spec sheets)
_PEAKS = (
    ("v5 lite", 197.0),  # v5e: 197 bf16 TFLOP/s/chip
    ("v5litepod", 197.0),
    ("v5e", 197.0),
    ("v5p", 459.0),
    ("v6 lite", 918.0),  # Trillium
    ("v6e", 918.0),
    ("v4", 275.0),
    ("v3", 123.0),
    ("v2", 46.0),
)


def peak_tflops(device=None) -> Optional[float]:
    """Per-chip dense bf16 peak for `device` (default: jax.devices()[0]).

    Returns None when the hardware is unknown (e.g. the CPU test mesh)
    and no DEEPPRIOR_PEAK_TFLOPS override is set — callers should then
    omit MFU rather than report a made-up number.
    """
    env = os.environ.get("DEEPPRIOR_PEAK_TFLOPS")
    if env:
        return float(env)
    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    for key, tf in _PEAKS:
        if key in kind:
            return tf
    return None


def xla_flops(fn_or_jitted, *args, **kwargs) -> Optional[float]:
    """XLA's HLO cost-analysis flop count for one call of fn(*args).

    Accepts a plain callable (jitted here) or an existing jax.jit object
    (preferred — the persistent compilation cache then makes the
    lower/compile a hash lookup, not a recompile).  Returns None when
    the backend exposes no cost analysis.
    """
    try:
        jitted = (
            fn_or_jitted
            if hasattr(fn_or_jitted, "lower")
            else jax.jit(fn_or_jitted)
        )
        ca = jitted.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):  # older jax: one dict per device
            ca = ca[0]
        f = float(ca.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None


def crop_selection_flops(
    batch: int,
    win_h: int,
    win_w: int,
    dh: int = 128,
    dw: int = 128,
    bilinear: bool = False,
) -> float:
    """Executed flops of the Pallas crop's selection matmuls (per batch).

    Mirrors ops/pallas_crop.py::_crop_kernel.select INCLUDING its
    contraction-order choice (pallas_crop.py:168-191): nearest selection
    contracts columns first whenever win_h <= win_w (true for all default
    banded windows), making the dots (win_h, win_w) @ (win_w, dw) then
    (dh, win_h) @ (win_h, dw); otherwise — and always for the bilinear
    two-tap selectors, whose rows-then-cols order matches the XLA twin —
    rows first: (dh, win_h) @ (win_h, win_w) then (dh, win_w) @ (dw,
    win_w)^T.  Either way both dots run as THREE one-pass bf16 passes
    (the exact value-side bf16x3 split for nearest, ops/exact_mxu.py;
    HIGHEST's 3-pass lowering for bilinear, docs/ROADMAP.md round-3
    findings), so the executed-flop multiplier is 3.
    """
    if bilinear or win_h > win_w:
        first = 2.0 * dh * win_h * win_w
        second = 2.0 * dh * dw * win_w
    else:
        first = 2.0 * win_h * win_w * dw
        second = 2.0 * dh * win_h * dw
    return batch * 3.0 * (first + second)


def mfu_pct(flops: float, seconds: float, peak_tf: Optional[float]):
    """Model-flops-utilization percentage, or None when peak is unknown."""
    if not peak_tf or seconds <= 0:
        return None
    return 100.0 * flops / (seconds * peak_tf * 1e12)
