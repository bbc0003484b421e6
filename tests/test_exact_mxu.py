"""Direct unit tests for ops/exact_mxu.py — the bf16x3 split that makes
one-hot f32 selection bit-exact on the bf16 MXU (used inside the Pallas
crop/warp kernels; the kernel-level bit-exactness tests cover the wiring,
these cover the algebra itself)."""

import numpy as np
import jax.numpy as jnp

from deepprior_tpu.ops.exact_mxu import (
    dot_onehot_vals,
    dot_vals_onehot,
    split3_bf16,
)


def _bits(x):
    return np.asarray(x, np.float32).view(np.uint32)


def test_split3_recomposes_bitwise():
    rng = np.random.default_rng(0)
    # realistic depth/coordinate magnitudes plus broad scale sweep and
    # full-mantissa values; exponent extremes near f32 max are out of
    # contract (a1 could round to inf) and out of any kernel's range
    parts = [
        rng.uniform(10.0, 1500.0, 4096),           # clamped depth mm
        rng.uniform(-640.0, 640.0, 1024),          # pixel coords
        rng.standard_normal(1024) * 10.0 ** rng.integers(-20, 20, 1024),
        np.float32(1 + 2.0 ** -23) * np.ones(8),   # full 24-bit mantissa
        np.zeros(8),
        -rng.uniform(10.0, 1500.0, 512),
    ]
    x = np.concatenate(parts).astype(np.float32)
    a1, a2, a3 = split3_bf16(jnp.asarray(x))
    re = (
        np.asarray(a1, np.float32)
        + np.asarray(a2, np.float32)
    ) + np.asarray(a3, np.float32)
    assert (_bits(re) == _bits(x)).all()


def test_dot_selection_is_bit_exact():
    rng = np.random.default_rng(1)
    vals = rng.uniform(10.0, 1500.0, (64, 96)).astype(np.float32)
    sel = np.zeros((96, 32), np.float32)
    sel[rng.integers(0, 96, 32), np.arange(32)] = 1.0
    out = np.asarray(
        dot_vals_onehot(jnp.asarray(vals), jnp.asarray(sel, jnp.bfloat16))
    )
    expect = vals @ sel
    assert (_bits(out) == _bits(expect)).all()

    out2 = np.asarray(
        dot_onehot_vals(jnp.asarray(sel.T, jnp.bfloat16), jnp.asarray(vals.T))
    )
    assert (_bits(out2) == _bits(expect.T)).all()
