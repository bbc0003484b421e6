"""Bit-exact f32 one-hot selection on the bf16 MXU.

The crop/warp kernels select f32 depth values with one-hot matmuls
(TPUs have no vector gather).  The MXU's native input type is bf16, so an
exact f32 selection naively requests `Precision.HIGHEST`, which emulates
f32 x f32 by splitting BOTH operands — but the one-hot operand is already
bf16-exact (entries are 0.0/1.0).  Splitting only the value operand into
three bf16 terms gives the same bit-exact result in three 1-pass matmuls:
measured 2.4x faster than HIGHEST on v5e for the warp-kernel shapes.

Exactness: for f32 x with exponent e, a1 = rn_bf16(x) captures the top 8
mantissa bits; r1 = x - a1 is exact in f32 (|r1| <= 2^(e-9), <= 15
significant bits); a2 = rn_bf16(r1) the next 8; r2 = r1 - a2 has <= 8
significant bits (an f32 mantissa has only 24), so a3 == r2 exactly.  A
one-hot matmul selects each term exactly (t * 1.0 with f32 accumulate,
zeros elsewhere), and (a1 + a2) + a3 re-assembles x without rounding:
a1 + a2 is x - r2 (<= 17 significant bits, f32-exact) and adding back a3
restores the full mantissa.

Weighted selectors (bilinear two-tap rows) are NOT bf16-exact — those
matmuls must keep HIGHEST.

SAFE ONLY INSIDE PALLAS KERNELS (or with host-computed terms).  At the
XLA level the algebraic simplifier reassociates the sum of three dots
sharing an operand back into one dot of the bf16 sum —
dot(A,B1)+dot(A,B2)+dot(A,B3) -> dot(A, B1+B2+B3) — which collapses the
split to plain bf16 and silently loses the residual terms.  Measured on
the v5e (prof_xla_split.py): device-computed split + 3 einsums is wrong
on ~100% of elements (max err = one bf16 ulp of the depth, ~4 mm at
1.5 m); `lax.optimization_barrier` around the terms OR around each dot
output does NOT prevent the rewrite through this backend; the identical
dots fed host-precomputed terms are bit-exact, as is the split itself.
There is also no speed to win there: at XLA level the split is
flop-equivalent to HIGHEST (1.57 vs 1.59 ms for the selection shape,
docs/ROADMAP.md round-3 findings).  Keep XLA-level exact selections on
`Precision.HIGHEST`; use these helpers from Pallas kernel bodies, where
Mosaic lowers the three dots as written.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp


def split3_bf16(x):
    """Exact 3-term bf16 decomposition of f32: x == (a1 + a2) + a3."""
    a1 = x.astype(jnp.bfloat16)
    r1 = x - a1.astype(jnp.float32)
    a2 = r1.astype(jnp.bfloat16)
    r2 = r1 - a2.astype(jnp.float32)
    a3 = r2.astype(jnp.bfloat16)
    return a1, a2, a3


def dot_vals_onehot(vals_f32, onehot_bf16):
    """vals (M, K) f32 @ one-hot (K, N) bf16 — bit-exact f32 selection."""
    a1, a2, a3 = split3_bf16(vals_f32)
    d = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    return d(a1, onehot_bf16) + d(a2, onehot_bf16) + d(a3, onehot_bf16)


def dot_onehot_vals(onehot_bf16, vals_f32):
    """one-hot (M, K) bf16 @ vals (K, N) f32 — mirror of dot_vals_onehot."""
    a1, a2, a3 = split3_bf16(vals_f32)
    d = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    return d(onehot_bf16, a1) + d(onehot_bf16, a2) + d(onehot_bf16, a3)


def dot_general_vals_onehot(vals_f32, onehot_bf16, dimension_numbers):
    """lax.dot_general variant for non-standard contractions (e.g. the
    crop kernel's rows @ colsel^T)."""
    import jax

    a1, a2, a3 = split3_bf16(vals_f32)
    d = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=dimension_numbers,
        preferred_element_type=jnp.float32,
    )
    return (
        d(a1, onehot_bf16) + d(a2, onehot_bf16) + d(a3, onehot_bf16)
    )
