"""Pallas TPU kernel: batched affine patch warp (the augmentation hot op).

`ops.augment.augment_batch` re-warps every training crop through a
per-sample affine (CoM shift / rotation / cube scale).  A general affine is
not separable like the crop, so the gather formulation costs ~23 ms per
128-batch on TPU (no vector gather).  This kernel expresses the warp as
one-hot contractions that ride the MXU:

  val[g] = img[q(g), p(g)]                 (g = flat output pixel index)
         = sum_h R[g, h] * S[g, h],
  S = C @ img^T   with   C[g, w] = (w == p(g)),  R[g, h] = (h == q(g))

The grid is (batch, row-chunk); each program contracts one chunk of output
rows as a single (chunk*W, W) x (W, H) matmul — full MXU utilization
instead of millions of scalar gathers.  Out-of-range coordinates produce
all-zero one-hot rows, i.e. the constant border.  Selections stay exact
for f32 depth values without HIGHEST: the one-hot side is bf16-exact, so
an explicit 3-term bf16 split of the value side (`_dot_vals_onehot`) gives
bit-exact f32 selection in three 1-pass matmuls — 2.4x faster than
HIGHEST, which must split both operands.  All tensors stay 2D in
(sublane, lane) layout — Mosaic does not support cross-lane reshapes.

Axis-aligned fast path: 2/3 of augmented samples (modes com/sc/none —
compositions of crop transforms, reference handdetector.py:678-710/750-780)
have *no rotation term* (m01 == m10 == 0), so the source row depends only
on the output row and the source column only on the output column.  The
selection then factors into two (H, H)/(W, W) one-hot matmuls
(Rsel @ img @ CselT) — 64x fewer MACs than the general flat-pixel
contraction.  The kernel predicates per sample on the prefetched inverse
transform (`pl.when`), writing the 2D-layout output for separable samples
and the flat-lane-layout output otherwise (the two layouts cannot share a
register reshape in Mosaic); the host-side wrapper merges the two buffers
with one select.  Measured on v5e: 15.9 -> ~3 us/sample for separable
samples, which dominates training-time augmentation cost.

Nearest sampling uses round-to-nearest (floor(x + 0.5)) — cv2 warpAffine/
warpPerspective semantics (reference handdetector.py:782-793), matching
ops.crop.warp_patch exactly.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepprior_tpu.geometry import inv3x3

ROW_CHUNK = 32


# exact f32 selection on the bf16 MXU — see ops/exact_mxu.py for the
# exactness argument and measurements
from deepprior_tpu.ops.exact_mxu import (
    dot_onehot_vals as _dot_onehot_vals,
    dot_vals_onehot as _dot_vals_onehot,
)


def _warp_kernel(params_ref, img_ref, si, ci, *, hw, border, nv_val):
    h, w = hw
    inv00 = params_ref[si, 0]
    inv01 = params_ref[si, 1]
    inv02 = params_ref[si, 2]
    inv10 = params_ref[si, 3]
    inv11 = params_ref[si, 4]
    inv12 = params_ref[si, 5]

    n = ROW_CHUNK * w
    # flat output pixel index on the LANE dimension (shape (1, n)) so the
    # final write is lane-aligned; sublane dims carry the contraction
    g = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    u_i = jnp.remainder(g, w)
    v_i = g // w + ci * ROW_CHUNK
    u = u_i.astype(jnp.float32)
    v = v_i.astype(jnp.float32)

    # inverse-map to source coords; nearest = floor(x + 0.5)
    x = inv00 * u + inv01 * v + inv02
    y = inv10 * u + inv11 * v + inv12
    p = jnp.floor(x + 0.5)  # (1, n)
    q = jnp.floor(y + 0.5)

    ww = jax.lax.broadcasted_iota(jnp.int32, (w, n), 0).astype(jnp.float32)
    cselT = (ww == p).astype(jnp.bfloat16)  # (W, n)
    hh = jax.lax.broadcasted_iota(jnp.int32, (h, n), 0).astype(jnp.float32)
    rselT = (hh == q).astype(jnp.float32)  # (H, n)

    sT = _dot_vals_onehot(img_ref[:, :], cselT)  # (H, n)
    val = jnp.sum(rselT * sT, axis=0, keepdims=True)  # (1, n)

    in_img = (p >= 0) & (p < w) & (q >= 0) & (q < h)
    val = jnp.where(in_img, val, border)
    if nv_val is not None:
        # jnp.isclose default tolerances (rtol 1e-5), like warp_patch
        val = jnp.where(
            jnp.abs(val - nv_val) <= 1e-5 * abs(nv_val) + 1e-8, border, val
        )
    return val  # (1, ROW_CHUNK*w)


def _sep_warp_kernel(params_ref, img_ref, si, *, hw, border, nv_val):
    """Axis-aligned warp: row/column selections factor into two matmuls.

    Bit-compatible with the general path: with m01 == m10 == 0 the source
    coordinates reduce to p(u) = inv00*u + inv02 and q(v) = inv11*v + inv12
    (the dropped terms are exact float zeros), and each one-hot selection
    uses the bf16x3 value-side split (ops/exact_mxu.py) — bit-exact for
    one-hot selectors, and safe HERE because Mosaic lowers the three dots
    as written (the split must NOT be hoisted to XLA level, where the
    simplifier reassociates it away — see exact_mxu.py).
    """
    h, w = hw
    inv00 = params_ref[si, 0]
    inv02 = params_ref[si, 2]
    inv11 = params_ref[si, 4]
    inv12 = params_ref[si, 5]

    u = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1).astype(jnp.float32)
    v = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0).astype(jnp.float32)
    p = jnp.floor(inv00 * u + inv02 + 0.5)  # (1, w) source column per out col
    q = jnp.floor(inv11 * v + inv12 + 0.5)  # (h, 1) source row per out row

    hh = jax.lax.broadcasted_iota(jnp.int32, (h, h), 1).astype(jnp.float32)
    rsel = (hh == q).astype(jnp.bfloat16)  # (h_out, h_in)
    ww = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0).astype(jnp.float32)
    cselT = (ww == p).astype(jnp.bfloat16)  # (w_in, w_out)

    # two chained exact selections: t holds exact f32 img values, so the
    # second contraction re-splits it
    t = _dot_onehot_vals(rsel, img_ref[:, :])  # (h_out, w_in)
    val = _dot_vals_onehot(t, cselT)  # (h_out, w_out)

    in_img = (p >= 0) & (p < w) & (q >= 0) & (q < h)  # broadcasts to (h, w)
    val = jnp.where(in_img, val, border)
    if nv_val is not None:
        val = jnp.where(
            jnp.abs(val - nv_val) <= 1e-5 * abs(nv_val) + 1e-8, border, val
        )
    return val  # (h, w)


@functools.partial(
    jax.jit, static_argnames=("norm_zero_one", "border", "nv_val")
)
def pallas_warp_norm(
    patch_norm,
    m_fwd,
    com_z,
    cube_z,
    thresh,
    zs_t,
    ze_t,
    new_com_z,
    new_cube_z,
    norm_zero_one: bool = False,
    border: float = 0.0,
    nv_val: Optional[float] = None,
):
    """Fused augmentation epilogue: unnormalize + warp + recrop-threshold +
    renormalize in ONE kernel pass (r5 probe, VERDICT r4 #3).

    The unfused pipeline (ops/augment.py) runs four HBM passes over the
    patch batch per step: XLA unnormalize (read+write), the warp kernel
    (read+write), and XLA threshold+renormalize (read+write) plus the
    premax reduction (read).  This kernel reads the normalized patch once,
    unnormalizes it in VMEM, computes premax in-register, selects through
    the SAME warp math (_sep_warp_kernel/_warp_kernel — selection is
    bit-identical), applies the recrop z-threshold and the premax/zero
    renormalization (nettrainer.py:985-997), and writes the final
    normalized crop — one read + one write of the patch batch total.

    patch_norm: (B, H, W) normalized crops; m_fwd: (B, 3, 3) forward
    transforms.  com_z/cube_z: ORIGINAL per-sample normalization scalars
    (B,); thresh: (B,) bool-ish — apply the recrop threshold (com/sc
    modes); zs_t/ze_t: (B,) threshold bounds; new_com_z/new_cube_z: (B,)
    renormalization scalars.  Agreement with the unfused pipeline is to
    f32 ulps (the in-kernel unnormalize may fuse its multiply-add
    differently than XLA's), pinned by test_pallas_warp.py.
    """
    patch_norm = jnp.asarray(patch_norm, jnp.float32)
    b, h, w = patch_norm.shape
    assert h % ROW_CHUNK == 0, f"H={h} must be a multiple of {ROW_CHUNK}"
    n_chunks = h // ROW_CHUNK
    m_inv = inv3x3(jnp.asarray(m_fwd, jnp.float32))
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    com_z, cube_z = f32(com_z), f32(cube_z)
    zs_t, ze_t = f32(zs_t), f32(ze_t)
    new_com_z, new_cube_z = f32(new_com_z), f32(new_cube_z)
    # unnormalize:   img_mm = patch * s_in + t_in   (nettrainer.py:948-952)
    if norm_zero_one:
        s_in = cube_z
        t_in = com_z - cube_z / 2.0
    else:
        s_in = cube_z / 2.0
        t_in = com_z
    # renormalize:   out = (clip(d', zstart2, zend2) - t_out) / s_out
    zend2 = new_com_z + new_cube_z / 2.0
    zstart2 = new_com_z - new_cube_z / 2.0
    if norm_zero_one:
        t_out, s_out = zstart2, new_cube_z
    else:
        t_out, s_out = new_com_z, new_cube_z / 2.0
    params = jnp.stack(
        [
            m_inv[:, 0, 0], m_inv[:, 0, 1], m_inv[:, 0, 2],
            m_inv[:, 1, 0], m_inv[:, 1, 1], m_inv[:, 1, 2],
            s_in, t_in, f32(thresh), zs_t, ze_t,
            zstart2, zend2, t_out, s_out,
        ],
        axis=1,
    )  # (B, 15)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i, params: (i, 0, 0))],
        out_specs=[
            pl.BlockSpec(
                (1, n_chunks, ROW_CHUNK * w), lambda i, params: (i, 0, 0)
            ),
            pl.BlockSpec((1, h, w), lambda i, params: (i, 0, 0)),
        ],
    )

    def kernel(params_ref, img_ref, out_flat_ref, out_2d_ref):
        i = pl.program_id(0)
        img = img_ref[0] * params_ref[i, 6] + params_ref[i, 7]  # (h, w) mm
        premax = jnp.max(img)
        do_thresh = params_ref[i, 8] > 0.0
        zs_b, ze_b = params_ref[i, 9], params_ref[i, 10]
        lo2, hi2 = params_ref[i, 11], params_ref[i, 12]
        t_o, s_o = params_ref[i, 13], params_ref[i, 14]

        def epilogue(val):
            # recrop z-threshold (com/sc modes only; augment.py order)
            val = jnp.where(
                do_thresh & (val < zs_b) & (val != 0.0), zs_b, val
            )
            val = jnp.where(do_thresh & (val > ze_b), 0.0, val)
            # premax/zero -> far face, clip, renormalize
            # (nettrainer.py:985-997)
            val = jnp.where(val == premax, hi2, val)
            val = jnp.where(val == 0.0, hi2, val)
            val = jnp.clip(val, lo2, hi2)
            return (val - t_o) / s_o

        separable = (params_ref[i, 1] == 0.0) & (params_ref[i, 3] == 0.0)

        @pl.when(separable)
        def _():
            out_2d_ref[0, :, :] = epilogue(
                _sep_warp_kernel(
                    params_ref, img, i, hw=(h, w), border=border,
                    nv_val=nv_val,
                )
            )

        @pl.when(jnp.logical_not(separable))
        def _():
            vals = [
                epilogue(
                    _warp_kernel(
                        params_ref, img, i, ci,
                        hw=(h, w), border=border, nv_val=nv_val,
                    )
                )
                for ci in range(n_chunks)
            ]
            out_flat_ref[0, :, :] = jnp.concatenate(vals, axis=0)

    out_flat, out_2d = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((b, n_chunks, ROW_CHUNK * w), jnp.float32),
            jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        ],
        grid_spec=grid_spec,
    )(params, patch_norm)
    sep = (m_inv[:, 0, 1] == 0.0) & (m_inv[:, 1, 0] == 0.0)
    return jnp.where(
        sep[:, None, None], out_2d, out_flat.reshape(b, h, w)
    )


@functools.partial(
    jax.jit, static_argnames=("border", "nv_val", "block_k")
)
def pallas_warp_patch(patch, m_fwd, border: float = 0.0,
                      nv_val: Optional[float] = None,
                      block_k: Optional[int] = None):
    """Drop-in fast path for ops.crop.warp_patch (nearest, same out shape).

    patch: (B, H, W) f32; m_fwd: (B, 3, 3) forward transforms.

    block_k: samples per grid step.  The default (None = 1) runs one
    sample per step; block_k=K fetches K *contiguous* patches as ONE
    (K, H, W) block — a single HBM->VMEM descriptor instead of K 64 KB
    copies — and unrolls the K per-sample selections inside the step,
    amortizing per-grid-step latency.  This cross-sample lever was
    unavailable to the crop kernel (each crop's band starts at a
    different frame offset, so K samples stay K separate DMAs there —
    the r4 block_k crop probe measured a wash), but warp patches ARE
    batch-contiguous.  Bit-identical to the per-sample path (same math,
    same per-sample one-hot selections).  Requires B % K == 0.

    Measured on the real v5e (prof_warp_block.py, in-scan interleaved
    A/B): K=4 is a wash (0.993x), K=8/16 are ~35% WORSE — one block
    serializes the K samples' selection matmuls inside a single grid
    step, while the per-sample grid overlaps sample i+1's DMA behind
    sample i's compute.  The default stays per-sample; the knob remains
    for directly-attached TPUs (docs/ROADMAP.md round-5 findings).
    """
    patch = jnp.asarray(patch, jnp.float32)
    b, h, w = patch.shape
    assert h % ROW_CHUNK == 0, f"H={h} must be a multiple of {ROW_CHUNK}"
    n_chunks = h // ROW_CHUNK
    k = 1 if block_k is None else int(block_k)
    assert b % k == 0, f"B={b} must be a multiple of block_k={k}"
    m_inv = inv3x3(jnp.asarray(m_fwd, jnp.float32))
    params = jnp.stack(
        [
            m_inv[:, 0, 0], m_inv[:, 0, 1], m_inv[:, 0, 2],
            m_inv[:, 1, 0], m_inv[:, 1, 1], m_inv[:, 1, 2],
        ],
        axis=1,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // k,),
        in_specs=[pl.BlockSpec((k, h, w), lambda i, params: (i, 0, 0))],
        out_specs=[
            pl.BlockSpec(
                (k, n_chunks, ROW_CHUNK * w), lambda i, params: (i, 0, 0)
            ),
            pl.BlockSpec((k, h, w), lambda i, params: (i, 0, 0)),
        ],
    )

    def kernel(params_ref, img_ref, out_flat_ref, out_2d_ref):
        i = pl.program_id(0)
        for ki in range(k):  # static unroll over the block's samples
            si = i * k + ki if k > 1 else i
            separable = (
                params_ref[si, 1] == 0.0
            ) & (params_ref[si, 3] == 0.0)

            @pl.when(separable)
            def _(ki=ki, si=si):
                out_2d_ref[ki, :, :] = _sep_warp_kernel(
                    params_ref, img_ref.at[ki], si, hw=(h, w),
                    border=border, nv_val=nv_val,
                )

            @pl.when(jnp.logical_not(separable))
            def _(ki=ki, si=si):
                vals = [
                    _warp_kernel(
                        params_ref, img_ref.at[ki], si, ci,
                        hw=(h, w), border=border, nv_val=nv_val,
                    )
                    for ci in range(n_chunks)  # static: 1 matmul/chunk
                ]
                out_flat_ref[ki, :, :] = jnp.concatenate(vals, axis=0)

    out_flat, out_2d = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((b, n_chunks, ROW_CHUNK * w), jnp.float32),
            jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        ],
        grid_spec=grid_spec,
    )(params, patch)
    # each sample wrote exactly one of the two buffers; the other holds
    # garbage and is discarded by the select
    sep = (m_inv[:, 0, 1] == 0.0) & (m_inv[:, 1, 0] == 0.0)
    return jnp.where(
        sep[:, None, None], out_2d, out_flat.reshape(b, h, w)
    )
