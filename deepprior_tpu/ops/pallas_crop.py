"""Pallas TPU kernel: fused cube-crop + normalize over batched depth maps.

The algorithm of ops/crop.crop3d expressed as a single TPU kernel.  The key
trick: an axis-aligned nearest-neighbor crop is a *separable* gather —
out[v, u] = dpt[q(v), p(u)] — so it becomes two one-hot selection matmuls

    crop = R @ dpt @ C^T,   R[i, h] = (h == q(i)),  C[j, w] = (w == p(j))

which run on the MXU at full throughput instead of issuing scattered loads
(TPUs have no efficient vector gather).  Out-of-image coordinates produce
all-zero one-hot rows, giving the reference's zero padding for free
(handdetector.py:274-279).  The z-threshold + [-1, 1] normalization
(handdetector.py:291-295, dataset.py:98-103) fuse as vector epilogue.

Per-sample crop geometry (bounds, scales, embed offsets — all data
dependent) is computed in plain jnp outside the kernel and fed through
scalar prefetch, so the kernel sees only flat f32 parameters.

Grid: one program per sample; the (H, W) frame streams HBM->VMEM via the
BlockSpec pipeline while the previous sample computes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepprior_tpu.ops.crop import _embed_geometry, com_to_bounds


# in-VMEM source window (rows, cols): covers the typical hand bbox.
# Slicing the window out of the VMEM-resident frame is free (no extra HBM
# traffic — the failure mode of doing this in XLA), and the one-hot
# contractions shrink from H/W to the window dims (fewer MXU passes).
# Samples whose band doesn't fit take the full-frame branch.
WIN_H = 384  # NYU 480x640: window start sublane-aligned (multiple of 8)
WIN_W = 512  # window start lane-aligned (multiple of 128) -> extra slack


def window_dims(h: int, w: int, win_rows: int | None = None,
                win_cols: int | None = None):
    """Per-frame-size banded-window dims (rows, cols).

    640x480 (NYU) uses the (384, 512) window.  320x240 frames (ICVL /
    MSRA15, intrinsics fx=241.42) get a 160-row full-width band: a 250 mm
    cube at z >= 450 mm spans <= ~134 px, so 160 rows (plus 8-row
    alignment slack) covers typical hands, and the full 320-col width
    sidesteps the 128-lane window-start granularity that would make
    column banding useless at w=320.  Frames the band cannot help
    (h <= band rows) disable banding.

    win_rows narrows the row window below the per-size default (a
    dataset-geometry bound — see band_rows_for); out-of-envelope samples
    still fall back to the full-frame branch via the fits flag, so the
    bound affects speed only, never correctness."""
    wh = 384 if h > 384 else (160 if h > 160 else h)
    ww = 512 if w > 512 else w
    if win_rows is not None:
        wr = max(8, -(-int(win_rows) // 8) * 8)
        wh = min(wh, wr)
    if win_cols is not None:
        wc = max(128, -(-int(win_cols) // 128) * 128)
        ww = min(w, wc)
    return wh, ww


def band_rows_for(fy: float, cube_z: float, z_min: float) -> int:
    """Row-window bound for hands no closer than z_min mm: the projected
    cube height 2*fy*(cube_z/2)/z_min, plus the bilinear extra tap and the
    8-row window-start alignment slack, rounded up to a sublane multiple.
    Pass to pallas_normalized_crop(win_rows=...) / FusedEstimator
    (min_depth_mm=...) when the deployment's working envelope is known."""
    rows = 2.0 * fy * (cube_z / 2.0) / float(z_min) + 1.0 + 7.0
    return -(-int(rows) // 8) * 8


def _sample_crop(read, src, *, dsize, norm_zero_one, clamp, bilinear,
                 shift):
    """One sample's selection matmuls + epilogue -> (dh, dw) crop.

    read(j) returns the sample's scalar-prefetch parameter j (layout in
    _crop_kernel's docstring); src is the (sh, sw) source window; shift
    subtracts the window origin (wy, wx) from the source coordinates
    (True when src is a banded window rather than the full frame).

    Shared by the per-sample pipelined kernel (_crop_kernel) and the
    K-blocked manual-DMA kernel (_blocked_crop_kernel).
    """
    dw, dh = dsize
    xstart, ystart = read(0), read(1)
    wb, hb = read(2), read(3)
    off_x, off_y = read(4), read(5)
    zstart, zend = read(6), read(7)
    com_z, cube_half = read(8), read(9)
    sz_w, sz_h = read(10), read(11)

    # output pixel grids (2D iota: TPU requires >=2D, integer dtype only)
    u = jax.lax.broadcasted_iota(jnp.int32, (dh, dw), 1).astype(jnp.float32)
    v = jax.lax.broadcasted_iota(jnp.int32, (dh, dw), 0).astype(jnp.float32)

    # separable source coordinates via the backend-rewrite-proof exact
    # floor-div (nearest, cv2 INTER_NEAREST floor semantics) or the float
    # resize map (bilinear) — see ops/crop.py
    from deepprior_tpu.ops.crop import _exact_floor_div

    p1 = q1 = fp = fq = None
    if bilinear:
        # cv2-exact half-pixel taps in PATCH coords with edge clamping —
        # same math as ops.crop._linear_taps_1d (crop -> threshold ->
        # resize order; agreement with the XLA twin and the cv2/host
        # oracle is to f32 round-off)
        psp = (u[0:1, :] - off_x + 0.5) * (wb / sz_w) - 0.5  # (1, dw)
        qsp = (v[:, 0:1] - off_y + 0.5) * (hb / sz_h) - 0.5  # (dh, 1)
        p0 = jnp.clip(jnp.floor(psp), 0.0, wb - 1.0)
        q0 = jnp.clip(jnp.floor(qsp), 0.0, hb - 1.0)
        fp = jnp.clip(psp - p0, 0.0, 1.0)
        fq = jnp.clip(qsp - q0, 0.0, 1.0)
        p1 = jnp.minimum(p0 + 1.0, wb - 1.0) + xstart
        q1 = jnp.minimum(q0 + 1.0, hb - 1.0) + ystart
        p = p0 + xstart
        q = q0 + ystart
    else:
        p = xstart + _exact_floor_div((u[0:1, :] - off_x) * wb, sz_w)
        q = ystart + _exact_floor_div((v[:, 0:1] - off_y) * hb, sz_h)
    if shift:
        p = p - read(14)  # wx
        q = q - read(13)  # wy
        if bilinear:
            p1 = p1 - read(14)
            q1 = q1 - read(13)

    def select(src, p_rel, q_rel):
        """Selection matmuls; out-of-range -> zero row == zero pad.

        Nearest: R/C are one-hot.  Bilinear: each row carries the two-tap
        weights (1-frac, frac) at (floor, floor+1) — bilinear resampling
        is separable, so it is STILL two matmuls, just with weighted
        selectors (matches ops.crop._crop3d_bilinear_onehot_batch).

        Precision: the MXU's default 1-pass bf16 would quantize the
        selected depth values.  Nearest uses the exact value-side bf16x3
        split (ops/exact_mxu.py — bit-exact, 3 one-pass matmuls);
        bilinear's weighted selectors keep HIGHEST (f32 round-off).

        With clamp=True the constructor's depth clamping (clamp_depth)
        applies to the window values right here — cleaning ~0.2 MB of
        window per sample instead of rewriting the whole frame batch
        through HBM beforehand (bit-identical: cleaning is elementwise,
        selection is one-hot)."""
        if clamp:
            min_d, max_d = read(15), read(16)
            keep = (src >= min_d) & (src <= max_d)
            src = jnp.where(keep, src, 0.0)
        sh, sw = src.shape
        hh = jax.lax.broadcasted_iota(jnp.int32, (dh, sh), 1).astype(jnp.float32)
        ww = jax.lax.broadcasted_iota(jnp.int32, (dw, sw), 1).astype(jnp.float32)
        if bilinear:
            # weighted two-tap selectors are not bf16-exact: keep HIGHEST;
            # rows-then-cols order matches the XLA twin bit-for-bit.
            # getCrop's z-threshold applies to the WINDOW VALUES before
            # the blend (reference order crop -> threshold -> resize);
            # the 0-pad outside the window stays 0 via zero selector rows
            src = jnp.where((src < zstart) & (src != 0.0), zstart, src)
            src = jnp.where(src > zend, 0.0, src)
            rowsel = (hh == q_rel) * (1.0 - fq) + (hh == q1) * fq
            p0c = p_rel.reshape(dw, 1)
            p1c = p1.reshape(dw, 1)
            fpc = fp.reshape(dw, 1)
            colsel = (ww == p0c) * (1.0 - fpc) + (ww == p1c) * fpc
            rows = jnp.dot(
                rowsel, src,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            return jax.lax.dot_general(
                rows, colsel,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (dh, dw)
        # nearest: one-hot selectors are bf16-exact, so three 1-pass bf16
        # matmuls with the value side split (ops/exact_mxu.py) give the
        # bit-exact f32 selection ~2.4x faster than HIGHEST.  Contraction
        # ORDER picks the cheaper second matmul: selecting columns first
        # makes the second contraction (dh, sh) @ (sh, dw) — sh (the band
        # height, 304/160) is smaller than sw (512/320+), saving ~12% of
        # the selection MACs vs rows-first.  Bit-exactness is order-
        # independent for one-hot selection (each output element is
        # exactly one src element either way).
        from deepprior_tpu.ops.exact_mxu import (
            dot_general_vals_onehot, dot_onehot_vals,
        )

        rowsel = (hh == q_rel).astype(jnp.bfloat16)  # (dh, sh)
        colsel = (ww == p_rel.reshape(dw, 1)).astype(jnp.bfloat16)  # (dw, sw)
        if sh <= sw:
            cols = dot_general_vals_onehot(
                src, colsel, (((1,), (1,)), ((), ()))
            )  # (sh, dw)
            return dot_onehot_vals(rowsel, cols)  # (dh, dw)
        rows = dot_onehot_vals(rowsel, src)
        return dot_general_vals_onehot(
            rows, colsel, (((1,), (1,)), ((), ()))
        )  # (dh, dw)

    def epilogue(d):
        if not bilinear:
            # z-threshold: near -> zstart, far -> 0.  The bilinear path
            # thresholds the window BEFORE the blend (reference order);
            # a blend of thresholded values may legitimately land below
            # zstart, so re-thresholding would corrupt it.
            d = jnp.where((d < zstart) & (d != 0.0), zstart, d)
            d = jnp.where(d > zend, 0.0, d)
        # embed mask: outside the resized region -> ND background (0)
        in_embed = (
            (u >= off_x) & (u < off_x + sz_w)
            & (v >= off_y) & (v < off_y + sz_h)
        )
        d = jnp.where(in_embed, d, 0.0)
        # normalize (0 == background -> far cube face)
        d = jnp.where(d == 0.0, com_z + cube_half, d)
        if norm_zero_one:
            return (d - (com_z - cube_half)) / (2.0 * cube_half)
        return (d - com_z) / cube_half

    return epilogue(select(src, p, q))


def _crop_kernel(params_ref, dpt_ref, out_ref, *, dsize, norm_zero_one,
                 clamp=False, band_block=False, win=(WIN_H, WIN_W),
                 bilinear=False):
    """params_ref: (B, 15|17) scalar-prefetch rows [xstart, ystart, wb, hb,
    off_x, off_y, zstart, zend, com_z, cube_z/2, sz_w, sz_h, fits, wy, wx
    (, min_d, max_d when clamp)].

    band_block=True means dpt_ref is already the per-sample window (the
    pipeline DMA'd only the (WIN_H, WIN_W) band at elementwise offsets
    (wy, wx)) — every sample must fit; the caller cond-dispatches.

    A row-loop gather variant (dh dynamic sublane copies replacing the
    HIGHEST row matmul) measured 3.5x SLOWER on TPU (11.4 vs 3.3 ms per
    1024 frames) — Mosaic's per-iteration dynamic sublane slicing costs
    far more than the MXU passes it saves; it was removed."""
    i = pl.program_id(0)
    h, w = dpt_ref.shape
    win_h, win_w = win

    def read(j):
        return params_ref[i, j]

    fits = params_ref[i, 12] > 0.0
    body = functools.partial(
        _sample_crop, read, dsize=dsize, norm_zero_one=norm_zero_one,
        clamp=clamp, bilinear=bilinear,
    )

    if band_block:
        # dpt_ref IS the per-sample (win_h, win_w) window — the pipeline
        # DMA'd only the band (pl.Element offsets from scalar prefetch)
        out_ref[:, :] = body(dpt_ref[:, :], shift=True)
    elif h > win_h or w > win_w:

        @pl.when(fits)
        def _banded():
            wy_i = pl.multiple_of(params_ref[i, 13].astype(jnp.int32), 8)
            # Mosaic alignment: a sliced extent must be lane/sublane-tiled
            # OR the full dim — when the window spans the whole axis (e.g.
            # 320-px-wide frames), don't slice that axis at all
            if win_w < w:
                wx_i = pl.multiple_of(params_ref[i, 14].astype(jnp.int32), 128)
                src = dpt_ref[pl.ds(wy_i, win_h), pl.ds(wx_i, win_w)]
            elif win_h < h:
                src = dpt_ref[pl.ds(wy_i, win_h), :]
            else:
                src = dpt_ref[:, :]
            out_ref[:, :] = body(src, shift=True)

        @pl.when(jnp.logical_not(fits))
        def _full():
            out_ref[:, :] = body(dpt_ref[:, :], shift=False)

    else:
        out_ref[:, :] = body(dpt_ref[:, :], shift=False)


def _blocked_crop_kernel(params_ref, dpt_hbm, out_ref, *, dsize,
                         norm_zero_one, clamp, win, bilinear, k_block,
                         b_total):
    """K samples per grid step with a MANUAL double-buffered band pipeline.

    The round-3 decomposition (docs/ROADMAP.md) showed the per-sample
    kernel's cost is flat ~µs/sample step orchestration, not DMA bytes or
    MXU flops.  This variant keeps the full frame batch in HBM
    (memory_space=HBM — no automatic per-step block) and drives the band
    copies itself: two VMEM slots, two DMA semaphores, sample k+1's band
    DMA issued before sample k computes.  The grid shrinks k_block-fold,
    amortizing any per-step fixed cost; the compute per sample is
    IDENTICAL to _crop_kernel's banded branch (same _sample_crop body),
    so results stay bit-exact.

    Every sample must fit its band window — the caller dispatches on the
    all-fits flag exactly like the automatic banded path.  The batch is
    padded up to a k_block multiple by clamping the sample index to the
    last row (duplicate work, trimmed by the caller).
    """
    g = pl.program_id(0)
    win_h, win_w = win
    _, hk, wk = dpt_hbm.shape
    row_slice = win_h < hk
    col_slice = win_w < wk

    def body(scratch, sems):
        def b_of(k):
            return jnp.minimum(g * k_block + k, b_total - 1)

        def get_dma(slot, k):
            b = b_of(k)
            src = dpt_hbm.at[b]
            if row_slice:
                wy = pl.multiple_of(params_ref[b, 13].astype(jnp.int32), 8)
                if col_slice:
                    wx = pl.multiple_of(
                        params_ref[b, 14].astype(jnp.int32), 128
                    )
                    src = src.at[pl.ds(wy, win_h), pl.ds(wx, win_w)]
                else:
                    src = src.at[pl.ds(wy, win_h), :]
            elif col_slice:
                wx = pl.multiple_of(params_ref[b, 14].astype(jnp.int32), 128)
                src = src.at[:, pl.ds(wx, win_w)]
            return pltpu.make_async_copy(
                src, scratch.at[slot], sems.at[slot]
            )

        get_dma(0, 0).start()
        for k in range(k_block):  # static unroll
            slot = k % 2
            if k + 1 < k_block:
                get_dma((k + 1) % 2, k + 1).start()
            get_dma(slot, k).wait()
            b = b_of(k)

            def read(j, b=b):
                return params_ref[b, j]

            out_ref[k] = _sample_crop(
                read, scratch[slot], dsize=dsize,
                norm_zero_one=norm_zero_one, clamp=clamp,
                bilinear=bilinear, shift=row_slice or col_slice,
            )

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM(
            (2, win_h if row_slice else hk, win_w if col_slice else wk),
            jnp.float32,
        ),
        sems=pltpu.SemaphoreType.DMA((2,)),
    )


def _source_band(first_start, extent, off, sz, n_out, limit, use_bilinear):
    """Per-axis source band [lo, hi] covering every tap the kernel reads.

    p/q taps increase monotonically in the canvas index, so evaluating the
    tap map at canvas index 0 and n_out-1 bounds the band; the window start
    is later sublane/lane-aligned and `fits` flags whether the whole band
    lands inside the fixed (win_h, win_w) window (see
    pallas_normalized_crop).

    Nearest mirrors the kernel's exact floor-div map.  Bilinear mirrors
    _linear_taps_1d's cv2 half-pixel map EXACTLY (r5): patch-clamped floor
    plus the min(+1, extent-1) second tap — the pre-r5 straight-map bound
    missed the last tap by one pixel whenever the patch is larger than its
    resized size (ratio > 1; caught by the randomized coverage test,
    tests/test_pallas_crop.py::test_band_covers_taps).
    """
    from deepprior_tpu.ops.crop import _exact_floor_div

    if use_bilinear:
        r = extent / sz
        # same f32 op order as _linear_taps_1d (u - off + 0.5) * r - 0.5
        lo = jnp.clip(
            jnp.floor((0.0 - off + 0.5) * r - 0.5), 0.0, extent - 1.0
        ) + first_start
        hi = jnp.minimum(
            jnp.clip(
                jnp.floor((float(n_out - 1) - off + 0.5) * r - 0.5),
                0.0,
                extent - 1.0,
            )
            + 1.0,
            extent - 1.0,
        ) + first_start
    else:
        lo = first_start + _exact_floor_div((0.0 - off) * extent, sz)
        hi = first_start + _exact_floor_div(
            (float(n_out - 1) - off) * extent, sz
        )
    lo = jnp.clip(lo, 0.0, limit - 1.0)
    hi = jnp.clip(hi, 0.0, limit - 1.0)
    return lo, hi


@functools.partial(
    jax.jit,
    static_argnames=(
        "fx", "fy", "dsize", "norm_zero_one", "fuse_clamp", "use_bilinear",
        "win_rows", "win_cols", "block_k",
    ),
)
def pallas_normalized_crop(
    dpt,
    com,
    cube,
    fx: float,
    fy: float,
    dsize: Tuple[int, int] = (128, 128),
    norm_zero_one: bool = False,
    fuse_clamp: bool = False,
    use_bilinear: bool = False,
    win_rows: int | None = None,
    win_cols: int | None = None,
    block_k: int | None = None,
):
    """Drop-in fast path for ops.crop.normalized_crop (same outputs).

    dpt: (B, H, W) clamped depth — or RAW depth with fuse_clamp=True, which
    applies clamp_depth's per-image limits to the crop window inside the
    kernel instead of rewriting the whole frame batch through HBM first
    (bit-identical, saves a full-frame read+write pass).
    com: (B, 3); cube: (3,) or (B, 3).
    use_bilinear=True resamples with two-tap separable bilinear selection
    (handdetector.py:343-350 resize semantics) instead of nearest.
    win_rows (static) narrows the banded row window to a dataset-geometry
    bound (band_rows_for) — pure speed knob; samples outside the envelope
    take the full-frame fallback.
    win_cols (static) overrides the column window (default 512 for wide
    frames); win_cols >= frame width disables column banding, making the
    band DMA CONTIGUOUS in HBM (one descriptor instead of win_h strided
    rows) at the cost of wider selection matmuls — see docs/ROADMAP.md
    round-4 findings for the measured tradeoff.
    block_k (static) processes K samples per grid step with a manual
    double-buffered band pipeline (_blocked_crop_kernel) instead of one
    automatically-pipelined sample per step — bit-identical outputs,
    pure speed knob; None keeps the per-sample pipeline.
    Returns (crop_norm (B, dh, dw), M (B, 3, 3)).
    """
    from deepprior_tpu.ops.crop import crop_transform

    dpt = jnp.asarray(dpt, jnp.float32)
    com = jnp.asarray(com, jnp.float32)
    cube = jnp.broadcast_to(jnp.asarray(cube, jnp.float32), com.shape)
    b, h, w = dpt.shape
    dw, dh = dsize

    # Mosaic can only slice (8, 128)-tiled extents, so pad the frame to
    # sublane/lane multiples (320 -> 384 cols for ICVL/MSRA).  Zero-padded
    # pixels select as zeros — EXACTLY the out-of-image zero-padding
    # semantics of the crop (handdetector.py:274-279) — so numerics are
    # untouched; all crop geometry below stays in original coordinates.
    pad_h = (-h) % 8
    pad_w = (-w) % 128
    if pad_h or pad_w:
        dpt = jnp.pad(dpt, ((0, 0), (0, pad_h), (0, pad_w)))
    hk, wk = h + pad_h, w + pad_w
    win_h, win_w = window_dims(hk, wk, win_rows, win_cols)

    xs, xe, ys, ye, zs, ze = com_to_bounds(com, cube, fx, fy, (h, w))
    scale, off_x, off_y, sz_w, sz_h = _embed_geometry(xs, xe, ys, ye, dsize)
    wb = xe - xs
    hb = ye - ys

    qlo, qhi = _source_band(ys, hb, off_y, sz_h, dh, h, use_bilinear)
    plo, phi = _source_band(xs, wb, off_x, sz_w, dw, w, use_bilinear)
    # starts aligned for Mosaic: sublane (rows) multiple of 8, lane (cols)
    # multiple of 128; the clamp limits are themselves aligned multiples
    wy = jnp.clip(
        jnp.floor(qlo / 8.0) * 8.0, 0.0, float(max((hk - win_h) // 8 * 8, 0))
    )
    wx = jnp.clip(
        jnp.floor(plo / 128.0) * 128.0,
        0.0,
        float(max((wk - win_w) // 128 * 128, 0)),
    )
    fits = ((qhi - wy < win_h) & (phi - wx < win_w)).astype(jnp.float32)

    cols = [
        xs, ys, wb, hb, off_x, off_y, zs, ze,
        com[:, 2], cube[:, 2] / 2.0, sz_w, sz_h, fits, wy, wx,
    ]
    if fuse_clamp:
        from deepprior_tpu.ops.crop import depth_limits

        min_d, max_d = depth_limits(dpt)
        cols += [min_d, max_d]
    params = jnp.stack(cols, axis=1)  # (B, 15|17)

    def call_kernel(band: bool):
        """band=True: the pipeline DMAs only each sample's (win_h, win_w)
        source band — pl.Element offsets read from the scalar-prefetch
        params — cutting HBM traffic vs streaming full frames, with the
        automatic double-buffering intact.  Valid only when every sample
        fits; the lax.cond below dispatches."""
        if band:
            in_spec = pl.BlockSpec(
                (None, pl.Element(win_h), pl.Element(win_w)),
                lambda i, prm: (
                    i,
                    pl.multiple_of(prm[i, 13].astype(jnp.int32), 8),
                    pl.multiple_of(prm[i, 14].astype(jnp.int32), 128),
                ),
            )
        else:
            in_spec = pl.BlockSpec((1, hk, wk), lambda i, prm: (i, 0, 0))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[in_spec],
            out_specs=pl.BlockSpec((1, dh, dw), lambda i, prm: (i, 0, 0)),
        )

        def kernel(params_ref, dpt_ref, out_ref):
            _crop_kernel(
                params_ref,
                dpt_ref if band else dpt_ref.at[0],
                out_ref.at[0],
                dsize=dsize,
                norm_zero_one=norm_zero_one,
                clamp=fuse_clamp,
                band_block=band,
                win=(win_h, win_w),
                bilinear=use_bilinear,
            )

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b, dh, dw), jnp.float32),
            grid_spec=grid_spec,
        )(params, dpt)

    def call_blocked():
        """K-samples-per-step manual pipeline (see _blocked_crop_kernel);
        batch padded to a k multiple by index clamping, trimmed here."""
        k = max(1, min(block_k, b))
        bp = -(-b // k) * k
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bp // k,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
            out_specs=pl.BlockSpec((k, dh, dw), lambda g, prm: (g, 0, 0)),
        )

        def kernel(params_ref, dpt_ref, out_ref):
            _blocked_crop_kernel(
                params_ref, dpt_ref, out_ref,
                dsize=dsize, norm_zero_one=norm_zero_one,
                clamp=fuse_clamp, win=(win_h, win_w),
                bilinear=use_bilinear, k_block=k, b_total=b,
            )

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((bp, dh, dw), jnp.float32),
            grid_spec=grid_spec,
        )(params, dpt)
        return out[:b] if bp != b else out

    fast = call_blocked if block_k else (lambda: call_kernel(True))
    if hk > win_h or wk > win_w:
        crop = jax.lax.cond(
            jnp.all(fits > 0.0),
            fast,
            lambda: call_kernel(False),
        )
    elif block_k:
        crop = call_blocked()
    else:
        crop = call_kernel(False)

    m = crop_transform(com, cube, fx, fy, (h, w), dsize)
    return crop, m
