"""The metric-cube hand crop as a fused, batched affine-warp.

The reference implements the crop as per-image dynamic slicing + padding +
cv2 resize + center-embed (`HandDetector.cropArea3D`, reference
src/util/handdetector.py:382-490).  Dynamic shapes are hostile to XLA, so
this module re-derives the same numerics as a single static-shape pass:

  1. `com_to_bounds`   — CoM + metric cube -> pixel bbox + z-range
                         (handdetector.py:204-226 semantics, incl. the
                         floor(x + 0.5) rounding and the center-crop
                         fallback for an ill-defined CoM)
  2. `crop_transform`  — the 3x3 affine M mapping full-frame pixel coords to
                         crop coords: translate -> uniform scale ->
                         center-embed offset (handdetector.py:447-477,
                         including the integer floors of the embedded size)
  3. `crop3d`          — for every output pixel, invert M analytically,
                         gather the source depth (nearest-neighbor, matching
                         cv2.INTER_NEAREST's floor(dst*scale) indexing),
                         apply padding + z-thresholding
                         (handdetector.py:260-296) in one fused gather
  4. `normalize_crop`  — depth -> [-1, 1] (or [0, 1]) normalization
                         (reference src/data/dataset.py:92-103)

Everything is batched over a leading B axis and differentiably irrelevant
(pure data movement), so XLA fuses steps 3-4 into one kernel.  A Pallas
fast path for very large batches lives in ops/pallas_crop.py.

Known deviations from the reference (documented, by design):
- The minor-axis resize scale: cv2.resize uses hb/floor(hb*128/wb) on the
  minor axis while the reference's own transform matrix M uses 128/wb for
  both axes; we sample through M, so our crops are exactly self-consistent
  with M (the reference's crops are off by <1px on the minor axis w.r.t.
  its own M).
- `comToTransform` (handdetector.py:228-258) swaps the embed offsets of the
  x/y axes relative to `cropArea3D` (a latent defect, invisible when the
  crop bbox is square). We use the `cropArea3D` semantics everywhere.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class CropConfig(NamedTuple):
    """Static crop parameters."""

    dsize: Tuple[int, int] = (128, 128)  # output (width, height)
    min_depth_floor: float = 10.0  # reference handdetector.py:58
    max_depth_ceil: float = 1500.0  # reference handdetector.py:57


def depth_limits(dpt, cfg: CropConfig = CropConfig()):
    """Per-image clamp limits without materializing the cleaned frame.

    Same reductions as clamp_depth; use with ops/pallas_crop's fused
    clamping, which cleans only the crop window instead of rewriting the
    whole frame batch through HBM.
    """
    dpt = jnp.asarray(dpt, jnp.float32)
    max_d = jnp.minimum(cfg.max_depth_ceil, jnp.max(dpt, axis=(-2, -1)))
    min_d = jnp.maximum(cfg.min_depth_floor, jnp.min(dpt, axis=(-2, -1)))
    return min_d, max_d


def clamp_depth(dpt, cfg: CropConfig = CropConfig()):
    """Zero out-of-range depth, per image.

    Mirrors the HandDetector constructor (handdetector.py:56-61):
    max_depth = min(1500, dpt.max()), min_depth = max(10, dpt.min()),
    out-of-range pixels -> 0.

    dpt: (..., H, W).  Returns (cleaned dpt, min_depth, max_depth) where the
    depth limits have shape (...,).
    """
    dpt = jnp.asarray(dpt, jnp.float32)
    min_d, max_d = depth_limits(dpt, cfg)
    keep = (dpt >= min_d[..., None, None]) & (dpt <= max_d[..., None, None])
    return jnp.where(keep, dpt, 0.0), min_d, max_d


def com_to_bounds(com, cube, fx, fy, img_hw, min_depth=10.0, max_depth=1500.0):
    """CoM (u, v, d) + metric cube (mm) -> crop bounds.

    Returns (xstart, xend, ystart, yend) as float32 (integer-valued) and
    (zstart, zend).  Uses the reference's floor(x + 0.5) rounding
    (handdetector.py:220-225) and falls back to a centered half-frame crop
    when com_z ~ 0 (handdetector.py:211-218; note the reference indexes the
    fallback with dpt.shape[0] for x and shape[1] for y — another latent
    swap; we reproduce its *intent*: a centered crop, using the proper axes).

    com: (..., 3); cube: (..., 3) or (3,); img_hw: static (H, W).
    """
    com = jnp.asarray(com, jnp.float32)
    cube = jnp.broadcast_to(jnp.asarray(cube, jnp.float32), com.shape)
    h, w = img_hw
    u, v, d = com[..., 0], com[..., 1], com[..., 2]
    sx, sy, sz = cube[..., 0], cube[..., 1], cube[..., 2]

    safe_d = jnp.where(jnp.isclose(d, 0.0), 1.0, d)
    xstart = jnp.floor((u * safe_d / fx - sx / 2.0) / safe_d * fx + 0.5)
    xend = jnp.floor((u * safe_d / fx + sx / 2.0) / safe_d * fx + 0.5)
    ystart = jnp.floor((v * safe_d / fy - sy / 2.0) / safe_d * fy + 0.5)
    yend = jnp.floor((v * safe_d / fy + sy / 2.0) / safe_d * fy + 0.5)
    zstart = d - sz / 2.0
    zend = d + sz / 2.0

    ill = jnp.isclose(d, 0.0)
    xstart = jnp.where(ill, w // 4, xstart)
    xend = jnp.where(ill, w // 4 + w // 2, xend)
    ystart = jnp.where(ill, h // 4, ystart)
    yend = jnp.where(ill, h // 4 + h // 2, yend)
    zstart = jnp.where(ill, min_depth, zstart)
    zend = jnp.where(ill, max_depth, zend)
    return xstart, xend, ystart, yend, zstart, zend


def _embed_geometry(xstart, xend, ystart, yend, dsize):
    """Aspect-preserving resize + center-embed geometry.

    Mirrors cropArea3D (handdetector.py:447-452, 468-477): the crop bbox of
    size (wb, hb) is resized by s = dsize/max(wb, hb) — the embedded size is
    integer-floored — and centered in the dsize canvas.

    Returns (scale, off_x, off_y, sz_w, sz_h).
    """
    dw, dh = dsize
    wb = xend - xstart
    hb = yend - ystart
    wide = wb > hb
    scale = jnp.where(wide, dw / wb, dh / hb)
    # py2 integer division in the reference -> floor.  _exact_floor_div,
    # not plain floor(a/b): the backend's a*(1/b) rewrite flips the floor
    # at exact-integer quotients — e.g. the square-bbox case wb == hb
    # (cubic cube, fx == fy), where sz must come out exactly dsize.
    sz_w = jnp.where(wide, float(dw), _exact_floor_div(wb * dh, hb))
    sz_h = jnp.where(wide, _exact_floor_div(hb * dw, wb), float(dh))
    off_x = jnp.floor(dw / 2.0 - sz_w / 2.0)
    off_y = jnp.floor(dh / 2.0 - sz_h / 2.0)
    return scale, off_x, off_y, sz_w, sz_h


def crop_transform(com, cube, fx, fy, img_hw, dsize=(128, 128)):
    """3x3 affine M: full-frame pixel coords -> crop pixel coords.

    M = center_offset @ diag(s, s, 1) @ translate(-xstart, -ystart), the
    transform returned by cropArea3D (handdetector.py:455-477) and applied
    to labels as `gtcrop = transformPoints2D(gtorig, M)`.

    Batched over leading axes of com/cube.  Returns (..., 3, 3) float32.
    """
    xstart, xend, ystart, yend, _, _ = com_to_bounds(com, cube, fx, fy, img_hw)
    scale, off_x, off_y, _, _ = _embed_geometry(xstart, xend, ystart, yend, dsize)
    zeros = jnp.zeros_like(scale)
    ones = jnp.ones_like(scale)
    row0 = jnp.stack([scale, zeros, -scale * xstart + off_x], axis=-1)
    row1 = jnp.stack([zeros, scale, -scale * ystart + off_y], axis=-1)
    row2 = jnp.stack([zeros, zeros, ones], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def _exact_floor_div(a, b):
    """floor(a / b) for integer-valued f32 a (|a| < 2^23) and b > 0, exact
    under any backend division rewrite.

    TPU/XLA lower a/b to a * reciprocal(b); for exact-integer quotients the
    reciprocal rounding lands just below the integer and floor() flips.
    One correction step with exact f32 integer products repairs it.
    """
    q = jnp.floor(a / b)
    r = a - q * b  # exact: both products integer-valued < 2^24
    q = q + (r >= b).astype(q.dtype)
    q = q - (r < 0).astype(q.dtype)
    return q


def _gather2d(img, q, p):
    """img: (H, W); q, p: integer index arrays (clipped). Returns img[q, p]."""
    h, w = img.shape
    qc = jnp.clip(q, 0, h - 1)
    pc = jnp.clip(p, 0, w - 1)
    return img[qc, pc]


def _crop3d_single(dpt, com, cube, fx, fy, dsize, use_bilinear=False):
    """Fused cube crop of one depth map. See crop3d for the batched API."""
    h, w = dpt.shape
    dw, dh = dsize
    xstart, xend, ystart, yend, zstart, zend = com_to_bounds(
        com, cube, fx, fy, (h, w)
    )
    scale, off_x, off_y, sz_w, sz_h = _embed_geometry(xstart, xend, ystart, yend, dsize)

    # output pixel grid
    u = jax.lax.broadcasted_iota(jnp.float32, (dh, dw), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (dh, dw), 0)

    # inside the embedded (resized) region?  exact integer comparison — the
    # canvas outside it is the ND background (handdetector.py:468-473)
    in_embed = (u >= off_x) & (u < off_x + sz_w) & (v >= off_y) & (v < off_y + sz_h)

    # Per-axis source mapping matching cv2.resize exactly: the resize maps
    # through (wb/sz_w, hb/sz_h) — with the *floored* integer sz — which on
    # the minor axis differs from the single scale recorded in M (the
    # reference has the same M-vs-resize inconsistency; the pixels follow
    # cv2, the labels follow M, and we reproduce both).
    wb = xend - xstart
    hb = yend - ystart

    if use_bilinear:
        # cv2.INTER_LINEAR-exact (r5; closes the r4 "half-pixel" deviation):
        # half-pixel sample mapping in PATCH coordinates with edge-clamped
        # taps, each tap read from the z-thresholded zero-padded patch —
        # crop -> threshold -> resize, the reference's op order
        # (handdetector.py:291-295 then :347-348).  The f32 op order below
        # matches the host twin (detector_np._halfpixel_taps /
        # resize_linear): floors, weights, and taps are bit-identical;
        # the blend agrees to <=2 ulp (XLA contracts its multiply-adds
        # into FMAs — test_linear_crop_matches_cv2_twin pins the bound).
        xsp = (u - off_x + 0.5) * (wb / sz_w) - 0.5
        ysp = (v - off_y + 0.5) * (hb / sz_h) - 0.5
        x0 = jnp.clip(jnp.floor(xsp), 0.0, wb - 1.0)
        y0 = jnp.clip(jnp.floor(ysp), 0.0, hb - 1.0)
        fx_ = jnp.clip(xsp - x0, 0.0, 1.0)
        fy_ = jnp.clip(ysp - y0, 0.0, 1.0)
        x1 = jnp.minimum(x0 + 1.0, wb - 1.0)
        y1 = jnp.minimum(y0 + 1.0, hb - 1.0)

        def sample(qp, pp):
            # patch -> image coords; outside the image the patch is 0-pad,
            # then getCrop's z-threshold applies per tap (pre-blend)
            pi = pp + xstart
            qi = qp + ystart
            inb = (pi >= 0) & (pi < w) & (qi >= 0) & (qi < h)
            val = _gather2d(dpt, qi.astype(jnp.int32), pi.astype(jnp.int32))
            val = jnp.where(inb, val, 0.0)
            val = jnp.where((val < zstart) & (val != 0.0), zstart, val)
            return jnp.where(val > zend, 0.0, val)

        d00 = sample(y0, x0)
        d01 = sample(y0, x1)
        d10 = sample(y1, x0)
        d11 = sample(y1, x1)
        # the host twin's exact blend expression (resize_linear)
        d = (
            d00 * (1 - fy_) * (1 - fx_)
            + d01 * (1 - fy_) * fx_
            + d10 * fy_ * (1 - fx_)
            + d11 * fy_ * fx_
        )
        # NO post-blend z-threshold: the reference thresholds the patch
        # before resizing, and a blend of thresholded values may land
        # below zstart legitimately
        return jnp.where(in_embed, d, 0.0), zstart, zend
    else:
        # cv2.INTER_NEAREST uses src = floor(dst * scale) (no half-pixel
        # offsets) — handdetector.py:343-344 semantics through our M; the
        # exact floor-div keeps indices identical across backends
        p = xstart + _exact_floor_div((u - off_x) * wb, sz_w)
        q = ystart + _exact_floor_div((v - off_y) * hb, sz_h)
        in_img = (p >= 0) & (p < w) & (q >= 0) & (q < h)
        d = _gather2d(dpt, q.astype(jnp.int32), p.astype(jnp.int32))
        # out-of-image parts of the bbox pad with 0 (handdetector.py:274-279)
        d = jnp.where(in_img, d, 0.0)

    # z-threshold (handdetector.py:291-295): near -> zstart, far -> 0
    d = jnp.where((d < zstart) & (d != 0.0), zstart, d)
    d = jnp.where(d > zend, 0.0, d)

    # outside the embedded region: ND background.  After the constructor's
    # clamping the ND value is 0 (handdetector.py:122-130 returns the mode
    # of the zeroed out-of-range pixels).
    d = jnp.where(in_embed, d, 0.0)
    return d, zstart, zend


def _onehot_crop_geometry(com, cube, fx, fy, img_hw, dsize):
    """Shared per-sample crop geometry for the one-hot paths.

    Index math via the exact floor-div: du*wb is integer-valued and exact
    in f32 (< 2^24); _exact_floor_div is immune to the backend's
    multiply-by-reciprocal division rewrite, so indices are bit-identical
    across CPU/TPU and match the host oracle.

    Returns (p (B, dw), q (B, dh), zstart, zend, off_x, off_y, sz_w, sz_h).
    """
    dw, dh = dsize
    xs, xe, ys, ye, zstart, zend = com_to_bounds(com, cube, fx, fy, img_hw)
    scale, off_x, off_y, sz_w, sz_h = _embed_geometry(xs, xe, ys, ye, dsize)
    wb = xe - xs
    hb = ye - ys
    u = jnp.arange(dw, dtype=jnp.float32)
    v = jnp.arange(dh, dtype=jnp.float32)
    p = xs[:, None] + _exact_floor_div(
        (u[None, :] - off_x[:, None]) * wb[:, None], sz_w[:, None]
    )
    q = ys[:, None] + _exact_floor_div(
        (v[None, :] - off_y[:, None]) * hb[:, None], sz_h[:, None]
    )
    return p, q, zstart, zend, off_x, off_y, sz_w, sz_h


def _embed_mask(off_x, off_y, sz_w, sz_h, dsize):
    """(B, dh, dw) mask of the embedded-patch region on the output canvas
    (handdetector.py:468-473) — single source of truth for the three
    device crop paths."""
    dw, dh = dsize
    uu = jax.lax.broadcasted_iota(jnp.float32, (dh, dw), 1)[None]
    vv = jax.lax.broadcasted_iota(jnp.float32, (dh, dw), 0)[None]
    return (
        (uu >= off_x[:, None, None])
        & (uu < (off_x + sz_w)[:, None, None])
        & (vv >= off_y[:, None, None])
        & (vv < (off_y + sz_h)[:, None, None])
    )


def _crop_epilogue(d, zstart, zend, off_x, off_y, sz_w, sz_h, dsize):
    """z-threshold + embed mask (handdetector.py:291-295, 468-473)."""
    zs_b = zstart[:, None, None]
    ze_b = zend[:, None, None]
    d = jnp.where((d < zs_b) & (d != 0.0), zs_b, d)
    d = jnp.where(d > ze_b, 0.0, d)
    return jnp.where(_embed_mask(off_x, off_y, sz_w, sz_h, dsize), d, 0.0)


def _onehot_select(dpt, p, q, base_x=None, base_y=None):
    """crop[b] = R_b @ dpt_b @ C_b^T with one-hot R (dh, H), C (dw, W).

    TPUs have no efficient vector gather; the two matmuls ride the MXU
    instead, and out-of-range indices yield all-zero one-hot rows == the
    reference's zero padding.  base_x/base_y shift p/q into window-relative
    coordinates for the banded fast path.

    HIGHEST precision: the TPU MXU's default 1-pass bf16 would quantize
    the selected depth values (~6 mm error at 1.5 m); bf16x3 is exact for
    a one-hot selection of f32 values.
    """
    h, w = dpt.shape[-2:]
    if base_y is not None:
        q = q - base_y[:, None]
    if base_x is not None:
        p = p - base_x[:, None]
    hh = jnp.arange(h, dtype=jnp.float32)
    ww = jnp.arange(w, dtype=jnp.float32)
    rowsel = (q[:, :, None] == hh[None, None, :]).astype(dpt.dtype)  # (B, dh, H)
    colsel = (p[:, :, None] == ww[None, None, :]).astype(dpt.dtype)  # (B, dw, W)
    rows = jnp.einsum(
        "bih,bhw->biw", rowsel, dpt, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.einsum(
        "biw,bjw->bij", rows, colsel, precision=jax.lax.Precision.HIGHEST
    )


def _crop3d_onehot_batch(dpt, com, cube, fx, fy, dsize):
    """Batched nearest crop via separable one-hot selection matmuls.

    An axis-aligned nearest crop is out[v, u] = dpt[q(v), p(u)] — i.e.
    crop = R @ dpt @ C^T (see _onehot_select).

    A banded variant (dynamic-slice each sample's source window, contract
    over window rows/cols) was measured SLOWER on TPU (5.8 vs 3.5 ms per
    1024 NYU frames): the slice materializes a second copy of the band
    through HBM, and the crop is bandwidth-bound, not MXU-bound.  The
    windowed contraction pays off only where the window lives in VMEM —
    that version is ops/pallas_crop.py.
    """
    b, h, w = dpt.shape
    p, q, zstart, zend, off_x, off_y, sz_w, sz_h = _onehot_crop_geometry(
        com, cube, fx, fy, (h, w), dsize
    )
    d = _onehot_select(dpt, p, q)
    return _crop_epilogue(d, zstart, zend, off_x, off_y, sz_w, sz_h, dsize)


def _linear_taps_1d(off, sz, extent, start, n_out):
    """cv2 half-pixel two-tap geometry along one axis, batched.

    off/sz (embed offset, embedded size), extent (patch size wb|hb) and
    start (patch origin xs|ys) are (B,) f32; n_out is the canvas extent.
    Same f32 op order as the host twin (detector_np._halfpixel_taps) so
    floors and weights agree bit-for-bit.  Returns image-coordinate taps
    (t0, t1) and the blend fraction, each (B, n_out)."""
    u = jnp.arange(n_out, dtype=jnp.float32)
    sp = (u[None, :] - off[:, None] + 0.5) * (extent / sz)[:, None] - 0.5
    t0 = jnp.clip(jnp.floor(sp), 0.0, (extent - 1.0)[:, None])
    frac = jnp.clip(sp - t0, 0.0, 1.0)
    t1 = jnp.minimum(t0 + 1.0, (extent - 1.0)[:, None])
    return t0 + start[:, None], t1 + start[:, None], frac


def _crop3d_bilinear_onehot_batch(dpt, com, cube, fx, fy, dsize):
    """Batched cv2.INTER_LINEAR crop via separable two-tap selection matmuls.

    cv2-exact sampling (r5; closes the r4 "half-pixel" deviation): the
    half-pixel patch-space taps with edge clamping (_linear_taps_1d), each
    tap reading the z-THRESHOLDED zero-padded patch — crop -> threshold ->
    resize, the reference's op order (handdetector.py:291-295, :347-348).
    Bilinear interpolation is separable: out = R @ T @ C^T where T is the
    per-sample thresholded frame, each row of R carries (1-fy, fy) at rows
    (y0, y1) and each row of C carries (1-fx, fx) at columns (x0, x1); at a
    clamped patch edge y0 == y1 and the two weights land on one row,
    summing to 1.  Out-of-image taps produce zero rows, matching the
    patch's zero padding (thresholding keeps 0 at 0).  Runs on the MXU —
    no gathers (ROADMAP "bilinear crop on MXU").

    Same sample coordinates as _crop3d_single(use_bilinear=True); the only
    deviation is summation order (separable vs 4-tap), so agreement with the
    gather path — and the cv2/host twin — is to f32 round-off, not
    bit-exact like the nearest paths.
    """
    b, h, w = dpt.shape
    dw, dh = dsize
    xs, xe, ys, ye, zstart, zend = com_to_bounds(com, cube, fx, fy, (h, w))
    scale, off_x, off_y, sz_w, sz_h = _embed_geometry(xs, xe, ys, ye, dsize)
    wb = xe - xs
    hb = ye - ys

    x0, x1, fxw = _linear_taps_1d(off_x, sz_w, wb, xs, dw)  # (B, dw)
    y0, y1, fyw = _linear_taps_1d(off_y, sz_h, hb, ys, dh)  # (B, dh)

    # getCrop's z-threshold BEFORE the blend (0-pad stays 0 under it)
    zs_b = zstart[:, None, None]
    ze_b = zend[:, None, None]
    thr = jnp.where((dpt < zs_b) & (dpt != 0.0), zs_b, dpt)
    thr = jnp.where(thr > ze_b, 0.0, thr)

    hh = jnp.arange(h, dtype=jnp.float32)
    ww = jnp.arange(w, dtype=jnp.float32)
    rowsel = (y0[:, :, None] == hh[None, None, :]) * (1.0 - fyw)[:, :, None] + (
        y1[:, :, None] == hh[None, None, :]
    ) * fyw[:, :, None]  # (B, dh, H)
    colsel = (x0[:, :, None] == ww[None, None, :]) * (1.0 - fxw)[:, :, None] + (
        x1[:, :, None] == ww[None, None, :]
    ) * fxw[:, :, None]  # (B, dw, W)

    rows = jnp.einsum(
        "bih,bhw->biw", rowsel.astype(dpt.dtype), thr,
        precision=jax.lax.Precision.HIGHEST,
    )
    d = jnp.einsum(
        "biw,bjw->bij", rows, colsel.astype(dpt.dtype),
        precision=jax.lax.Precision.HIGHEST,
    )
    # embed mask only — NO post-blend z-threshold (it ran per tap above)
    return jnp.where(_embed_mask(off_x, off_y, sz_w, sz_h, dsize), d, 0.0)


def _crop3d_nd_bilinear_batch(dpt, com, cube, fx, fy, dsize):
    """Batched ND-aware bilinear crop — the reference's RESIZE_BILINEAR
    method (handdetector.py:57-69, 132-202) fused into the crop.

    Reference order is crop -> z-threshold -> bilinearResize(ND-aware)
    (handdetector.py:443-465): each of the 4 taps is read from the
    z-thresholded, zero-padded crop patch; invalid (== ND == 0) taps drop
    out of the interpolation with weight renormalization; >= 3 invalid
    taps -> ND.  Sample positions use cv2's half-pixel convention with
    edge-clamped taps, exactly like ops/resize.resize_bilinear_nd (whose
    nd_blend this shares) — patch coordinates here are computed in f32 in
    the same op order as the host oracle (detector_np.resize_bilinear_nd)
    so the two agree to f32 round-off.

    Gather-based: the renormalizing blend is NOT separable, so there is
    no one-hot/Pallas MXU formulation of this method (select those paths
    with resize='nearest'/'linear'; this one exists for reference parity,
    not as the TPU hot path)."""
    from deepprior_tpu.ops.resize import nd_blend

    b, h, w = dpt.shape
    dw, dh = dsize
    xs, xe, ys, ye, zstart, zend = com_to_bounds(com, cube, fx, fy, (h, w))
    scale, off_x, off_y, sz_w, sz_h = _embed_geometry(xs, xe, ys, ye, dsize)
    wb = xe - xs
    hb = ye - ys

    u = jax.lax.broadcasted_iota(jnp.float32, (dh, dw), 1)[None]
    v = jax.lax.broadcasted_iota(jnp.float32, (dh, dw), 0)[None]
    in_embed = _embed_mask(off_x, off_y, sz_w, sz_h, dsize)
    # half-pixel mapping in PATCH coords, taps clamped to the patch
    # (resize_bilinear_nd:41-51 semantics on the cropped image)
    xsp = (u - off_x[:, None, None] + 0.5) * (wb / sz_w)[:, None, None] - 0.5
    ysp = (v - off_y[:, None, None] + 0.5) * (hb / sz_h)[:, None, None] - 0.5
    x0 = jnp.clip(jnp.floor(xsp), 0.0, (wb - 1)[:, None, None])
    y0 = jnp.clip(jnp.floor(ysp), 0.0, (hb - 1)[:, None, None])
    fxw = jnp.clip(xsp - x0, 0.0, 1.0)
    fyw = jnp.clip(ysp - y0, 0.0, 1.0)
    x1 = jnp.minimum(x0 + 1.0, (wb - 1)[:, None, None])
    y1 = jnp.minimum(y0 + 1.0, (hb - 1)[:, None, None])

    def tap(yp, xp):
        # patch -> image coords; outside the image the patch is 0-padded
        xi = xp + xs[:, None, None]
        yi = yp + ys[:, None, None]
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        val = jax.vmap(_gather2d)(
            dpt, yi.astype(jnp.int32), xi.astype(jnp.int32)
        )
        val = jnp.where(inb, val, 0.0)
        # z-threshold BEFORE the blend (getCrop runs before resizeCrop)
        zs = zstart[:, None, None]
        ze = zend[:, None, None]
        val = jnp.where((val < zs) & (val != 0.0), zs, val)
        return jnp.where(val > ze, 0.0, val)

    d = nd_blend(tap(y0, x0), tap(y0, x1), tap(y1, x0), tap(y1, x1),
                 fyw, fxw, nd_value=0.0)
    # no epilogue z-threshold: it already ran per tap (reference order)
    return jnp.where(in_embed, d, 0.0)


def crop3d(dpt, com, cube, fx, fy, dsize=(128, 128), use_bilinear=False,
           method="gather", resize=None):
    """Batched fused cube crop: raw depth maps -> (B, dh, dw) mm patches.

    Equivalent of `HandDetector.cropArea3D` (handdetector.py:382-490) minus
    the optional docom/refineNet recrops (those live in ops/com.py and
    compose with this).  Invalid/far/background pixels are 0; near pixels
    are clamped to zstart.

    dpt:  (B, H, W) float32, already clamped via `clamp_depth`
    com:  (B, 3) in image coords (u, v, d)
    cube: (B, 3) or (3,) metric cube in mm
    method: 'gather' (reference-exact dynamic gather) or 'onehot'
            (MXU-friendly selection matmuls — same indexing, no gather;
            the fast path on TPU)
    resize: the reference ctor's resize-method switch (handdetector.py:
            57-69): 'nearest' (RESIZE_CV2_NN, the reference default —
            bit-exact here), 'linear' (RESIZE_CV2_LINEAR — cv2-exact
            half-pixel mapping with edge-clamped taps, reference op order
            crop -> threshold -> resize; the gather path matches the host
            cv2 twin to <=2 ulp (XLA FMA contraction of the blend; taps
            and weights bit-identical), the one-hot/Pallas paths agree to
            f32 round-off — r5, closes the r4 deviation), or 'nd_bilinear'
            (RESIZE_BILINEAR, the ND-aware hand-written resize —
            reference-ordered threshold-then-blend, gather-based on every
            `method`).  None keeps the legacy use_bilinear flag
            (False -> nearest, True -> linear).
    Returns (crop_mm (B, dh, dw), M (B, 3, 3)).
    """
    dpt = jnp.asarray(dpt, jnp.float32)
    com = jnp.asarray(com, jnp.float32)
    cube = jnp.broadcast_to(jnp.asarray(cube, jnp.float32), com.shape)
    if resize is not None:
        if resize not in ("nearest", "linear", "nd_bilinear"):
            raise ValueError(
                f"unknown resize method {resize!r} (want 'nearest', "
                f"'linear' or 'nd_bilinear')"
            )
        use_bilinear = resize == "linear"
    if resize == "nd_bilinear":
        crop = _crop3d_nd_bilinear_batch(dpt, com, cube, fx, fy, dsize)
        m = crop_transform(com, cube, fx, fy, dpt.shape[-2:], dsize)
        return crop, m
    if method == "onehot" and use_bilinear:
        crop = _crop3d_bilinear_onehot_batch(dpt, com, cube, fx, fy, dsize)
    elif method == "onehot":
        crop = _crop3d_onehot_batch(dpt, com, cube, fx, fy, dsize)
    else:
        crop_fn = lambda d, c, cb: _crop3d_single(
            d, c, cb, fx, fy, dsize, use_bilinear
        )[0]
        crop = jax.vmap(crop_fn)(dpt, com, cube)
    m = crop_transform(com, cube, fx, fy, dpt.shape[-2:], dsize)
    return crop, m


def normalize_crop(crop_mm, com_z, cube_z, norm_zero_one=False):
    """Depth (mm) crop -> normalized network input.

    [-1, 1] mode (reference dataset.py:98-103): background (0) -> +1,
    out = (d - com_z) / (cube_z/2).
    [0, 1] mode (dataset.py:92-95): out = (d - (com_z - cube_z/2)) / cube_z.

    com_z/cube_z broadcast against crop_mm's leading axes.
    """
    crop_mm = jnp.asarray(crop_mm, jnp.float32)
    com_z = jnp.asarray(com_z, jnp.float32)[..., None, None]
    cube_z = jnp.asarray(cube_z, jnp.float32)[..., None, None]
    d = jnp.where(crop_mm == 0.0, com_z + cube_z / 2.0, crop_mm)
    if norm_zero_one:
        return (d - (com_z - cube_z / 2.0)) / cube_z
    return (d - com_z) / (cube_z / 2.0)


def normalized_crop(
    dpt, com, cube, fx, fy, dsize=(128, 128), norm_zero_one=False,
    use_bilinear=False, method="gather", resize=None
):
    """Fused crop + normalize: the full inference-time preprocessing.

    One XLA program: bounds -> warp-gather -> z-threshold -> normalize.
    `resize` selects the reference's resize method (see crop3d).
    Returns (crop_norm (B, dh, dw), M (B, 3, 3)).
    """
    crop, m = crop3d(dpt, com, cube, fx, fy, dsize, use_bilinear, method,
                     resize=resize)
    cube_b = jnp.broadcast_to(jnp.asarray(cube, jnp.float32), jnp.asarray(com).shape)
    return normalize_crop(crop, jnp.asarray(com)[..., 2], cube_b[..., 2], norm_zero_one), m


def warp_patch(patch, m_fwd, out_hw=None, border=0.0, nv_val=None, use_bilinear=False):
    """Warp an already-cropped patch by a forward 3x3 transform.

    Equivalent of `HandDetector.recropHand`'s cv2.warpPerspective call
    (handdetector.py:782-793): out(dst) = patch(m_fwd^-1 . dst) with
    constant border, nearest sampling via round-to-nearest (cv2 warp
    semantics, unlike resize's floor), and optional nv_val masking (values
    close to nv_val -> border; the reference uses 32000, NYU's invalid
    marker).  z-thresholding is the caller's job (augment.py).

    patch: (..., H, W); m_fwd: (..., 3, 3) batched like patch.
    """
    patch = jnp.asarray(patch, jnp.float32)
    m_fwd = jnp.asarray(m_fwd, jnp.float32)

    from deepprior_tpu.geometry import inv3x3

    def one(img, m):
        h, w = img.shape
        oh, ow = out_hw if out_hw is not None else (h, w)
        m_inv = inv3x3(m)
        u = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 1)
        v = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 0)
        # elementwise affine, NOT an einsum: on TPU a default-precision
        # matmul would push the coordinates through 1-pass bf16 and shift
        # sampled indices by up to half a pixel
        sx = m_inv[0, 0] * u + m_inv[0, 1] * v + m_inv[0, 2]
        sy = m_inv[1, 0] * u + m_inv[1, 1] * v + m_inv[1, 2]
        sz = m_inv[2, 0] * u + m_inv[2, 1] * v + m_inv[2, 2]
        x = sx / sz
        y = sy / sz
        if use_bilinear:
            x0, y0 = jnp.floor(x), jnp.floor(y)
            fx_, fy_ = x - x0, y - y0

            def sample(qi, pi):
                inb = (pi >= 0) & (pi < w) & (qi >= 0) & (qi < h)
                val = _gather2d(img, qi.astype(jnp.int32), pi.astype(jnp.int32))
                return jnp.where(inb, val, border)

            out = (
                sample(y0, x0) * (1 - fx_) * (1 - fy_)
                + sample(y0, x0 + 1) * fx_ * (1 - fy_)
                + sample(y0 + 1, x0) * (1 - fx_) * fy_
                + sample(y0 + 1, x0 + 1) * fx_ * fy_
            )
        else:
            p = jnp.floor(x + 0.5)
            q = jnp.floor(y + 0.5)
            in_img = (p >= 0) & (p < w) & (q >= 0) & (q < h)
            out = _gather2d(img, q.astype(jnp.int32), p.astype(jnp.int32))
            out = jnp.where(in_img, out, border)
        if nv_val is not None:
            out = jnp.where(jnp.isclose(out, nv_val), border, out)
        return out

    batch_shape = patch.shape[:-2]
    if batch_shape:
        flat_p = patch.reshape((-1,) + patch.shape[-2:])
        flat_m = m_fwd.reshape((-1, 3, 3))
        out = jax.vmap(one)(flat_p, flat_m)
        return out.reshape(batch_shape + out.shape[-2:])
    return one(patch, m_fwd)
