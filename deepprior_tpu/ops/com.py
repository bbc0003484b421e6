"""Center-of-mass hand localization, batched for TPU.

Replaces `HandDetector.calculateCoM` / `refineCoMIterative` (reference
src/util/handdetector.py:91-108, 546-567).  Instead of dynamically slicing
a crop and running scipy's center_of_mass, the CoM is computed as a masked
moment over the full (static-shape) depth map — the bbox crop becomes part
of the mask.  Fully vmappable and jittable; the iterative refinement is a
`lax.fori_loop`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deepprior_tpu.ops.crop import clamp_depth, com_to_bounds


def calculate_com(dpt, min_depth=10.0, max_depth=1500.0):
    """CoM of the valid depth pixels: (mean col, mean row, mean depth).

    Mirrors handdetector.py:91-108: pixels outside [min_depth, max_depth]
    are ignored; an empty image yields (0, 0, 0).

    dpt: (..., H, W).  min/max_depth broadcast over the batch.  Returns
    (..., 3).
    """
    dpt = jnp.asarray(dpt, jnp.float32)
    h, w = dpt.shape[-2:]
    min_d = jnp.asarray(min_depth, jnp.float32)[..., None, None]
    max_d = jnp.asarray(max_depth, jnp.float32)[..., None, None]
    valid = (dpt >= min_d) & (dpt <= max_d) & (dpt > 0.0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    rows = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    num = jnp.sum(valid, axis=(-2, -1)).astype(jnp.float32)
    safe = jnp.maximum(num, 1.0)
    cx = jnp.sum(jnp.where(valid, cols, 0.0), axis=(-2, -1)) / safe
    cy = jnp.sum(jnp.where(valid, rows, 0.0), axis=(-2, -1)) / safe
    cz = jnp.sum(jnp.where(valid, dpt, 0.0), axis=(-2, -1)) / safe
    com = jnp.stack([cx, cy, cz], axis=-1)
    return jnp.where((num > 0)[..., None], com, 0.0)


def check_image(dpt, tol=1.0):
    """Content check: std(dpt) >= tol (handdetector.py:110-120)."""
    dpt = jnp.asarray(dpt, jnp.float32)
    return jnp.std(dpt, axis=(-2, -1)) >= tol


def _masked_com_in_bounds(dpt, xstart, xend, ystart, yend, zstart, zend,
                          empty_z=None, min_depth=None, max_depth=None):
    """CoM of the bbox crop with z-thresholding, without materializing it.

    The reference crops (with 0-padding outside the image), z-thresholds
    (near -> zstart, far -> 0) and runs calculateCoM on the result
    (handdetector.py:554-563).  Equivalent masked formulation:
    valid = in-bbox & in-image & d != 0 & d <= zend, value = max(d, zstart),
    and — because calculateCoM re-masks by the detector's per-image depth
    limits (handdetector.py:91-108) — value within [min_depth, max_depth]
    when limits are given.  That last mask matters when zstart exceeds
    max_depth: every near-clamped pixel is rejected and the whole crop
    goes empty (a constant plane seeded from far away does this —
    prof_detect_sweep.py caught its omission).  min side: value =
    max(d, zstart) >= d >= min_depth on clamped input, a no-op, kept for
    contract completeness.
    The returned x/y are in full-image coordinates (the reference adds back
    max(xstart, 0), i.e. the in-image crop origin — identical result since
    padding contributes nothing).
    """
    h, w = dpt.shape
    cols = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    rows = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    in_bbox = (cols >= xstart) & (cols < xend) & (rows >= ystart) & (rows < yend)
    valid = in_bbox & (dpt != 0.0) & (dpt <= zend)
    value = jnp.maximum(dpt, zstart)
    if max_depth is not None:
        valid = valid & (value <= max_depth)
    if min_depth is not None:
        valid = valid & (value >= min_depth)
    num = jnp.sum(valid).astype(jnp.float32)
    safe = jnp.maximum(num, 1.0)
    cx = jnp.sum(jnp.where(valid, cols, 0.0)) / safe
    cy = jnp.sum(jnp.where(valid, rows, 0.0)) / safe
    cz = jnp.sum(jnp.where(valid, value, 0.0)) / safe
    com = jnp.stack([cx, cy, cz])

    # empty-crop fallback (handdetector.py:561-564): the z-THRESHOLDED
    # crop's center pixel as depth — crop coords (oh//2, ow//2) map to
    # image coords (ystart + oh//2, xstart + ow//2); outside the image
    # that pixel is constant padding (0), and the getCrop threshold
    # (near -> zstart, far -> 0) applies to whatever it reads.  The crop
    # origin stays SIGNED image coordinates like the host twin
    # (detector_np.refine_com_iterative) where the reference adds
    # max(xstart, 0) — off by |xstart| for bboxes crossing the left/top
    # edge (documented deviation, same class as the getCrop
    # negative-slice wrap; prof_detect_sweep.py pins the host contract).
    from deepprior_tpu.ops.crop import _exact_floor_div

    ccx = xstart + _exact_floor_div(xend - xstart, 2.0)
    ccy = ystart + _exact_floor_div(yend - ystart, 2.0)
    inside = (ccx >= 0) & (ccx < w) & (ccy >= 0) & (ccy < h)
    raw = dpt[
        jnp.clip(ccy, 0, h - 1).astype(jnp.int32),
        jnp.clip(ccx, 0, w - 1).astype(jnp.int32),
    ]
    center_d = jnp.where(inside, raw, 0.0)
    center_d = jnp.where(
        (center_d != 0.0) & (center_d < zstart), zstart, center_d
    )
    center_d = jnp.where(center_d > zend, 0.0, center_d)
    if empty_z is not None:
        # docom's extra constant: a degenerate center depth falls back to
        # 300 mm (handdetector.py:415-418; host oracle detector_np.py:130-132).
        # Plain refineCoMIterative (handdetector.py:561-564) does NOT apply
        # it, hence the opt-in.
        center_d = jnp.where(center_d == 0.0, jnp.float32(empty_z), center_d)
    fallback = jnp.stack([xstart, ystart, center_d])
    return jnp.where(num > 0, com, fallback)


def refine_com_iterative(dpt, com, cube, fx, fy, num_iter=5, empty_z=None,
                         min_depth=None, max_depth=None):
    """Iterative CoM refinement: crop -> CoM -> recenter, `num_iter` times.

    Mirrors handdetector.py:546-567.  Batched over leading axes of
    dpt (B, H, W) / com (B, 3); cube (3,) or (B, 3); static num_iter.
    empty_z: optional z fallback (mm) when the crop is empty AND the bbox
    center has no depth — pass 300.0 on the docom import path
    (handdetector.py:415-418); leave None elsewhere.
    min_depth/max_depth: the detector's per-image depth limits (scalar or
    (B,)) — pass the values `clamp_depth` returned for this image, since
    the reference's inner calculateCoM re-masks by them (it drops
    near-clamped pixels whenever zstart > max_depth).  When omitted the
    defaults are clamp_depth's own defaults (min 10, max 1500 — the clamp
    ceiling), so omission can only be exact-or-LOOSER than the true
    per-image limits, never tighter (an r4 advisor finding: deriving max
    from the per-image jnp.max underestimated the limit whenever the
    deepest surviving band was vacated after clamping).  Callers with the
    real limits in hand should still pass them.
    """
    dpt = jnp.asarray(dpt, jnp.float32)
    com = jnp.asarray(com, jnp.float32)
    cube = jnp.broadcast_to(jnp.asarray(cube, jnp.float32), com.shape)
    img_hw = dpt.shape[-2:]
    batch = com.shape[:-1]
    if min_depth is None:
        min_depth = 10.0
    if max_depth is None:
        max_depth = 1500.0
    min_d = jnp.broadcast_to(jnp.asarray(min_depth, jnp.float32), batch)
    max_d = jnp.broadcast_to(jnp.asarray(max_depth, jnp.float32), batch)

    def one(d, c0, cb, mn, mx):
        def body(_, c):
            xs, xe, ys, ye, zs, ze = com_to_bounds(c, cb, fx, fy, img_hw)
            return _masked_com_in_bounds(d, xs, xe, ys, ye, zs, ze, empty_z,
                                         mn, mx)

        return jax.lax.fori_loop(0, num_iter, body, c0)

    if dpt.ndim == 2:
        return one(dpt, com, cube, min_d, max_d)
    return jax.vmap(one)(dpt, com, cube, min_d, max_d)


def detect_closest(dpt, cube, fx, fy, num_iter=5, min_depth=10.0, max_depth=1500.0):
    """Device-side hand detection: seed at the closest valid pixel, then
    refine the CoM iteratively.

    Cheap variant of `HandDetector.detect` (handdetector.py:569-632) with
    NO minimum-area gate: a single-pixel noise speck nearer than the hand
    wins the seed.  Use `detect` below for the reference's slice-scan +
    min-area-blob semantics (it costs a connected-components pass); this
    one survives for clean scenes where the closest object IS the hand.
    The host-side twin lives in data/detector_np.py (HandCropper.detect).

    dpt: (B, H, W) clamped depth. min_depth/max_depth: scalar or (B,) —
    pass the per-image limits `clamp_depth` returned (the reference's
    detector state). Returns (B, 3) CoM.
    """
    dpt = jnp.asarray(dpt, jnp.float32)
    h, w = dpt.shape[-2:]
    batch = dpt.shape[:-2]
    min_d = jnp.broadcast_to(jnp.asarray(min_depth, jnp.float32), batch)
    max_d = jnp.broadcast_to(jnp.asarray(max_depth, jnp.float32), batch)

    def seed(d, mn, mx):
        valid = (d >= mn) & (d <= mx) & (d > 0)
        key = jnp.where(valid, d, jnp.inf)
        idx = jnp.argmin(key.reshape(-1))
        q, p = idx // w, idx % w
        return jnp.stack(
            [p.astype(jnp.float32), q.astype(jnp.float32), d[q, p]]
        )

    com0 = (
        jax.vmap(seed)(dpt, min_d, max_d)
        if dpt.ndim == 3
        else seed(dpt, min_d, max_d)
    )
    return refine_com_iterative(dpt, com0, cube, fx, fy, num_iter,
                                min_depth=min_d, max_depth=max_d)


def _shift(x, axis, offset, fill):
    """Shift `x` by `offset` along `axis`, filling vacated slots."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (max(offset, 0), max(-offset, 0))
    padded = jnp.pad(x, pad, constant_values=fill)
    sl = [slice(None)] * x.ndim
    n = x.shape[axis]
    sl[axis] = slice(0, n) if offset > 0 else slice(-n, None)
    return padded[tuple(sl)]


def _seg_min_scan(lab, mask, axis, region=None):
    """Min of `lab` within each maximal run of connected pixels along
    `axis`; runs break at unmasked pixels and (if `region` is given) where
    the region id changes.

    Closed form, no gathers and no associative_scan (both lower badly —
    gathers to scalar loads, assoc-scan to O(n log n) with poor constants):
    a segmented prefix-min is cummin(lab - K*cumsum(reset)) + K*cumsum(reset)
    with K > max(lab), because keys from earlier segments are offset upward
    by at least K and can never win the min.  Forward + backward passes
    give the full run min.
    """
    axis = axis % lab.ndim
    k = jnp.int32(lab.shape[-1] * lab.shape[-2] + 1)

    def directional(offset):
        r = ~mask
        if region is not None:
            r = r | (region != _shift(region, axis, offset, -1))
        cnt = jax.lax.cumsum(r.astype(jnp.int32), axis=axis,
                             reverse=(offset < 0))
        key = lab - k * cnt
        cm = jax.lax.cummin(key, axis=axis, reverse=(offset < 0))
        return cm + k * cnt

    return jnp.minimum(directional(1), directional(-1))


def label_components(mask, region=None):
    """Connected-component labels via alternating row/column segmented
    min-scans; jittable, static shapes, no gathers.

    mask: (H, W) bool.  region: optional (H, W) int — pixels connect only
    within equal region ids (used to label every depth slice of `detect`
    in ONE pass).  Returns (H, W) int32: each foreground pixel holds the
    smallest linear index of its 4-connected component; background holds
    H*W.  Each iteration floods labels across entire horizontal runs then
    entire vertical runs, so convergence takes O(#turns of the blob
    contour) iterations (a handful for hand-like blobs), checked by a
    while_loop fixpoint.
    """
    h, w = mask.shape
    big = jnp.int32(h * w)
    iota = (
        jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
        + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    )
    init = jnp.where(mask, iota, big)

    def body(state):
        lab, _ = state
        lab2 = jnp.where(mask, _seg_min_scan(lab, mask, -1, region), big)
        lab3 = jnp.where(mask, _seg_min_scan(lab2, mask, -2, region), big)
        return lab3, lab

    def cond(state):
        lab, prev = state
        return jnp.any(lab != prev)

    lab, _ = jax.lax.while_loop(cond, body, (init, jnp.full_like(init, -1)))
    return lab


def _first_big_blob_com(valid, q, dpt, num_slices, min_area):
    """(found, com) of the largest blob in the first depth slice whose
    largest 4-connected blob exceeds `min_area` pixels.

    valid: (H, W) bool, q: (H, W) int32 slice index per pixel, dpt: (H, W)
    clamped depth.  Components are labeled in ONE pass with q as the
    connectivity region, then per-component area/slice come from one
    scatter-histogram over labels.  com is (mean col, mean row, mean
    depth-over-blob), matching the reference's centroid of the winning
    contour (handdetector.py:592-607; host twin detector_np.py
    HandCropper.detect).
    """
    h, w = valid.shape
    hw = h * w
    lab = label_components(valid, q)
    flat = lab.reshape(-1)
    ones = valid.reshape(-1).astype(jnp.float32)
    counts = jnp.zeros(hw + 1, jnp.float32).at[flat].add(ones)
    counts = counts.at[hw].set(0.0)
    # slice id per component (uniform within one by construction)
    slice_of = (
        jnp.zeros(hw + 1, jnp.int32).at[flat].max((q.reshape(-1) + 1))
    )  # 0 = background, else slice+1
    qualifies = counts > float(min_area)
    first_slice = jnp.min(
        jnp.where(qualifies, slice_of, num_slices + 2)
    )
    found = first_slice <= num_slices + 1
    target = qualifies & (slice_of == first_slice)
    best = jnp.argmax(jnp.where(target, counts, -1.0))
    blob = (lab == best) & valid
    cols = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    rows = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    n = jnp.maximum(counts[best], 1.0)
    com = jnp.stack(
        [
            jnp.sum(jnp.where(blob, cols, 0.0)) / n,
            jnp.sum(jnp.where(blob, rows, 0.0)) / n,
            jnp.sum(jnp.where(blob, dpt, 0.0)) / n,
        ]
    )
    return found, com


def detect(dpt, cube, fx, fy, num_slices=20, min_area=200, num_iter=5):
    """Full device-side detection with the reference's semantics: scan
    `num_slices` near-to-far depth slices, take the largest connected blob
    of the FIRST slice whose largest blob exceeds `min_area` pixels, then
    refine the CoM iteratively (handdetector.py:569-632; host twin
    data/detector_np.py HandCropper.detect, which this matches on synthetic
    multi-object scenes — tests/test_com.py).

    All slices are labeled in ONE batched pass (the slice index acts as a
    connectivity region; the reference's early exit becomes a select over
    per-component stats) so the whole detector is one XLA program — no
    10-30 ms host scipy pass in the realtime loop.  Sole deviation: a pixel
    exactly on an interior slice boundary belongs to one slice here but to
    both overlapping slices in the reference's [lo, hi] scans — an exact-
    float-equality event with no practical effect.

    dpt: (B, H, W) RAW depth (per-image clamping is applied here, like the
    HandCropper constructor).  Returns (B, 3) CoM, zeros where nothing
    exceeds the area gate.
    """
    dpt = jnp.asarray(dpt, jnp.float32)
    squeeze = dpt.ndim == 2
    if squeeze:
        dpt = dpt[None]
    b, h, w = dpt.shape
    dc, dmin, dmax = clamp_depth(dpt)  # ctor clamp, one source of truth
    dz = jnp.maximum((dmax - dmin) / float(num_slices), 1e-6)  # (B,)
    valid = dc > 0.0
    q = jnp.clip(
        jnp.floor((dc - dmin[:, None, None]) / dz[:, None, None]),
        0,
        num_slices - 1,
    ).astype(jnp.int32)

    found, com0 = jax.vmap(
        lambda v, qq, d: _first_big_blob_com(v, qq, d, num_slices, min_area)
    )(valid, q, dc)
    com = refine_com_iterative(dc, com0, cube, fx, fy, num_iter,
                                min_depth=dmin, max_depth=dmax)
    com = jnp.where(found[:, None], com, 0.0)
    return com[0] if squeeze else com
