"""Pallas fused crop kernel vs. the reference jnp path (interpret mode on
CPU; the same kernel compiles with Mosaic on TPU)."""

import numpy as np
import pytest

import jax

from deepprior_tpu.camera import NYU_CAMERA
from deepprior_tpu.data.synthetic import make_frame
from deepprior_tpu.ops.crop import clamp_depth, normalized_crop


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(21)
    cam = NYU_CAMERA
    frames = [make_frame(cam, rng) for _ in range(4)]
    dpt = np.stack([f.extraData["dpt_full"] for f in frames])
    com = np.stack([f.com for f in frames])
    dpt_c, _, _ = clamp_depth(dpt)
    return cam, np.asarray(dpt_c), com


@pytest.fixture(scope="module")
def scene_icvl():
    from deepprior_tpu.camera import ICVL_CAMERA

    rng = np.random.default_rng(33)
    cam = ICVL_CAMERA
    frames = [make_frame(cam, rng) for _ in range(4)]
    dpt = np.stack([f.extraData["dpt_full"] for f in frames])
    com = np.stack([f.com for f in frames])
    dpt_c, _, _ = clamp_depth(dpt)
    return cam, np.asarray(dpt_c), com


def test_pallas_crop_matches_jnp(scene):
    from jax.experimental.pallas import tpu as pltpu

    from deepprior_tpu.ops.pallas_crop import pallas_normalized_crop

    cam, dpt, com = scene
    cube = np.array([250.0, 250.0, 250.0], np.float32)
    ref, m_ref = normalized_crop(dpt, com, cube, cam.fx, cam.fy)
    with pltpu.force_tpu_interpret_mode():
        out, m = pallas_normalized_crop(dpt, com, cube, cam.fx, cam.fy)
    out, ref = np.asarray(out), np.asarray(ref)
    # identical indexing math -> near-exact agreement
    mismatched = np.mean(np.abs(out - ref) > 1e-4)
    assert mismatched < 1e-3, f"{mismatched:.2%} pixels differ"
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref), rtol=1e-6)

    # a 900 mm cube's source band exceeds the in-VMEM window -> the kernel's
    # full-frame branch; must agree the same way
    big = np.array([900.0, 900.0, 900.0], np.float32)
    ref_b, _ = normalized_crop(dpt, com, big, cam.fx, cam.fy)
    with pltpu.force_tpu_interpret_mode():
        out_b, _ = pallas_normalized_crop(dpt, com, big, cam.fx, cam.fy)
    mismatched = np.mean(np.abs(np.asarray(out_b) - np.asarray(ref_b)) > 1e-4)
    assert mismatched < 1e-3


def test_pallas_fused_clamp(scene):
    """fuse_clamp=True on the RAW frame == clamp_depth then the plain
    kernel (the clamp is elementwise; selection is one-hot -> identical)."""
    from jax.experimental.pallas import tpu as pltpu

    from deepprior_tpu.ops.pallas_crop import pallas_normalized_crop

    cam, dpt_clamped, com = scene
    rng = np.random.default_rng(5)
    raw = np.array(dpt_clamped)
    # re-introduce out-of-range pixels the clamp must remove
    mask = rng.uniform(size=raw.shape) < 0.01
    raw[mask] = rng.uniform(1600.0, 2500.0, mask.sum())
    cube = np.array([250.0, 250.0, 250.0], np.float32)

    from deepprior_tpu.ops.crop import clamp_depth

    cleaned, _, _ = clamp_depth(raw)
    with pltpu.force_tpu_interpret_mode():
        ref, _ = pallas_normalized_crop(
            np.asarray(cleaned), com, cube, cam.fx, cam.fy
        )
        out, _ = pallas_normalized_crop(
            raw, com, cube, cam.fx, cam.fy, fuse_clamp=True
        )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_pallas_crop_zero_one(scene):
    from jax.experimental.pallas import tpu as pltpu

    from deepprior_tpu.ops.pallas_crop import pallas_normalized_crop

    cam, dpt, com = scene
    cube = np.array([250.0, 250.0, 250.0], np.float32)
    ref, _ = normalized_crop(dpt, com, cube, cam.fx, cam.fy, norm_zero_one=True)
    with pltpu.force_tpu_interpret_mode():
        out, _ = pallas_normalized_crop(
            dpt, com, cube, cam.fx, cam.fy, norm_zero_one=True
        )
    mismatched = np.mean(np.abs(np.asarray(out) - np.asarray(ref)) > 1e-4)
    assert mismatched < 1e-3


def test_pallas_crop_icvl_sized(scene_icvl):
    """320x240 frames (ICVL/MSRA) now get a banded window too (160-row
    full-width band, window_dims) — and must agree with the jnp path both
    when the band fits and on the full-frame fallback."""
    from jax.experimental.pallas import tpu as pltpu

    from deepprior_tpu.ops.pallas_crop import pallas_normalized_crop, window_dims

    assert window_dims(240, 320) == (160, 320)
    assert window_dims(480, 640) == (384, 512)
    assert window_dims(128, 128) == (128, 128)

    cam, dpt, com = scene_icvl
    cube = np.array([250.0, 250.0, 250.0], np.float32)
    ref, m_ref = normalized_crop(dpt, com, cube, cam.fx, cam.fy)
    with pltpu.force_tpu_interpret_mode():
        out, m = pallas_normalized_crop(dpt, com, cube, cam.fx, cam.fy)
    mismatched = np.mean(np.abs(np.asarray(out) - np.asarray(ref)) > 1e-4)
    assert mismatched < 1e-3, f"{mismatched:.2%} pixels differ"
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref), rtol=1e-6)

    # a huge cube's band exceeds the 160-row window -> full-frame branch
    big = np.array([900.0, 900.0, 900.0], np.float32)
    ref_b, _ = normalized_crop(dpt, com, big, cam.fx, cam.fy)
    with pltpu.force_tpu_interpret_mode():
        out_b, _ = pallas_normalized_crop(dpt, com, big, cam.fx, cam.fy)
    mismatched = np.mean(np.abs(np.asarray(out_b) - np.asarray(ref_b)) > 1e-4)
    assert mismatched < 1e-3


@pytest.mark.parametrize("scene_name", ["nyu", "icvl"])
def test_pallas_bilinear(scene, scene_icvl, scene_name):
    """In-kernel two-tap bilinear selection vs the XLA two-tap MXU path
    (ops.crop method='onehot', use_bilinear=True): same separable math,
    agreement to f32 round-off on both frame sizes."""
    from jax.experimental.pallas import tpu as pltpu

    from deepprior_tpu.ops.pallas_crop import pallas_normalized_crop

    cam, dpt, com = scene if scene_name == "nyu" else scene_icvl
    cube = np.array([250.0, 250.0, 250.0], np.float32)
    ref, _ = normalized_crop(
        dpt, com, cube, cam.fx, cam.fy, use_bilinear=True, method="onehot"
    )
    with pltpu.force_tpu_interpret_mode():
        out, _ = pallas_normalized_crop(
            dpt, com, cube, cam.fx, cam.fy, use_bilinear=True
        )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


def test_pallas_crop_win_rows(scene):
    """A dataset-geometry row bound (win_rows) keeps the crop bit-exact;
    an impossibly tight bound trips the full-frame fallback, still exact."""
    from jax.experimental.pallas import tpu as pltpu

    from deepprior_tpu.ops.pallas_crop import (
        band_rows_for,
        pallas_normalized_crop,
        window_dims,
    )

    cam, dpt, com = scene
    cube = (250.0, 250.0, 250.0)
    ref, m_ref = normalized_crop(
        dpt, com, cube, cam.fx, cam.fy, method="onehot"
    )

    rows = band_rows_for(cam.fy, cube[2], float(com[:, 2].min()))
    assert rows < 384  # actually narrower than the default window
    assert window_dims(480, 640, rows) == (rows, 512)

    with pltpu.force_tpu_interpret_mode():
        got, m = pallas_normalized_crop(
            dpt, com, cube, cam.fx, cam.fy, win_rows=rows
        )
        # bound far tighter than any hand: every sample falls back
        tight, _ = pallas_normalized_crop(
            dpt, com, cube, cam.fx, cam.fy, win_rows=16
        )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(tight), np.asarray(ref))
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref))


@pytest.mark.slow
def test_pallas_crop_win_cols_and_blocked(scene):
    """win_cols (contiguous full-width band / full-frame block) and
    block_k (K-samples-per-step manual-DMA pipeline) are pure speed knobs:
    bit-exact vs the onehot XLA path, including odd batch sizes that force
    the blocked kernel's pad-and-trim."""
    from jax.experimental.pallas import tpu as pltpu

    from deepprior_tpu.ops.pallas_crop import (
        pallas_normalized_crop,
        window_dims,
    )

    cam, dpt, com = scene
    cube = (250.0, 250.0, 250.0)
    ref, _ = normalized_crop(dpt, com, cube, cam.fx, cam.fy, method="onehot")

    # win_cols >= width disables column banding (contiguous band DMA)
    assert window_dims(480, 640, 304, 640) == (304, 640)
    # win_cols still honors the lane alignment when narrowing
    assert window_dims(480, 640, None, 300) == (384, 384)

    with pltpu.force_tpu_interpret_mode():
        for kw in (
            dict(win_rows=304, win_cols=640),           # contiguous band
            dict(win_rows=480, win_cols=640),           # full-frame block
            dict(win_rows=304, block_k=2),              # strided + blocked
            dict(win_rows=304, win_cols=640, block_k=2),  # contig + blocked
            dict(win_rows=480, win_cols=640, block_k=2),  # fullfrm + blocked
            dict(win_rows=304, win_cols=640, block_k=3),  # pad-and-trim (4%3)
        ):
            got, _ = pallas_normalized_crop(
                dpt, com, cube, cam.fx, cam.fy, **kw
            )
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_band_covers_taps():
    """The banded window's per-axis source band must cover EVERY tap the
    kernel reads, for both resize maps, over randomized geometry — the
    correctness contract behind `fits` (a missed tap silently selects 0
    inside the band).  Regression: the pre-r5 bilinear bound used the
    straight (non-half-pixel) map and missed the last tap by one pixel
    whenever the patch is larger than its resized size (ratio > 1)."""
    import jax.numpy as jnp

    from deepprior_tpu.camera import NYU_CAMERA
    from deepprior_tpu.ops.crop import (
        _embed_geometry,
        _exact_floor_div,
        _linear_taps_1d,
        com_to_bounds,
    )
    from deepprior_tpu.ops.pallas_crop import _source_band

    cam = NYU_CAMERA
    h, w = cam.height, cam.width
    rng = np.random.default_rng(77)
    n = 256
    # depths down to 150 mm give patch/resize ratios far above 1 (the
    # regression regime); include border and far CoMs
    com = np.stack([
        rng.uniform(-50, w + 50, n),
        rng.uniform(-50, h + 50, n),
        rng.uniform(150.0, 1400.0, n),
    ], 1).astype(np.float32)
    cube = rng.uniform(100.0, 400.0, (n, 1)).repeat(3, 1).astype(np.float32)

    xs, xe, ys, ye, _, _ = com_to_bounds(com, cube, cam.fx, cam.fy, (h, w))
    _, off_x, off_y, sz_w, sz_h = _embed_geometry(xs, xe, ys, ye, (128, 128))
    wb, hb = xe - xs, ye - ys

    for start, extent, off, sz, n_out, limit in (
        (ys, hb, off_y, sz_h, 128, h),
        (xs, wb, off_x, sz_w, 128, w),
    ):
        u = jnp.arange(n_out, dtype=jnp.float32)[None, :]
        in_embed = np.asarray(
            (u >= off[:, None]) & (u < (off + sz)[:, None])
        )
        for use_bilinear in (False, True):
            lo, hi = _source_band(
                start, extent, off, sz, n_out, limit, use_bilinear
            )
            lo, hi = np.asarray(lo), np.asarray(hi)
            if use_bilinear:
                t0, t1, _ = _linear_taps_1d(off, sz, extent, start, n_out)
                taps = np.concatenate([np.asarray(t0), np.asarray(t1)], 1)
                valid = np.concatenate([in_embed, in_embed], 1)
            else:
                taps = np.asarray(
                    start[:, None]
                    + _exact_floor_div((u - off[:, None]) * extent[:, None],
                                       sz[:, None])
                )
                valid = in_embed
            # only in-image taps need band coverage (out-of-image selects
            # the zero pad regardless of the window)
            valid = valid & (taps >= 0) & (taps <= limit - 1)
            bad_lo = valid & (taps < lo[:, None])
            bad_hi = valid & (taps > hi[:, None])
            assert not bad_lo.any(), (
                f"bilinear={use_bilinear}: {int(bad_lo.sum())} taps below band"
            )
            assert not bad_hi.any(), (
                f"bilinear={use_bilinear}: {int(bad_hi.sum())} taps above band"
            )
