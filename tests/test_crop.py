"""Crop pipeline parity: fused JAX warp vs. the literal numpy oracle."""

import jax
import numpy as np
import pytest

from deepprior_tpu.camera import ICVL_CAMERA, NYU_CAMERA
from deepprior_tpu.data.detector_np import HandCropper
from deepprior_tpu.data.synthetic import make_frame, render_depth
from deepprior_tpu.geometry import transform_points_2d
from deepprior_tpu.ops.crop import (
    clamp_depth,
    com_to_bounds,
    crop3d,
    crop_transform,
    normalize_crop,
    normalized_crop,
    warp_patch,
)


@pytest.fixture(scope="module")
def nyu_scene():
    rng = np.random.default_rng(7)
    cam = NYU_CAMERA
    frames = []
    for _ in range(6):
        f = make_frame(cam, rng, num_joints=14, docom=False)
        frames.append(f)
    return cam, frames


def test_com_to_bounds_matches_oracle(nyu_scene):
    cam, frames = nyu_scene
    for f in frames:
        hc = HandCropper(f.extraData["dpt_full"], cam)
        ref = hc.com_to_bounds(f.com, (250.0, 250.0, 250.0))
        ours = com_to_bounds(
            f.com, (250.0, 250.0, 250.0), cam.fx, cam.fy, (cam.height, cam.width)
        )
        ours = [float(x) for x in ours]
        np.testing.assert_allclose(ours[:4], ref[:4])
        np.testing.assert_allclose(ours[4:], ref[4:], rtol=1e-6)


def test_crop_transform_matches_oracle(nyu_scene):
    cam, frames = nyu_scene
    for f in frames:
        m = np.asarray(
            crop_transform(
                f.com,
                (250.0, 250.0, 250.0),
                cam.fx,
                cam.fy,
                (cam.height, cam.width),
            )
        )
        np.testing.assert_allclose(m, f.T, rtol=1e-5, atol=1e-3)


def test_fused_crop_matches_oracle(nyu_scene):
    """The static-shape warp reproduces the dynamic slice+resize+embed."""
    cam, frames = nyu_scene
    cube = np.array([250.0, 250.0, 250.0], np.float32)
    dpt = np.stack([f.extraData["dpt_full"] for f in frames])
    com = np.stack([f.com for f in frames])
    dpt_c, _, _ = clamp_depth(dpt)
    crop, m = jax.jit(
        lambda d, c: crop3d(d, c, cube, cam.fx, cam.fy)
    )(dpt_c, com)
    crop = np.asarray(crop)
    for i, f in enumerate(frames):
        ref = f.dpt
        diff = np.abs(crop[i] - ref)
        # allow a sub-0.5% pixel disagreement at bbox/rounding edges
        mismatched = np.mean(diff > 0.5)
        assert mismatched < 0.005, f"frame {i}: {mismatched:.2%} pixels differ"
        np.testing.assert_allclose(np.asarray(m)[i], f.T, rtol=1e-5, atol=1e-3)


def test_bilinear_onehot_matches_gather(nyu_scene):
    """MXU two-tap selection-matmul bilinear crop == the gather bilinear
    path to f32 round-off (separable vs 4-tap summation order)."""
    cam, frames = nyu_scene
    cube = np.array([250.0, 250.0, 250.0], np.float32)
    dpt = np.stack([f.extraData["dpt_full"] for f in frames])
    com = np.stack([f.com for f in frames])
    dpt_c, _, _ = clamp_depth(dpt)
    ref, m_ref = jax.jit(
        lambda d, c: crop3d(d, c, cube, cam.fx, cam.fy, use_bilinear=True)
    )(dpt_c, com)
    fast, m = jax.jit(
        lambda d, c: crop3d(
            d, c, cube, cam.fx, cam.fy, use_bilinear=True, method="onehot"
        )
    )(dpt_c, com)
    # the z-threshold is a cliff: a tap sum landing within round-off of
    # zstart/zend can resolve differently; compare away from the cliffs
    ref = np.asarray(ref)
    fast = np.asarray(fast)
    np.testing.assert_allclose(fast, ref, rtol=1e-5, atol=2e-2)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref))
    # and the interpolation genuinely differs from nearest (it's bilinear)
    near, _ = crop3d(dpt_c, com, cube, cam.fx, cam.fy, method="onehot")
    assert np.abs(fast - np.asarray(near)).max() > 0.5


def test_linear_crop_matches_cv2_twin(nyu_scene):
    """Device `resize='linear'` == the cv2-exact host twin (r5; closes the
    r4 "half-pixel" deviation).  The gather path shares the twin's exact
    f32 op order (taps, weights, 4-tap blend: detector_np._halfpixel_taps
    / resize_linear); tap indices and weights are bit-identical, and the
    only residual is XLA contracting the blend's multiply-adds into FMAs
    (<= 2 ulp; a flipped tap or threshold would show mm-scale error, which
    the tight atol below rules out).  The one-hot MXU path computes the
    same taps via separable selection matmuls, so it agrees to f32
    round-off (summation order).  Reference: handdetector.py:347-348
    (RESIZE_CV2_LINEAR) inside cropArea3D's crop -> threshold -> resize
    order (:291-295, :427-447)."""
    cam, frames = nyu_scene
    cube = np.array([250.0, 250.0, 250.0], np.float32)
    dpt = np.stack([f.extraData["dpt_full"] for f in frames])
    com = np.stack([f.com for f in frames])
    dpt_c, _, _ = clamp_depth(dpt)
    gather, _ = jax.jit(
        lambda d, c: crop3d(d, c, cube, cam.fx, cam.fy, resize="linear")
    )(dpt_c, com)
    onehot, _ = jax.jit(
        lambda d, c: crop3d(
            d, c, cube, cam.fx, cam.fy, resize="linear", method="onehot"
        )
    )(dpt_c, com)
    gather = np.asarray(gather)
    onehot = np.asarray(onehot)
    for i, f in enumerate(frames):
        hc = HandCropper(f.extraData["dpt_full"], cam, resize_method="linear")
        ref, m_ref, _ = hc.crop_area_3d(com=f.com, size=tuple(cube))
        np.testing.assert_allclose(
            gather[i], ref, rtol=3e-7, atol=1e-3,
            err_msg=f"frame {i}: gather path not cv2-exact (mod FMA ulps)",
        )
        # most pixels ARE bit-identical (only FMA-contracted blends move)
        assert np.mean(gather[i] == ref) > 0.9
        np.testing.assert_allclose(onehot[i], ref, rtol=1e-5, atol=1e-2)
    # and it genuinely interpolates (differs from the nearest default)
    near, _ = crop3d(dpt_c, com, cube, cam.fx, cam.fy)
    assert np.abs(gather - np.asarray(near)).max() > 0.5


def test_crop_label_invariant(nyu_scene):
    """gtcrop == transformPoints2D(gtorig, M) — the invariant implicitly
    asserted at reference importers.py:396."""
    cam, frames = nyu_scene
    for f in frames:
        proj = np.asarray(transform_points_2d(f.gtorig, f.T))
        np.testing.assert_allclose(proj, f.gtcrop, rtol=1e-4, atol=1e-2)
        # the crop CoM lands near the patch center
        com_crop = np.asarray(transform_points_2d(f.com[None], f.T))[0]
        assert abs(com_crop[0] - 64.0) < 2.0
        assert abs(com_crop[1] - 64.0) < 2.0


def test_normalize_crop_range(nyu_scene):
    cam, frames = nyu_scene
    f = frames[0]
    out = np.asarray(
        normalize_crop(f.dpt[None], f.com[None, 2], np.array([250.0]))
    )[0]
    assert out.min() >= -1.0 - 1e-5 and out.max() <= 1.0 + 1e-5
    # background -> +1
    assert out[0, 0] == pytest.approx(1.0)
    zero_one = np.asarray(
        normalize_crop(f.dpt[None], f.com[None, 2], np.array([250.0]), True)
    )[0]
    assert zero_one.min() >= -1e-5 and zero_one.max() <= 1.0 + 1e-5


def test_normalized_crop_fused(nyu_scene):
    cam, frames = nyu_scene
    cube = np.array([250.0, 250.0, 250.0], np.float32)
    dpt = np.stack([f.extraData["dpt_full"] for f in frames])
    com = np.stack([f.com for f in frames])
    dpt_c, _, _ = clamp_depth(dpt)
    out, m = normalized_crop(dpt_c, com, cube, cam.fx, cam.fy)
    out = np.asarray(out)
    assert out.shape == (len(frames), 128, 128)
    assert out.min() >= -1.0 - 1e-5 and out.max() <= 1.0 + 1e-5
    for i, f in enumerate(frames):
        ref = np.asarray(
            normalize_crop(f.dpt[None], f.com[None, 2], np.array([250.0]))
        )[0]
        mismatched = np.mean(np.abs(out[i] - ref) > 0.01)
        assert mismatched < 0.005


def test_clamp_depth():
    dpt = np.array([[[5.0, 100.0, 2000.0], [700.0, 0.0, 1500.0]]], np.float32)
    out, min_d, max_d = clamp_depth(dpt)
    out = np.asarray(out)
    assert max_d[0] == 1500.0
    assert min_d[0] == 10.0
    assert out[0, 0, 0] == 0.0  # below min
    assert out[0, 0, 2] == 0.0  # above max
    assert out[0, 1, 0] == 700.0


def test_warp_patch_identity(rng):
    patch = rng.uniform(0, 100, (2, 16, 16)).astype(np.float32)
    eye = np.broadcast_to(np.eye(3, dtype=np.float32), (2, 3, 3))
    out = np.asarray(warp_patch(patch, eye))
    np.testing.assert_array_equal(out, patch)


def test_warp_patch_translation():
    patch = np.zeros((8, 8), np.float32)
    patch[2, 3] = 42.0
    m = np.eye(3, dtype=np.float32)
    m[0, 2] = 2.0  # shift +2 in x
    out = np.asarray(warp_patch(patch, m))
    assert out[2, 5] == 42.0
    assert out[2, 3] == 0.0


def test_warp_patch_nv_val():
    patch = np.full((4, 4), 32000.0, np.float32)
    out = np.asarray(warp_patch(patch, np.eye(3, dtype=np.float32), nv_val=32000.0))
    np.testing.assert_array_equal(out, 0.0)


def test_off_image_bbox_host_device_agree():
    """A CoM whose bbox lies entirely off-image (corrupt label) must give
    all-background crops from BOTH the host oracle and the device paths —
    the reference's negative-wrap slice (d[0:yend] with yend < 0) emitted
    real image rows here; the oracle deviates (documented in get_crop)."""
    cam = NYU_CAMERA
    rng = np.random.default_rng(2)
    dpt = rng.uniform(800.0, 1200.0, (cam.height, cam.width)).astype(
        np.float32
    )
    cube = (250.0, 250.0, 250.0)
    com = np.array([-400.0, -400.0, 700.0], np.float32)  # far above-left

    hc = HandCropper(dpt, cam)
    xs, xe, ys, ye, zs, ze = hc.com_to_bounds(com, cube)
    assert ye < 0 and xe < 0  # genuinely off-image both axes
    host = hc.get_crop(xs, xe, ys, ye, zs, ze)
    assert host.shape == (ye - ys, xe - xs)
    np.testing.assert_array_equal(host, 0.0)

    crop, _ = crop3d(
        dpt[None], com[None], np.asarray(cube, np.float32), cam.fx, cam.fy
    )
    # device: out-of-image selects zero; normalize step not applied here,
    # so the raw crop is the zero-padded source region
    np.testing.assert_array_equal(np.asarray(crop)[0], 0.0)


def test_ill_defined_com_fallback():
    """com_z ~ 0 -> centered half-frame crop (handdetector.py:211-218)."""
    xs, xe, ys, ye, zs, ze = com_to_bounds(
        np.zeros(3, np.float32), (250.0, 250.0, 250.0), 241.42, 241.42, (240, 320)
    )
    assert float(xs) == 80 and float(xe) == 240
    assert float(ys) == 60 and float(ye) == 180
    assert float(zs) == 10.0 and float(ze) == 1500.0


def test_crop_icvl_camera():
    rng = np.random.default_rng(3)
    f = make_frame(ICVL_CAMERA, rng, num_joints=16)
    cube = np.array([250.0, 250.0, 250.0], np.float32)
    dpt_c, _, _ = clamp_depth(f.extraData["dpt_full"][None])
    crop, m = crop3d(dpt_c, f.com[None], cube, ICVL_CAMERA.fx, ICVL_CAMERA.fy)
    mismatched = np.mean(np.abs(np.asarray(crop)[0] - f.dpt) > 0.5)
    assert mismatched < 0.005
