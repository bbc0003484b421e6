"""Tests for ND-aware resize, CNN CoM refinement, and helpers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepprior_tpu.camera import NYU_CAMERA
from deepprior_tpu.data.synthetic import make_frame
from deepprior_tpu.models import ScaleNet, ScaleNetConfig
from deepprior_tpu.ops.crop import clamp_depth
from deepprior_tpu.ops.refine_cnn import CNNComRefiner
from deepprior_tpu.ops.resize import resize_bilinear_nd, resize_nearest
from deepprior_tpu.utils.helpers import (
    cartesian,
    chunks,
    gaussian_kernel,
    rgb_to_gray,
    shuffle_many_inplace,
)


def test_resize_nearest_downsample():
    img = np.arange(16, dtype=np.float32).reshape(4, 4)
    out = np.asarray(resize_nearest(img, (2, 2)))
    np.testing.assert_array_equal(out, [[0, 2], [8, 10]])


def test_resize_bilinear_nd_all_valid():
    img = np.ones((8, 8), np.float32) * 500.0
    out = np.asarray(resize_bilinear_nd(img, (4, 4)))
    np.testing.assert_allclose(out, 500.0)


def test_resize_bilinear_nd_excludes_invalid():
    img = np.full((4, 4), 600.0, np.float32)
    img[0, 0] = 0.0  # ND pixel
    out = np.asarray(resize_bilinear_nd(img, (2, 2)))
    # the valid taps renormalize: output stays 600, not dragged toward 0
    np.testing.assert_allclose(out, 600.0)


def test_resize_bilinear_nd_majority_invalid():
    img = np.zeros((4, 4), np.float32)
    img[0, 0] = 700.0  # only 1 of 4 taps valid in its neighborhood
    out = np.asarray(resize_bilinear_nd(img, (2, 2)))
    # 3+ invalid taps -> ND
    assert out[1, 1] == 0.0


def test_cnn_com_refiner_moves_com():
    cam = NYU_CAMERA
    rng = np.random.default_rng(0)
    f = make_frame(cam, rng)
    model = ScaleNet(ScaleNetConfig(num_joints=1, n_dims=3))
    variables = model.init(jax.random.key(0), jnp.zeros((1, 128, 128, 1)))
    refiner = CNNComRefiner(model, variables, cam)
    dpt_c, _, _ = clamp_depth(f.extraData["dpt_full"][None])
    com = jnp.asarray(f.com[None])
    out = np.asarray(refiner(dpt_c, com, (250.0, 250.0, 250.0)))
    assert out.shape == (1, 3)
    # untrained net: offset bounded by the cube scale, coordinates finite
    assert np.isfinite(out).all()
    assert abs(out[0, 2] - f.com[2]) < 500.0


def test_cartesian():
    out = cartesian([np.array([1, 2]), np.array([3, 4, 5])])
    assert out.shape == (6, 2)
    assert (out[0] == [1, 3]).all() and (out[-1] == [2, 5]).all()


def test_shuffle_many_inplace():
    a = np.arange(10)
    b = np.arange(10) * 2
    rng = np.random.RandomState(0)
    shuffle_many_inplace([a, b], rng)
    assert not (a == np.arange(10)).all()
    np.testing.assert_array_equal(b, a * 2)  # co-shuffled


def test_gaussian_kernel():
    k = gaussian_kernel(5)
    assert k.shape == (5, 5)
    assert abs(k.sum() - 1.0) < 1e-6
    assert k[2, 2] == k.max()


def test_rgb_to_gray():
    rgb = np.zeros((2, 2, 3), np.float32)
    rgb[..., 1] = 100.0
    g = rgb_to_gray(rgb)
    np.testing.assert_allclose(g, 58.7)


def test_chunks():
    assert [list(c) for c in chunks(list(range(7)), 3)] == [
        [0, 1, 2], [3, 4, 5], [6]
    ]


def test_stage_timer():
    from deepprior_tpu.utils.profiling import StageTimer

    t = StageTimer()
    with t.stage("x"):
        pass
    assert t.ms("x") >= 0.0
    assert "x=" in t.report()


# ----------------------------------------------------------------------
# the resize-method switch (reference handdetector.py:57-69, VERDICT r3
# missing #4): 'nearest' / 'linear' / 'nd_bilinear' selectable through
# HandCropper, crop3d/normalized_crop, the importers and the estimator
# ----------------------------------------------------------------------
def _clamped_frame(seed=3):
    rng = np.random.default_rng(seed)
    f = make_frame(NYU_CAMERA, rng)
    return f.extraData["dpt_full"].astype(np.float32), f.com


@pytest.mark.slow
def test_host_nd_resize_matches_device_resize_op():
    """detector_np.HandCropper.resize_bilinear_nd is the numpy twin of
    ops/resize.resize_bilinear_nd (same half-pixel grid, same blend)."""
    from deepprior_tpu.data.detector_np import HandCropper

    rng = np.random.default_rng(0)
    img = rng.uniform(400.0, 900.0, (37, 53)).astype(np.float32)
    img[rng.random((37, 53)) < 0.3] = 0.0  # ND holes
    host = HandCropper.resize_bilinear_nd(img, (24, 18))
    dev = np.asarray(resize_bilinear_nd(img, (18, 24)))
    np.testing.assert_allclose(host, dev, rtol=1e-6, atol=1e-4)


def test_crop3d_nd_bilinear_matches_host_oracle():
    """crop3d(resize='nd_bilinear') agrees with the host oracle running
    the reference order (crop -> z-threshold -> ND-aware resize)."""
    from deepprior_tpu.data.detector_np import HandCropper
    from deepprior_tpu.ops.crop import crop3d

    cam = NYU_CAMERA
    dpts, coms = zip(*[_clamped_frame(s) for s in range(4)])
    dpt = np.stack(dpts)
    com = np.stack(coms).astype(np.float32)
    cube = np.float32([250.0, 250.0, 250.0])

    dptc, _, _ = clamp_depth(dpt)
    got, m = crop3d(np.asarray(dptc), com, cube, cam.fx, cam.fy,
                    dsize=(128, 128), resize="nd_bilinear")
    got = np.asarray(got)
    for i in range(dpt.shape[0]):
        hc = HandCropper(dpt[i], cam, resize_method="nd_bilinear")
        want, m_host, _ = hc.crop_area_3d(com=com[i], size=tuple(cube),
                                          dsize=(128, 128))
        np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-3)
        np.testing.assert_allclose(np.asarray(m)[i], m_host, rtol=1e-5)


def test_nd_bilinear_ignores_background_edges():
    """At hand/background boundaries plain linear blends depth with 0
    (phantom mid-air depths); the ND-aware method must not."""
    from deepprior_tpu.data.detector_np import HandCropper

    img = np.zeros((16, 16), np.float32)
    img[4:12, 4:12] = 600.0
    # non-integer scale so sample positions straddle the boundary taps
    lin = HandCropper.resize_linear(img, (6, 6))
    nd = HandCropper.resize_bilinear_nd(img, (6, 6))
    assert ((lin > 0) & (lin < 600.0)).any()  # linear smears the edge
    assert set(np.unique(nd).tolist()) <= {0.0, 600.0}  # nd does not


def test_crop3d_resize_nearest_is_legacy_path():
    """resize='nearest' is bit-identical to the legacy default."""
    from deepprior_tpu.ops.crop import crop3d

    cam = NYU_CAMERA
    dpt, com = _clamped_frame(7)
    dptc, _, _ = clamp_depth(dpt[None])
    a, _ = crop3d(np.asarray(dptc), com[None], (250.0, 250.0, 250.0),
                  cam.fx, cam.fy)
    b, _ = crop3d(np.asarray(dptc), com[None], (250.0, 250.0, 250.0),
                  cam.fx, cam.fy, resize="nearest")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    with pytest.raises(ValueError, match="unknown resize"):
        crop3d(np.asarray(dptc), com[None], (250.0, 250.0, 250.0),
               cam.fx, cam.fy, resize="cubic")


def test_importer_resize_method_plumbs_to_crops(tmp_path):
    """ICVLImporter(resize_method=...) changes the produced crops and the
    cache key (host and batched-device paths share the switch)."""
    from deepprior_tpu.camera import ICVL_CAMERA
    from deepprior_tpu.data.detector_np import HandCropper
    from deepprior_tpu.data.importers import ICVLImporter

    rng = np.random.default_rng(5)
    f = make_frame(ICVL_CAMERA, rng, num_joints=16)
    imp_nn = ICVLImporter(str(tmp_path), use_cache=False)
    imp_nd = ICVLImporter(str(tmp_path), use_cache=False,
                          resize_method="nd_bilinear")
    assert imp_nn._cache_path("s", False, (250,)) != \
        imp_nd._cache_path("s", False, (250,))
    args = (f.extraData["dpt_full"], f.gtorig, f.gt3Dorig,
            (250.0, 250.0, 250.0), False, (128, 128), "f", "", "right")
    fr_nn = imp_nn._crop_frame(*args)
    fr_nd = imp_nd._crop_frame(*args)
    assert not np.array_equal(fr_nn.dpt, fr_nd.dpt)
    hc = HandCropper(f.extraData["dpt_full"], ICVL_CAMERA,
                     resize_method="nd_bilinear")
    want, _, _ = hc.crop_area_3d(com=f.gtorig[0],
                                 size=(250.0, 250.0, 250.0),
                                 dsize=(128, 128))
    np.testing.assert_allclose(fr_nd.dpt, want, atol=1e-3)


def test_fused_estimator_resize_nd_bilinear():
    """FusedEstimator(resize='nd_bilinear') downgrades the Pallas/onehot
    crop plan to a runnable method and produces finite joints."""
    from deepprior_tpu.models import PoseRegNet, PoseRegNetConfig
    from deepprior_tpu.prior import PCAPrior
    from deepprior_tpu.realtime.fused import FusedEstimator

    cam = NYU_CAMERA
    model = PoseRegNet(PoseRegNetConfig(num_joints=1, n_dims=30))
    variables = model.init(jax.random.key(0), jnp.zeros((1, 128, 128, 1)))
    rng = np.random.default_rng(1)
    prior = PCAPrior(
        components=rng.standard_normal((30, 42)).astype(np.float32) * 0.05,
        mean=np.zeros(42, np.float32),
    )
    est = FusedEstimator(model, cam, prior=prior, resize="nd_bilinear")
    assert est.crop_method != "pallas"
    dpt, com = _clamped_frame(11)
    joints, _, crops = est(variables, jnp.asarray(dpt[None]),
                           jnp.asarray(com[None]))
    assert np.isfinite(np.asarray(joints)).all()
    assert np.isfinite(np.asarray(crops)).all()
    with pytest.raises(ValueError, match="unknown resize"):
        FusedEstimator(model, cam, prior=prior, resize="cubic")


@pytest.mark.slow
def test_resize_twins_match_torch_oracle():
    """Independent oracle for the cv2 resize geometry (cv2 itself is not
    in this image; the device paths are pinned against the host twin, so
    the twin's cv2-faithfulness is the root of that chain).

    torch.nn.functional.interpolate implements the same conventions:
    'bilinear' align_corners=False is cv2.INTER_LINEAR's half-pixel map
    with float weights (cv2's only deviation is its fixed-point 1/2048
    weight quantization, which the twin deliberately idealizes away —
    docs/PARITY.md resize row), and 'nearest' is floor(dst * in/out).

    The one masked case: torch computes the nearest scale in float32, so
    at EXACT-INTEGER quotients (dst * in/out integral) its floor can land
    one pixel low (observed: dst 93 of w=110/sw=186 -> 93*(110/186 as
    f32) = 54.999996 -> 54, where cv2's double arithmetic gives 55).
    cv2 uses double, as the twin does, so torch is the deviating side
    there — those positions are excluded; everywhere else nearest must
    agree EXACTLY, and linear within f32 round-off of the blend order."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from deepprior_tpu.data.detector_np import HandCropper

    rng = np.random.default_rng(7)
    for _ in range(25):
        h, w = (int(v) for v in rng.integers(3, 200, 2))
        sw, sh = (int(v) for v in rng.integers(2, 200, 2))
        src = rng.uniform(0.0, 1500.0, (h, w)).astype(np.float32)
        t = torch.from_numpy(src)[None, None]

        ours = HandCropper.resize_linear(src, (sw, sh))
        ref = F.interpolate(
            t, size=(sh, sw), mode="bilinear", align_corners=False
        )[0, 0].numpy()
        np.testing.assert_allclose(ours, ref, atol=0.05)

        ours_nn = HandCropper.resize_nearest(src, (sw, sh))
        ref_nn = F.interpolate(t, size=(sh, sw), mode="nearest")[0, 0].numpy()
        col_exact = (np.arange(sw) * w) % sw == 0
        row_exact = (np.arange(sh) * h) % sh == 0
        ok = ~(row_exact[:, None] | col_exact[None, :])
        np.testing.assert_array_equal(ours_nn[ok], ref_nn[ok])
