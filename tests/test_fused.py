"""FusedEstimator variants: detect mode, refine mode, crop methods, AOT."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepprior_tpu.camera import NYU_CAMERA
from deepprior_tpu.data.synthetic import make_frame
from deepprior_tpu.models import PoseRegNet, PoseRegNetConfig
from deepprior_tpu.prior import PCAPrior
from deepprior_tpu.realtime.fused import FusedEstimator


@pytest.fixture(scope="module")
def setup():
    cam = NYU_CAMERA
    model = PoseRegNet(PoseRegNetConfig(num_joints=1, n_dims=30))
    variables = model.init(jax.random.key(0), jnp.zeros((1, 128, 128, 1)))
    rng = np.random.default_rng(0)
    prior = PCAPrior(
        rng.standard_normal((30, 42)).astype(np.float32) * 0.05,
        np.zeros(42, np.float32),
    )
    frames = [make_frame(cam, np.random.default_rng(i)) for i in range(2)]
    depth = np.stack([f.extraData["dpt_full"] for f in frames])
    com = np.stack([f.com for f in frames])
    return cam, model, variables, prior, depth, com, frames


def test_detect_mode_ignores_com(setup):
    cam, model, variables, prior, depth, com, frames = setup
    est = FusedEstimator(model, cam, prior=prior, detect=True)
    j1, com3d, _ = est(variables, depth)  # no com given
    j2, _, _ = est(variables, depth, np.zeros_like(com))
    np.testing.assert_array_equal(np.asarray(j1), np.asarray(j2))
    # detected CoM lands near the hand
    com3d = np.asarray(com3d)
    gt3d = np.asarray(cam.img_to_3d(com))
    assert np.linalg.norm(com3d - gt3d, axis=1).max() < 120.0


def test_refine_mode(setup):
    cam, model, variables, prior, depth, com, frames = setup
    est = FusedEstimator(model, cam, prior=prior, refine_iters=3)
    seed = com + np.array([15.0, -10.0, 20.0], np.float32)
    j, com3d, crops = est(variables, depth, seed)
    assert np.asarray(crops).shape == (2, 128, 128)
    assert np.isfinite(np.asarray(j)).all()


def test_crop_methods_agree(setup):
    cam, model, variables, prior, depth, com, frames = setup
    e1 = FusedEstimator(model, cam, prior=prior, crop_method="onehot")
    e2 = FusedEstimator(model, cam, prior=prior, crop_method="gather")
    j1, _, c1 = e1(variables, depth, com)
    j2, _, c2 = e2(variables, depth, com)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_allclose(np.asarray(j1), np.asarray(j2), atol=1e-4)


def test_no_prior_direct_pose(setup):
    cam, _, _, _, depth, com, frames = setup
    model = PoseRegNet(PoseRegNetConfig(num_joints=14, n_dims=3))
    variables = model.init(jax.random.key(1), jnp.zeros((1, 128, 128, 1)))
    est = FusedEstimator(model, cam, prior=None)
    j, _, _ = est(variables, depth, com)
    assert np.asarray(j).shape == (2, 14, 3)


def test_live_cube_reaches_crop_and_denorm(setup):
    """A cube passed per call (hand-size calibration, +/- resize) must
    reach the crop AND the denormalization scale — bit-equal to an
    estimator constructed with that cube (realtimehandpose:330-336)."""
    cam, model, variables, prior, depth, com, frames = setup
    base = FusedEstimator(model, cam, prior=prior, crop_method="onehot")
    big = FusedEstimator(
        model, cam, cube=(350.0, 350.0, 350.0), prior=prior,
        crop_method="onehot",
    )
    j_live, _, c_live = base(
        variables, depth, com, cube=np.asarray([350.0, 350.0, 350.0])
    )
    j_ctor, _, c_ctor = big(variables, depth, com)
    # cross-program comparison (traced cube vs constant-folded cube):
    # agreement to f32 ulp, not bitwise
    np.testing.assert_allclose(
        np.asarray(c_live), np.asarray(c_ctor), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(j_live), np.asarray(j_ctor), rtol=1e-5, atol=1e-3
    )
    # and it genuinely differs from the constructor cube
    j_base, _, _ = base(variables, depth, com)
    assert not np.array_equal(np.asarray(j_base), np.asarray(j_live))


def test_mirror_semantics(setup):
    """mirror=True mirrors the CROP into the net and flips the x of the
    RELATIVE pose back, denormalizing with the unmirrored com3d —
    the reference's right-hand handling (realtimehandpose:346-369)."""
    cam, model, variables, prior, depth, com, frames = setup
    est = FusedEstimator(model, cam, prior=prior, crop_method="onehot")
    cube = np.asarray([250.0, 250.0, 250.0], np.float32)
    j_m, com3d_m, crops_m = est(variables, depth, com, cube=cube,
                                mirror=True)
    # same compiled program (explicit cube), mirror off -> crops/com3d
    # must be bitwise identical
    j0, com3d, crops = est(variables, depth, com, cube=cube)

    # crop and com3d come from the UNMIRRORED frame/detection
    np.testing.assert_array_equal(np.asarray(crops_m), np.asarray(crops))
    np.testing.assert_array_equal(np.asarray(com3d_m), np.asarray(com3d))

    # manual composition of the reference recipe
    out = model.apply(variables, jnp.asarray(crops)[:, :, ::-1, None],
                      train=False)
    out = np.asarray(out) @ np.asarray(prior.components) + np.asarray(
        prior.mean
    )
    pose = out.reshape(out.shape[0], -1, 3)
    pose[:, :, 0] *= -1.0
    want = pose * 125.0 + np.asarray(com3d)[:, None, :]
    np.testing.assert_allclose(np.asarray(j_m), want, rtol=1e-4, atol=1e-3)


def test_inv_flags_reference_quirk(setup):
    """invX flips the relative pose's index 1 and invY its index 0 — the
    reference's swapped-index behavior (realtimehandpose:353-363)."""
    cam, model, variables, prior, depth, com, frames = setup
    est = FusedEstimator(model, cam, prior=prior, crop_method="onehot")
    j0, com3d, _ = est(variables, depth, com)
    rel0 = (np.asarray(j0) - np.asarray(com3d)[:, None, :]) / 125.0

    jx, _, _ = est(variables, depth, com, invx=True)
    relx = (np.asarray(jx) - np.asarray(com3d)[:, None, :]) / 125.0
    np.testing.assert_allclose(relx[:, :, 1], -rel0[:, :, 1], atol=1e-6)
    np.testing.assert_allclose(relx[:, :, 0], rel0[:, :, 0], atol=1e-6)

    jy, _, _ = est(variables, depth, com, invy=True)
    rely = (np.asarray(jy) - np.asarray(com3d)[:, None, :]) / 125.0
    np.testing.assert_allclose(rely[:, :, 0], -rel0[:, :, 0], atol=1e-6)
    np.testing.assert_allclose(rely[:, :, 1], rel0[:, :, 1], atol=1e-6)


def test_aot_compile(setup):
    cam, model, variables, prior, depth, com, frames = setup
    est = FusedEstimator(model, cam, prior=prior)
    compiled = est.aot_compile(variables, batch=1, hw=depth.shape[1:])
    out = compiled(variables, jnp.asarray(depth[:1]), jnp.asarray(com[:1]))
    assert np.asarray(out[0]).shape == (1, 14, 3)
