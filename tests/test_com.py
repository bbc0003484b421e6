"""CoM localization tests: batched masked moments vs. numpy oracle."""

import jax
import numpy as np
import pytest

from deepprior_tpu.camera import NYU_CAMERA
from deepprior_tpu.data.detector_np import HandCropper
from deepprior_tpu.data.synthetic import make_frame
from deepprior_tpu.ops.com import (
    calculate_com,
    check_image,
    detect_closest,
    refine_com_iterative,
)
from deepprior_tpu.ops.crop import clamp_depth


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(11)
    cam = NYU_CAMERA
    frames = [make_frame(cam, rng) for _ in range(4)]
    return cam, frames


def test_calculate_com_matches_oracle(scene):
    cam, frames = scene
    for f in frames:
        hc = HandCropper(f.extraData["dpt_full"], cam)
        ref = hc.calculate_com()
        ours = np.asarray(
            calculate_com(hc.dpt, hc.min_depth, hc.max_depth)
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=0.1)


def test_calculate_com_empty():
    out = np.asarray(calculate_com(np.zeros((32, 32), np.float32)))
    np.testing.assert_array_equal(out, 0.0)


def test_check_image():
    flat = np.full((16, 16), 500.0, np.float32)
    assert not bool(check_image(flat, tol=1.0))
    varied = flat.copy()
    varied[:8] = 600.0
    assert bool(check_image(varied, tol=1.0))


def test_refine_com_iterative_converges(scene):
    """Seeding away from the hand, iterative refinement recovers the CoM."""
    cam, frames = scene
    cube = (250.0, 250.0, 250.0)
    for f in frames:
        dpt_c, _, _ = clamp_depth(f.extraData["dpt_full"])
        true_com = np.asarray(
            calculate_com(np.asarray(dpt_c))
        )  # global CoM of the only object
        seed = f.com + np.array([25.0, -20.0, 40.0], np.float32)
        refined = np.asarray(
            refine_com_iterative(dpt_c, seed, cube, cam.fx, cam.fy, num_iter=5)
        )
        assert np.linalg.norm(refined[:2] - true_com[:2]) < 3.0
        assert abs(refined[2] - true_com[2]) < 20.0


def test_refine_matches_numpy_oracle(scene):
    cam, frames = scene
    cube = (250.0, 250.0, 250.0)
    f = frames[0]
    hc = HandCropper(f.extraData["dpt_full"], cam)
    seed = f.com + np.array([10.0, 5.0, 0.0], np.float32)
    ref = hc.refine_com_iterative(seed, 3, cube)
    ours = np.asarray(
        refine_com_iterative(hc.dpt, seed, cube, cam.fx, cam.fy, num_iter=3)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=0.5)


def test_detect_closest_finds_hand(scene):
    cam, frames = scene
    cube = (250.0, 250.0, 250.0)
    dpt = np.stack([f.extraData["dpt_full"] for f in frames])
    dpt_c, _, _ = clamp_depth(dpt)
    coms = np.asarray(
        jax.jit(lambda d: detect_closest(d, cube, cam.fx, cam.fy))(dpt_c)
    )
    # detection (seeded at the closest pixel) and refinement (seeded at the
    # annotated CoM) must converge to the same fixed point
    seeds = np.stack([f.com for f in frames])
    attractor = np.asarray(
        refine_com_iterative(dpt_c, seeds, cube, cam.fx, cam.fy, num_iter=8)
    )
    for i, f in enumerate(frames):
        assert np.linalg.norm(coms[i, :2] - attractor[i, :2]) < 3.0
        assert abs(coms[i, 2] - attractor[i, 2]) < 10.0


def test_host_detect_matches(scene):
    cam, frames = scene
    f = frames[0]
    hc = HandCropper(f.extraData["dpt_full"], cam)
    com = hc.detect()
    attractor = hc.refine_com_iterative(f.com, 8)
    assert np.linalg.norm(com[:2] - attractor[:2]) < 3.0
