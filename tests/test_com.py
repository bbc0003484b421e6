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


def test_label_components():
    from deepprior_tpu.ops.com import label_components

    mask = np.zeros((16, 24), bool)
    mask[2:5, 3:7] = True  # blob A (12 px)
    mask[10:14, 10:18] = True  # blob B (32 px)
    mask[0, 20] = True  # single pixel
    lab = np.asarray(jax.jit(label_components)(mask))
    assert (lab[~mask] == 16 * 24).all()
    ids = np.unique(lab[mask])
    assert len(ids) == 3
    # every blob uniformly labeled with its min linear index
    assert (lab[2:5, 3:7] == 2 * 24 + 3).all()
    assert (lab[10:14, 10:18] == 10 * 24 + 10).all()
    assert lab[0, 20] == 20


@pytest.mark.slow
def test_device_detect_matches_oracle_multiobject(scene):
    """Full device detector == host oracle on multi-object scenes: the
    min-area gate must reject near noise specks that fool detect_closest
    (handdetector.py:569-632 semantics)."""
    from deepprior_tpu.ops.com import detect as dev_detect

    cam, frames = scene
    cube = np.array([250.0, 250.0, 250.0], np.float32)
    rng = np.random.default_rng(3)
    for f in frames[:2]:
        dpt = f.extraData["dpt_full"].copy()
        hand_min = dpt[dpt > 0].min()
        # single-pixel + 5x5 specks NEARER than the hand (both < 200 px)
        dpt[20, 30] = hand_min - 120.0
        dpt[200:205, 40:45] = hand_min - 80.0
        hc = HandCropper(dpt, cam)
        ref = hc.detect(size=tuple(cube))
        ours = np.asarray(
            jax.jit(lambda d: dev_detect(d, cube, cam.fx, cam.fy))(dpt)
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=0.5)
        # and the speck would indeed have fooled the closest-pixel variant
        dpt_c, _, _ = clamp_depth(dpt)
        close = np.asarray(detect_closest(dpt_c[None], cube, cam.fx, cam.fy))[0]
        assert np.linalg.norm(close[:2] - ref[:2]) > 5.0


def test_device_detect_empty_scene():
    from deepprior_tpu.ops.com import detect as dev_detect

    cube = np.array([250.0, 250.0, 250.0], np.float32)
    out = np.asarray(
        dev_detect(np.zeros((1, 64, 64), np.float32), cube, 500.0, 500.0)
    )
    np.testing.assert_array_equal(out, 0.0)


def test_device_detect_batched(scene):
    from deepprior_tpu.ops.com import detect as dev_detect

    cam, frames = scene
    cube = np.array([250.0, 250.0, 250.0], np.float32)
    dpt = np.stack([f.extraData["dpt_full"] for f in frames])
    coms = np.asarray(jax.jit(lambda d: dev_detect(d, cube, cam.fx, cam.fy))(dpt))
    for i, f in enumerate(frames):
        hc = HandCropper(f.extraData["dpt_full"], cam)
        ref = hc.detect(size=tuple(cube))
        np.testing.assert_allclose(coms[i], ref, rtol=1e-3, atol=0.5)


def test_docom_empty_fallback_300mm():
    """Device refine with empty_z=300: an empty crop whose bbox center has
    no depth falls back to z=300mm (handdetector.py:415-418; host oracle
    detector_np.py:130-132)."""
    dpt = np.zeros((64, 64), np.float32)
    com = np.array([32.0, 32.0, 500.0], np.float32)
    cube = (100.0, 100.0, 100.0)
    out = np.asarray(
        refine_com_iterative(dpt, com, cube, 500.0, 500.0, num_iter=1,
                             empty_z=300.0)
    )
    assert out[2] == 300.0
    # without the flag: plain refineCoMIterative keeps the raw center depth
    out2 = np.asarray(
        refine_com_iterative(dpt, com, cube, 500.0, 500.0, num_iter=1)
    )
    assert out2[2] == 0.0


def test_host_detect_matches(scene):
    cam, frames = scene
    f = frames[0]
    hc = HandCropper(f.extraData["dpt_full"], cam)
    com = hc.detect()
    attractor = hc.refine_com_iterative(f.com, 8)
    assert np.linalg.norm(com[:2] - attractor[:2]) < 3.0
