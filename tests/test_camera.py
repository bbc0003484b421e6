"""Camera model tests: round trips, golden values, MSRA inverted-Y."""

import jax.numpy as jnp
import numpy as np
import pytest

from deepprior_tpu.camera import ICVL_CAMERA, MSRA15_CAMERA, NYU_CAMERA, CAMERAS


@pytest.mark.parametrize("cam", list(CAMERAS.values()), ids=list(CAMERAS))
def test_roundtrip_img_3d(cam, rng):
    uvd = np.column_stack(
        [
            rng.uniform(0, cam.width, 100),
            rng.uniform(0, cam.height, 100),
            rng.uniform(100, 1400, 100),
        ]
    ).astype(np.float32)
    back = np.asarray(cam.three_d_to_img(cam.img_to_3d(uvd)))
    np.testing.assert_allclose(back, uvd, rtol=1e-4, atol=1e-2)


@pytest.mark.parametrize("cam", list(CAMERAS.values()), ids=list(CAMERAS))
def test_roundtrip_3d_img(cam, rng):
    xyz = np.column_stack(
        [
            rng.uniform(-300, 300, 100),
            rng.uniform(-300, 300, 100),
            rng.uniform(100, 1400, 100),
        ]
    ).astype(np.float32)
    back = np.asarray(cam.img_to_3d(cam.three_d_to_img(xyz)))
    np.testing.assert_allclose(back, xyz, rtol=1e-4, atol=1e-2)


def test_golden_nyu():
    # (u,v,d) = principal point at depth z maps to (0, 0, z)
    out = np.asarray(NYU_CAMERA.img_to_3d(np.array([320.0, 240.0, 750.0])))
    np.testing.assert_allclose(out, [0.0, 0.0, 750.0], atol=1e-5)
    # one pixel right of center: x = 1 * 750 / 588.03
    out = np.asarray(NYU_CAMERA.img_to_3d(np.array([321.0, 240.0, 750.0])))
    np.testing.assert_allclose(out[0], 750.0 / 588.03, rtol=1e-6)
    # NYU flips y like MSRA (reference importers.py:1187-1195): one pixel
    # BELOW center (larger v) is NEGATIVE metric y
    out = np.asarray(NYU_CAMERA.img_to_3d(np.array([320.0, 241.0, 750.0])))
    np.testing.assert_allclose(out[1], -750.0 / 587.07, rtol=1e-6)


def test_msra_inverted_y():
    """MSRA projects with v = uy - y/z*fy (importers.py:781-793)."""
    p = np.array([100.0, 50.0, 600.0])  # 3D point with +y
    uv = np.asarray(MSRA15_CAMERA.three_d_to_img(p))
    uv_icvl = np.asarray(ICVL_CAMERA.three_d_to_img(p))
    assert uv[0] == pytest.approx(uv_icvl[0])
    # +y goes UP in MSRA (smaller v), DOWN in ICVL
    assert uv[1] < MSRA15_CAMERA.uy
    assert uv_icvl[1] > ICVL_CAMERA.uy
    np.testing.assert_allclose(
        np.asarray(MSRA15_CAMERA.img_to_3d(uv)), p, rtol=1e-5
    )


def test_zero_depth_guard():
    out = np.asarray(NYU_CAMERA.three_d_to_img(np.array([50.0, 50.0, 0.0])))
    np.testing.assert_allclose(out, [320.0, 240.0, 0.0])


def test_batched_and_jit():
    import jax

    uvd = jnp.ones((4, 5, 3)) * jnp.array([100.0, 80.0, 500.0])
    f = jax.jit(ICVL_CAMERA.img_to_3d)
    out = f(uvd)
    assert out.shape == (4, 5, 3)


def test_intrinsics_matrix():
    k = np.asarray(NYU_CAMERA.intrinsics())
    assert k[0, 0] == pytest.approx(588.03)
    # self-consistent with the flipped projection (the reference NYU class
    # inconsistently inherits +fy intrinsics; see camera.py module doc)
    assert k[1, 1] == pytest.approx(-587.07)
    assert k[0, 2] == 320.0 and k[1, 2] == 240.0
    km = np.asarray(MSRA15_CAMERA.intrinsics())
    assert km[1, 1] == pytest.approx(-241.42)


def test_depth_to_pcl():
    dpt = np.zeros((240, 320), np.float32)
    dpt[120, 160] = 500.0
    pcl = ICVL_CAMERA.depth_to_pcl(dpt)
    assert pcl.shape == (1, 3)
    assert pcl[0, 2] == pytest.approx(500.0)
    # pixel center (160.5, 120.5) back-projects near the optical axis
    assert abs(pcl[0, 0]) < 2.0 and abs(pcl[0, 1]) < 2.0
