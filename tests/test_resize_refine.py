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
