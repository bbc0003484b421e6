"""Pallas affine-warp kernel vs. the gather reference (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepprior_tpu.geometry import rotation_matrix_2d
from deepprior_tpu.ops.crop import warp_patch


def _rand_patches(b=3, h=128, w=128, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(400.0, 900.0, (b, h, w)).astype(np.float32)


@pytest.mark.slow
def test_pallas_warp_matches_gather_rotation():
    from jax.experimental.pallas import tpu as pltpu

    from deepprior_tpu.ops.pallas_warp import pallas_warp_patch

    patches = _rand_patches()
    b = patches.shape[0]
    ms = np.stack(
        [
            np.asarray(rotation_matrix_2d(np.array([64.0, 64.0]), ang))
            for ang in (0.0, 33.0, -117.0)
        ]
    ).astype(np.float32)
    ref = np.asarray(warp_patch(patches, ms))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(pallas_warp_patch(patches, jnp.asarray(ms)))
    # fma ordering can flip floor(x+0.5) for coordinates landing exactly on
    # a half-integer; allow a vanishing fraction of such single-pixel flips
    mismatch = np.mean(out != ref)
    assert mismatch < 1e-4, f"{mismatch:.6f} of pixels differ"


def test_pallas_warp_identity_exact():
    from jax.experimental.pallas import tpu as pltpu

    from deepprior_tpu.ops.pallas_warp import pallas_warp_patch

    patches = _rand_patches(b=2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (2, 3, 3))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(pallas_warp_patch(patches, eye))
    np.testing.assert_array_equal(out, patches)


def test_pallas_warp_border_and_nv():
    from jax.experimental.pallas import tpu as pltpu

    from deepprior_tpu.ops.pallas_warp import pallas_warp_patch

    patches = np.full((1, 128, 128), 32000.0, np.float32)
    m = np.eye(3, dtype=np.float32)[None].copy()
    m[0, 0, 2] = 200.0  # shift everything out of frame
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(pallas_warp_patch(patches, jnp.asarray(m)))
    np.testing.assert_array_equal(out, 0.0)  # border
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(
            pallas_warp_patch(patches, jnp.eye(3)[None], nv_val=32000.0)
        )
    np.testing.assert_array_equal(out, 0.0)  # nv masking


@pytest.mark.slow
def test_augment_pallas_flag_matches_gather():
    """augment_batch(use_pallas=True) in interpret mode == gather path."""
    from jax.experimental.pallas import tpu as pltpu

    from deepprior_tpu.camera import NYU_CAMERA
    from deepprior_tpu.data.synthetic import make_frame
    from deepprior_tpu.ops.augment import augment_batch
    from deepprior_tpu.ops.crop import normalize_crop

    rng = np.random.default_rng(4)
    frames = [make_frame(NYU_CAMERA, rng) for _ in range(2)]
    cube = np.tile(np.array([250.0, 250.0, 250.0], np.float32), (2, 1))
    crops = np.stack([f.dpt for f in frames])
    com = np.stack([f.com for f in frames])
    m = np.stack([f.T for f in frames])
    gt3d = np.stack([f.gt3Dcrop for f in frames])
    crops_norm = np.asarray(normalize_crop(crops, com[:, 2], cube[:, 2]))

    key = jax.random.key(1)
    ref = augment_batch(
        key, crops_norm, gt3d, com, cube, m, NYU_CAMERA,
        aug_modes=("com", "rot", "sc", "none"), use_pallas=False,
    )
    with pltpu.force_tpu_interpret_mode():
        out = augment_batch(
            key, crops_norm, gt3d, com, cube, m, NYU_CAMERA,
            aug_modes=("com", "rot", "sc", "none"), use_pallas=True,
        )
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_pallas_warp_separable_fast_path_exact():
    """Axis-aligned transforms (com/sc/none augment modes) take the
    two-matmul separable branch and still match the gather reference."""
    from jax.experimental.pallas import tpu as pltpu

    from deepprior_tpu.ops.pallas_warp import pallas_warp_patch

    patches = _rand_patches(b=4, seed=7)
    ms = np.tile(np.eye(3, dtype=np.float32), (4, 1, 1))
    # scale + translate only: m01 == m10 == 0
    ms[0, 0, 0], ms[0, 1, 1] = 1.17, 1.17
    ms[0, 0, 2], ms[0, 1, 2] = -9.25, 4.5
    ms[1, 0, 0], ms[1, 1, 1] = 0.83, 0.79
    ms[1, 0, 2], ms[1, 1, 2] = 30.0, -17.75
    ms[2, 0, 2], ms[2, 1, 2] = 200.0, 0.0  # shifts out of frame -> border
    ref = np.asarray(warp_patch(patches, ms))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(pallas_warp_patch(patches, jnp.asarray(ms)))
    mismatch = np.mean(out != ref)
    assert mismatch < 1e-4, f"{mismatch:.6f} of pixels differ"


def test_pallas_warp_mixed_batch_routes_both_paths():
    """A batch mixing rotations with axis-aligned transforms merges the two
    kernel outputs correctly per sample."""
    from jax.experimental.pallas import tpu as pltpu

    from deepprior_tpu.ops.pallas_warp import pallas_warp_patch

    patches = _rand_patches(b=4, seed=11)
    ms = np.stack(
        [
            np.asarray(rotation_matrix_2d(np.array([64.0, 64.0]), 71.0)),
            np.eye(3, dtype=np.float32),
            np.asarray(rotation_matrix_2d(np.array([64.0, 64.0]), -13.0)),
            np.diag([0.9, 1.1, 1.0]).astype(np.float32),
        ]
    ).astype(np.float32)
    ref = np.asarray(warp_patch(patches, ms))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(pallas_warp_patch(patches, jnp.asarray(ms)))
    mismatch = np.mean(out != ref)
    assert mismatch < 1e-4, f"{mismatch:.6f} of pixels differ"
    # identity sample must be bit-exact passthrough
    np.testing.assert_array_equal(out[1], patches[1])


def test_pallas_warp_block_k_bit_identical():
    """block_k=K (K contiguous samples per grid step, one DMA) is
    bit-identical to the per-sample kernel for a batch mixing separable
    and rotated transforms."""
    from jax.experimental.pallas import tpu as pltpu

    from deepprior_tpu.ops.pallas_warp import pallas_warp_patch

    patches = _rand_patches(b=4, seed=13)
    ms = np.stack(
        [
            np.asarray(rotation_matrix_2d(np.array([64.0, 64.0]), 29.0)),
            np.eye(3, dtype=np.float32),
            np.diag([1.07, 0.93, 1.0]).astype(np.float32),
            np.asarray(rotation_matrix_2d(np.array([64.0, 64.0]), -96.0)),
        ]
    ).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        ref = np.asarray(pallas_warp_patch(patches, jnp.asarray(ms)))
        out2 = np.asarray(
            pallas_warp_patch(patches, jnp.asarray(ms), block_k=2)
        )
        out4 = np.asarray(
            pallas_warp_patch(patches, jnp.asarray(ms), block_k=4)
        )
    np.testing.assert_array_equal(out2, ref)
    np.testing.assert_array_equal(out4, ref)
    # non-divisible batch sizes are rejected loudly
    with pytest.raises(AssertionError):
        pallas_warp_patch(patches[:3], jnp.asarray(ms[:3]), block_k=2)


def test_pallas_warp_norm_identity_roundtrip():
    """Fused unnorm+warp+renorm with identity transforms, no threshold and
    unchanged (com, cube) is the renormalize(unnormalize(patch)) identity:
    values inside the cube round-trip to f32 ulps; the per-sample max and
    background map to +1 (the far cube face), exactly like the unfused
    epilogue (nettrainer.py:985-997)."""
    from jax.experimental.pallas import tpu as pltpu

    from deepprior_tpu.ops.pallas_warp import pallas_warp_norm

    b, h, w = 2, 128, 128
    rng = np.random.default_rng(9)
    patch = rng.uniform(-0.9, 0.9, (b, h, w)).astype(np.float32)
    # the patch max IS premax after unnormalization: it must map to the
    # far cube face (here: itself, since +1 unnormalizes to zend)
    patch[:, 0, 0] = 1.0
    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (b, 3, 3))
    com_z = np.array([700.0, 900.0], np.float32)
    cube_z = np.array([250.0, 300.0], np.float32)
    zeros = np.zeros(b, np.float32)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(
            pallas_warp_norm(
                patch, eye, com_z, cube_z, zeros, zeros, zeros,
                com_z, cube_z,
            )
        )
    np.testing.assert_allclose(out, patch, atol=2e-6)


@pytest.mark.slow
def test_augment_fuse_norm_matches_unfused():
    """augment_batch(fuse_norm=True) == the unfused Pallas pipeline to f32
    ulps (the fused kernel unnormalizes in VMEM; XLA's elementwise pass may
    FMA differently), across all four modes including the recrop
    threshold."""
    from jax.experimental.pallas import tpu as pltpu

    from deepprior_tpu.camera import NYU_CAMERA
    from deepprior_tpu.data.synthetic import make_frame
    from deepprior_tpu.ops.augment import augment_batch
    from deepprior_tpu.ops.crop import normalize_crop

    rng = np.random.default_rng(6)
    frames = [make_frame(NYU_CAMERA, rng) for _ in range(4)]
    cube = np.tile(np.array([250.0, 250.0, 250.0], np.float32), (4, 1))
    crops = np.stack([f.dpt for f in frames])
    com = np.stack([f.com for f in frames])
    m = np.stack([f.T for f in frames])
    gt3d = np.stack([f.gt3Dcrop for f in frames])
    crops_norm = np.asarray(normalize_crop(crops, com[:, 2], cube[:, 2]))

    key = jax.random.key(3)
    with pltpu.force_tpu_interpret_mode():
        ref = augment_batch(
            key, crops_norm, gt3d, com, cube, m, NYU_CAMERA,
            aug_modes=("com", "rot", "sc", "none"), use_pallas=True,
            fuse_norm=False,
        )
        ref = [np.asarray(a) for a in ref]
        out = augment_batch(
            key, crops_norm, gt3d, com, cube, m, NYU_CAMERA,
            aug_modes=("com", "rot", "sc", "none"), use_pallas=True,
            fuse_norm=True,
        )
        out = [np.asarray(a) for a in out]
    for a, b in zip(out, ref):
        np.testing.assert_allclose(a, b, atol=1e-5)
    # and the fused crops are overwhelmingly bit-identical (only FMA-moved
    # unnormalize values can differ)
    assert np.mean(out[0] == ref[0]) > 0.99
