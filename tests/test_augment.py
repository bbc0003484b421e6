"""On-device augmentation tests (reference augmentCrop semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepprior_tpu.camera import NYU_CAMERA
from deepprior_tpu.data.synthetic import make_frame
from deepprior_tpu.ops.augment import augment_batch, sample_augment_params
from deepprior_tpu.ops.crop import normalize_crop


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(5)
    cam = NYU_CAMERA
    frames = [make_frame(cam, rng) for _ in range(4)]
    cube = np.tile(np.array([250.0, 250.0, 250.0], np.float32), (4, 1))
    crops = np.stack([f.dpt for f in frames])
    com = np.stack([f.com for f in frames])
    m = np.stack([f.T for f in frames])
    gt3d = np.stack([f.gt3Dcrop for f in frames])
    crops_norm = np.asarray(normalize_crop(crops, com[:, 2], cube[:, 2]))
    return cam, crops_norm, gt3d, com, cube, m


def test_sample_params_distribution():
    mode, off, rot, sc = sample_augment_params(jax.random.key(0), 4096, 3)
    mode, off, rot, sc = map(np.asarray, (mode, off, rot, sc))
    assert set(np.unique(mode)) <= {0, 1, 2}
    assert abs(off.std() - 5.0) < 0.5
    assert abs(rot.max()) <= 180.0 and rot.std() > 80.0
    assert abs(sc.mean() - 1.0) < 0.01


@pytest.mark.slow
def test_none_mode_is_identity(batch):
    cam, crops_norm, gt3d, com, cube, m = batch
    out, labels, new_com, new_cube, new_m = augment_batch(
        jax.random.key(0), crops_norm, gt3d, com, cube, m, cam, aug_modes=("none",)
    )
    # pixels not equal to premax round-trip exactly; premax pixels map to
    # the cube face (reference nettrainer.py:991-993 does the same)
    out = np.asarray(out)
    premax_mask = np.isclose(crops_norm, crops_norm.max(axis=(1, 2), keepdims=True))
    agree = np.isclose(out, crops_norm, atol=1e-5) | premax_mask
    assert agree.mean() > 0.999
    np.testing.assert_allclose(np.asarray(new_com), com)
    np.testing.assert_allclose(np.asarray(new_cube), cube)
    np.testing.assert_allclose(
        np.asarray(labels), gt3d / (cube[:, 2, None, None] / 2.0), rtol=1e-5
    )


def test_com_mode_shifts_labels(batch):
    cam, crops_norm, gt3d, com, cube, m = batch
    out, labels, new_com, new_cube, new_m = augment_batch(
        jax.random.key(1), crops_norm, gt3d, com, cube, m, cam, aug_modes=("com",)
    )
    new_com = np.asarray(new_com)
    # CoM moved
    assert not np.allclose(new_com, com)
    # labels shifted by com3D - new_com3D (moveCoM, handdetector.py:708)
    com3d = np.asarray(cam.img_to_3d(com))
    ncom3d = np.asarray(cam.img_to_3d(new_com))
    expect = (gt3d + (com3d - ncom3d)[:, None, :]) / (cube[:, 2, None, None] / 2.0)
    np.testing.assert_allclose(np.asarray(labels), expect, rtol=1e-3, atol=1e-3)
    # M updated to the new crop transform
    assert not np.allclose(np.asarray(new_m), m)


def test_rot_mode_preserves_radius(batch):
    cam, crops_norm, gt3d, com, cube, m = batch
    out, labels, new_com, new_cube, new_m = augment_batch(
        jax.random.key(2), crops_norm, gt3d, com, cube, m, cam, aug_modes=("rot",)
    )
    labels_mm = np.asarray(labels) * (cube[:, 2, None, None] / 2.0)
    # in-plane rotation approximately preserves 3D distance to the CoM axis
    # (approximately only: the reference rotates in *image* space, which
    # distorts xy radii for joints offset in depth — handdetector.py:740-745)
    r_before = np.linalg.norm(gt3d[..., :2], axis=-1)
    r_after = np.linalg.norm(labels_mm[..., :2], axis=-1)
    np.testing.assert_allclose(r_after, r_before, rtol=0.3, atol=10.0)
    # com/cube/M unchanged (rotateHand does not touch them)
    np.testing.assert_allclose(np.asarray(new_com), com)
    np.testing.assert_allclose(np.asarray(new_m), m)
    # the patch itself rotated: content differs
    assert not np.allclose(np.asarray(out), crops_norm, atol=1e-3)


def test_rot_mode_blob_matches_label(monkeypatch):
    """Image and label must rotate CONSISTENTLY (regression: round-1 bug
    rotated the patch by -rot while labels rotated by +rot).

    A bright blob painted at pixel p must land exactly where
    rotate_points_2d(p, patch_center, rot) puts the label."""
    import deepprior_tpu.ops.augment as aug_mod
    from deepprior_tpu.geometry import rotate_points_2d

    cam = NYU_CAMERA
    b, h, w = 1, 128, 128
    crop = jnp.ones((b, h, w), jnp.float32)  # background = far face (+1)
    # near 3x3 blob at (x=96, y=64); 3x3 so nearest-neighbour resampling
    # cannot drop it at non-axis-aligned angles
    crop = crop.at[0, 63:66, 95:98].set(-0.5)
    gt = jnp.zeros((b, 1, 3), jnp.float32)
    com = jnp.array([[320.0, 240.0, 500.0]])
    cube = jnp.array([[250.0, 250.0, 250.0]])
    m = jnp.broadcast_to(jnp.eye(3), (b, 3, 3))

    for rot_deg in (90.0, 30.0, -45.0):
        monkeypatch.setattr(
            aug_mod,
            "sample_augment_params",
            lambda key, batch_, num_modes, *a, **kw: (
                jnp.zeros((batch_,), jnp.int32),
                jnp.zeros((batch_, 3)),
                jnp.full((batch_,), rot_deg),
                jnp.ones((batch_,)),
            ),
        )
        out, *_ = aug_mod.augment_batch(
            jax.random.key(0), crop, gt, com, cube, m, cam,
            aug_modes=("rot",), use_pallas=False,
        )
        yx = np.unravel_index(np.argmin(np.asarray(out[0])), (h, w))
        expect = np.asarray(
            rotate_points_2d(
                jnp.array([96.0, 64.0]), jnp.array([64.0, 64.0]), rot_deg
            )
        )
        assert abs(yx[1] - expect[0]) <= 2.0 and abs(yx[0] - expect[1]) <= 2.0, (
            f"rot={rot_deg}: blob at (x={yx[1]}, y={yx[0]}), label at {expect}"
        )


def test_sc_mode_scales_cube(batch):
    cam, crops_norm, gt3d, com, cube, m = batch
    out, labels, new_com, new_cube, new_m = augment_batch(
        jax.random.key(3), crops_norm, gt3d, com, cube, m, cam, aug_modes=("sc",)
    )
    new_cube = np.asarray(new_cube)
    assert not np.allclose(new_cube, cube)
    # labels unchanged in mm, renormalized by the new cube
    np.testing.assert_allclose(
        np.asarray(labels) * (new_cube[:, 2, None, None] / 2.0),
        gt3d,
        rtol=1e-3,
        atol=1e-3,
    )
    np.testing.assert_allclose(np.asarray(new_com), com)


def test_output_range(batch):
    cam, crops_norm, gt3d, com, cube, m = batch
    out, *_ = augment_batch(
        jax.random.key(4), crops_norm, gt3d, com, cube, m, cam,
        aug_modes=("com", "rot", "sc", "none"),
    )
    out = np.asarray(out)
    assert out.min() >= -1.0 - 1e-4 and out.max() <= 1.0 + 1e-4


def test_jit_and_grad_safe(batch):
    """Augmentation must live inside the jitted train step."""
    cam, crops_norm, gt3d, com, cube, m = batch
    f = jax.jit(
        lambda k: augment_batch(
            k, crops_norm, gt3d, com, cube, m, cam, aug_modes=("com", "rot", "none")
        )[0]
    )
    o1 = f(jax.random.key(0))
    o2 = f(jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))  # deterministic
    o3 = f(jax.random.key(9))
    assert not np.allclose(np.asarray(o1), np.asarray(o3))


def test_zero_one_normalization(batch):
    cam, crops_norm, gt3d, com, cube, m = batch
    zo = (np.asarray(crops_norm) + 1.0) / 2.0
    out, *_ = augment_batch(
        jax.random.key(5), zo, gt3d, com, cube, m, cam,
        aug_modes=("none",), norm_zero_one=True,
    )
    out = np.asarray(out)
    assert out.min() >= -1e-4 and out.max() <= 1.0 + 1e-4


def _warp_linear_np(img, m_fwd, border=0.0, nv_val=None):
    """Numpy twin of warp_patch(use_bilinear=True): cv2.warpPerspective
    INTER_LINEAR float idealization — dst centers inverse-mapped (no
    half-pixel shift, unlike resize), 4-tap blend with constant border,
    nv-mask applied AFTER the blend (handdetector.py:791-793 order)."""
    h, w = img.shape
    m_inv = np.linalg.inv(np.asarray(m_fwd, np.float64)).astype(np.float32)
    v, u = np.meshgrid(np.arange(h, dtype=np.float32),
                       np.arange(w, dtype=np.float32), indexing="ij")
    sx = m_inv[0, 0] * u + m_inv[0, 1] * v + m_inv[0, 2]
    sy = m_inv[1, 0] * u + m_inv[1, 1] * v + m_inv[1, 2]
    sz = m_inv[2, 0] * u + m_inv[2, 1] * v + m_inv[2, 2]
    xf, yf = sx / sz, sy / sz
    x0, y0 = np.floor(xf), np.floor(yf)
    fx, fy = xf - x0, yf - y0

    def tap(q, p):
        inb = (p >= 0) & (p < w) & (q >= 0) & (q < h)
        vals = img[np.clip(q, 0, h - 1).astype(int),
                   np.clip(p, 0, w - 1).astype(int)]
        return np.where(inb, vals, border).astype(np.float32)

    out = (tap(y0, x0) * (1 - fx) * (1 - fy)
           + tap(y0, x0 + 1) * fx * (1 - fy)
           + tap(y0 + 1, x0) * (1 - fx) * fy
           + tap(y0 + 1, x0 + 1) * fx * fy)
    if nv_val is not None:
        out = np.where(np.isclose(out, nv_val), border, out)
    return out.astype(np.float32)


def _rand_affine(rng):
    ang = np.deg2rad(rng.uniform(-60, 60))
    s = rng.uniform(0.7, 1.4)
    c, sn = np.cos(ang) * s, np.sin(ang) * s
    tx, ty = rng.uniform(-8, 8, 2)
    return np.array([[c, -sn, tx], [sn, c, ty], [0, 0, 1]], np.float32)


def test_warp_patch_bilinear_matches_numpy_twin():
    from deepprior_tpu.ops.crop import warp_patch

    rng = np.random.default_rng(3)
    for _ in range(6):
        img = rng.uniform(400.0, 1100.0, (32, 32)).astype(np.float32)
        img[rng.uniform(size=img.shape) < 0.2] = 32000.0  # NV pixels
        m = _rand_affine(rng)
        ours = np.asarray(warp_patch(img, m, border=0.0, nv_val=32000.0,
                                     use_bilinear=True))
        ref = _warp_linear_np(img, m, border=0.0, nv_val=32000.0)
        # rtol covers coordinate ulps (inv3x3 vs np.linalg.inv) amplified
        # by partially-blended NV(32000) pixels — the blend-leak itself is
        # cv2-faithful (the reference's isclose nv-mask runs post-blend
        # and only catches near-exact marker values, handdetector.py:793)
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=0.05)


@pytest.mark.slow
def test_warp_patch_bilinear_matches_torch_grid_sample():
    """Independent oracle for the 4-tap warp blend + constant-0 border
    (cv2 is not in this image): torch grid_sample 'bilinear' with
    align_corners=True maps grid [-1,1] to pixel centers [0, size-1] —
    the unnormalized source coordinate — and 'zeros' padding blends 0
    for out-of-bound taps, exactly warp_patch's border=0 semantics."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from deepprior_tpu.ops.crop import warp_patch

    rng = np.random.default_rng(9)
    for _ in range(4):
        h, w = 40, 56
        img = rng.uniform(0.0, 1500.0, (h, w)).astype(np.float32)
        m = _rand_affine(rng)
        ours = np.asarray(warp_patch(img, m, border=0.0, use_bilinear=True))

        m_inv = np.linalg.inv(np.asarray(m, np.float64)).astype(np.float32)
        v, u = np.meshgrid(np.arange(h, dtype=np.float32),
                           np.arange(w, dtype=np.float32), indexing="ij")
        xf = m_inv[0, 0] * u + m_inv[0, 1] * v + m_inv[0, 2]
        yf = m_inv[1, 0] * u + m_inv[1, 1] * v + m_inv[1, 2]
        grid = np.stack([2.0 * xf / (w - 1) - 1.0,
                         2.0 * yf / (h - 1) - 1.0], axis=-1)
        ref = F.grid_sample(
            torch.from_numpy(img)[None, None],
            torch.from_numpy(grid)[None],
            mode="bilinear", padding_mode="zeros", align_corners=True,
        )[0, 0].numpy()
        np.testing.assert_allclose(ours, ref, atol=0.05)


@pytest.mark.slow
def test_augment_linear_resize(batch):
    """resize='linear' (reference RESIZE_CV2_LINEAR through rotateHand/
    recropHand, handdetector.py:731-737/785-791): label/com/cube/m math is
    interpolation-independent, 'none' passes through like nearest, and a
    recropped batch actually blends (differs from the nearest warp)."""
    cam, crops_norm, gt3d, com, cube, m = batch

    out_n, labels_n, com_n, cube_n, m_n = augment_batch(
        jax.random.key(3), crops_norm, gt3d, com, cube, m, cam,
        aug_modes=("com", "rot"), resize="nearest", use_pallas=False)
    out_l, labels_l, com_l, cube_l, m_l = augment_batch(
        jax.random.key(3), crops_norm, gt3d, com, cube, m, cam,
        aug_modes=("com", "rot"), resize="linear")
    np.testing.assert_array_equal(np.asarray(labels_n), np.asarray(labels_l))
    np.testing.assert_array_equal(np.asarray(com_n), np.asarray(com_l))
    np.testing.assert_array_equal(np.asarray(cube_n), np.asarray(cube_l))
    np.testing.assert_array_equal(np.asarray(m_n), np.asarray(m_l))
    out_l = np.asarray(out_l)
    assert np.isfinite(out_l).all()
    assert not np.array_equal(np.asarray(out_n), out_l)

    # 'none' passthrough holds under linear too (integer coords -> frac 0)
    out0, *_ = augment_batch(
        jax.random.key(0), crops_norm, gt3d, com, cube, m, cam,
        aug_modes=("none",), resize="linear")
    out0 = np.asarray(out0)
    premax = np.isclose(crops_norm, crops_norm.max(axis=(1, 2), keepdims=True))
    assert (np.isclose(out0, crops_norm, atol=1e-5) | premax).mean() > 0.999

    # every Pallas-only knob fails loudly under 'linear' (the warp kernels
    # are nearest-only; a silent fallback would drop an explicitly
    # requested kernel path)
    with pytest.raises(ValueError, match="nearest-only"):
        augment_batch(jax.random.key(0), crops_norm, gt3d, com, cube, m,
                      cam, resize="linear", use_pallas=True)
    with pytest.raises(ValueError, match="nearest-only"):
        augment_batch(jax.random.key(0), crops_norm, gt3d, com, cube, m,
                      cam, resize="linear", fuse_norm=True)
    with pytest.raises(ValueError, match="nearest-only"):
        augment_batch(jax.random.key(0), crops_norm, gt3d, com, cube, m,
                      cam, resize="linear", block_k=4)
    with pytest.raises(ValueError, match="unknown resize"):
        augment_batch(jax.random.key(0), crops_norm, gt3d, com, cube, m,
                      cam, resize="cubic")
