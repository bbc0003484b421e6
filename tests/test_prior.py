"""PCA pose prior tests."""

import numpy as np
import pytest

from deepprior_tpu.camera import NYU_CAMERA
from deepprior_tpu.prior import PCAPrior, fit_pca, fit_pose_prior, sample_random_poses


@pytest.fixture(scope="module")
def pose_bank(rng=None):
    rng = np.random.default_rng(23455)
    n, j = 200, 14
    poses = rng.normal(0, 60, (n, j, 3)).astype(np.float32)
    com = np.column_stack(
        [rng.uniform(100, 500, n), rng.uniform(100, 380, n), rng.uniform(500, 900, n)]
    ).astype(np.float32)
    cube = np.tile(np.array([250.0, 250.0, 250.0], np.float32), (n, 1))
    return poses, com, cube


def test_fit_pca_reconstruction():
    rng = np.random.default_rng(0)
    # data concentrated in a 5-D subspace + small noise
    basis = rng.normal(size=(5, 42))
    coeffs = rng.normal(size=(500, 5))
    data = coeffs @ basis + 0.01 * rng.normal(size=(500, 42))
    prior = fit_pca(data, n_components=5)
    emb = np.asarray(prior.transform(data))
    rec = np.asarray(prior.inverse_transform(emb))
    assert np.abs(rec - data).max() < 0.5


def test_fit_pca_matches_sklearn():
    from sklearn.decomposition import PCA

    rng = np.random.default_rng(1)
    data = rng.normal(size=(300, 42)).astype(np.float32)
    ours = fit_pca(data, 10)
    sk = PCA(n_components=10).fit(data)
    np.testing.assert_allclose(np.abs(ours.components), np.abs(sk.components_),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(ours.mean, sk.mean_, atol=1e-5)
    emb_ours = np.asarray(ours.transform(data[:5]))
    emb_sk = sk.transform(data[:5])
    # fp32 data, no dominant directions: embeddings agree to ~1e-2
    np.testing.assert_allclose(np.abs(emb_ours), np.abs(emb_sk), atol=2e-2)


def test_sample_random_poses_shapes(pose_bank):
    poses, com, cube = pose_bank
    rng = np.random.default_rng(2)
    out = sample_random_poses(NYU_CAMERA, rng, poses, com, cube, 1000)
    assert out.shape == (1000, 42)
    assert np.isfinite(out).all()
    # normalized poses should mostly be within the cube: |x| <= ~1.5
    assert np.abs(out).mean() < 1.0


def test_sample_none_mode_is_normalized_base(pose_bank):
    poses, com, cube = pose_bank
    rng = np.random.default_rng(3)
    out = sample_random_poses(
        NYU_CAMERA, rng, poses, com, cube, 500, aug_modes=("none",)
    )
    # reference fast path (handdetector.py:844-848): NO resampling —
    # every base pose appears exactly once, ignoring num_poses
    assert out.shape == (len(poses), poses.shape[1] * 3)
    norm_bank = (poses / (cube[:, 2, None, None] / 2.0)).reshape(len(poses), -1)
    np.testing.assert_allclose(out, norm_bank, atol=1e-5)
    # return_all carries rot=None on this path (reference retall has no rot)
    p2, com3d, cube2, rot = sample_random_poses(
        NYU_CAMERA, rng, poses, com, cube, 500, aug_modes=("none",),
        return_all=True,
    )
    np.testing.assert_array_equal(p2, out)
    assert rot is None and cube2.shape == cube.shape


def test_rot_mode_changes_pose(pose_bank):
    poses, com, cube = pose_bank
    rng = np.random.default_rng(4)
    out = sample_random_poses(
        NYU_CAMERA, rng, poses, com, cube, 500, aug_modes=("rot",)
    )
    norm_bank = (poses / (cube[:, 2, None, None] / 2.0)).reshape(len(poses), -1)
    d = np.abs(out[:, None, :] - norm_bank[None, :, :]).max(axis=2).min(axis=1)
    assert (d > 1e-3).mean() > 0.9  # almost all rotated away from base


def _fixed_params(monkeypatch, rng_mod, num, n_modes, mode_i, off, sc, rot3):
    """Pin the RNG draws of sample_random_poses to known values."""
    import deepprior_tpu.prior as prior_mod

    class FakeRng:
        def integers(self, lo, hi, size):
            if hi == n_modes:
                return np.full(size, mode_i, np.int64)
            return np.zeros(size, np.int64)  # always base index 0

        def standard_normal(self, size):
            if isinstance(size, tuple):
                return np.broadcast_to(off / 5.0, size).copy()
            return np.full(size, (sc - 1.0) / 0.02)

        def uniform(self, lo, hi, size):
            return np.broadcast_to(rot3, size).copy()

    return FakeRng()


def test_sample_com_mode_hand_derived(pose_bank):
    """com mode: pose shifts by -off, com3d by +off (handdetector.py:856-860)."""
    poses, com, cube = pose_bank
    off = np.array([3.0, -4.0, 2.0])
    rng = _fixed_params(None, None, 8, 1, 0, off, 1.0, np.zeros(3))
    out, new_com, new_cube, _ = sample_random_poses(
        NYU_CAMERA, rng, poses[:1], com[:1], cube[:1], 8,
        aug_modes=("com",), return_all=True,
    )
    com3d = np.asarray(NYU_CAMERA.img_to_3d_np(com[:1]))[0]
    expect = (poses[0] - off) / (cube[0, 2] / 2.0)
    np.testing.assert_allclose(out[0].reshape(-1, 3), expect, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(new_com[0], com3d + off, rtol=1e-5)
    np.testing.assert_allclose(new_cube[0], cube[0])


def test_sample_rot3d_hand_derived(pose_bank):
    """rot3D=True: Euler rotation about the CoM in 3D (handdetector.py:868;
    transformations.py:142-155). 90 deg about z maps (x,y) -> (-y,x)."""
    poses, com, cube = pose_bank
    rot3 = np.array([0.0, 0.0, 90.0])
    rng = _fixed_params(None, None, 8, 1, 0, np.zeros(3), 1.0, rot3)
    out = sample_random_poses(
        NYU_CAMERA, rng, poses[:1], com[:1], cube[:1], 8,
        aug_modes=("rot",), rot3d=True,
    )
    got = out[0].reshape(-1, 3) * (cube[0, 2] / 2.0)
    expect = np.stack(
        [-poses[0, :, 1], poses[0, :, 0], poses[0, :, 2]], axis=-1
    )
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-3)


def test_sample_rot_com_combined_quirk(pose_bank):
    """rot+com: shift by -off, then rotate about the NEW CoM's projection
    but re-center about the OLD com3D (handdetector.py:879-887)."""
    from deepprior_tpu.geometry import rotate_points_2d_np

    poses, com, cube = pose_bank
    off = np.array([5.0, 1.0, -3.0])
    rot_deg = 40.0
    rng = _fixed_params(None, None, 8, 1, 0, off, 1.0,
                        np.array([rot_deg, 0.0, 0.0]))
    out, new_com, new_cube, _ = sample_random_poses(
        NYU_CAMERA, rng, poses[:1], com[:1], cube[:1], 8,
        aug_modes=("rot+com",), return_all=True,
    )
    cam = NYU_CAMERA
    com3d = np.asarray(cam.img_to_3d_np(com[:1]), np.float64)[0]
    new_c = com3d + off
    p = poses[0].astype(np.float64) - off
    p2d = np.asarray(cam.three_d_to_img_np(p + com3d))
    c2d = np.asarray(cam.three_d_to_img_np(new_c[None]))[0, :2]
    r2d = rotate_points_2d_np(p2d, c2d, rot_deg)
    expect = (np.asarray(cam.img_to_3d_np(r2d)) - com3d) / (cube[0, 2] / 2.0)
    np.testing.assert_allclose(out[0].reshape(-1, 3), expect, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(new_com[0], new_c, rtol=1e-5)


def test_sample_rot_com_sc_scales_pose_not_cube(pose_bank):
    """3-op combo: pose scaled by sc, cube unchanged (handdetector.py:889-897)."""
    from deepprior_tpu.geometry import rotate_points_2d_np

    poses, com, cube = pose_bank
    off = np.array([-2.0, 3.0, 1.0])
    sc_v, rot_deg = 1.1, -25.0
    rng = _fixed_params(None, None, 8, 1, 0, off, sc_v,
                        np.array([rot_deg, 0.0, 0.0]))
    for spelling in ("rot+com+sc", "sc+com+rot", "com+rot+sc"):
        out, new_com, new_cube, _ = sample_random_poses(
            NYU_CAMERA, rng, poses[:1], com[:1], cube[:1], 4,
            aug_modes=(spelling,), return_all=True,
        )
        cam = NYU_CAMERA
        com3d = np.asarray(cam.img_to_3d_np(com[:1]), np.float64)[0]
        new_c = com3d + off
        p = (poses[0].astype(np.float64) - off) * sc_v
        p2d = np.asarray(cam.three_d_to_img_np(p + com3d))
        c2d = np.asarray(cam.three_d_to_img_np(new_c[None]))[0, :2]
        r2d = rotate_points_2d_np(p2d, c2d, rot_deg)
        expect = (np.asarray(cam.img_to_3d_np(r2d)) - com3d) / (cube[0, 2] / 2.0)
        np.testing.assert_allclose(
            out[0].reshape(-1, 3), expect, rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(new_cube[0], cube[0])  # NOT scaled


def test_sample_unknown_mode_raises(pose_bank):
    poses, com, cube = pose_bank
    with pytest.raises(NotImplementedError):
        sample_random_poses(
            NYU_CAMERA, np.random.default_rng(0), poses, com, cube, 10,
            aug_modes=("zoom",),
        )


def test_fit_pose_prior_end_to_end(pose_bank):
    poses, com, cube = pose_bank
    rng = np.random.default_rng(5)
    prior = fit_pose_prior(
        NYU_CAMERA, rng, poses, com, cube, n_components=30, num_poses=20000
    )
    assert prior.components.shape == (30, 42)
    # decoding an encoded real pose should be close (30/42 dims retained)
    flat = (poses / (cube[:, 2, None, None] / 2.0)).reshape(len(poses), -1)
    rec = np.asarray(prior.inverse_transform(prior.transform(flat)))
    rel_err = np.linalg.norm(rec - flat) / np.linalg.norm(flat)
    # random Gaussian poses are full-rank; 30/42 components retain ~60%+
    assert rel_err < 0.45
