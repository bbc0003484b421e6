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
    # every sample is some base pose / (cube_z/2)
    norm_bank = (poses / (cube[:, 2, None, None] / 2.0)).reshape(len(poses), -1)
    d = np.abs(out[:, None, :] - norm_bank[None, :, :]).max(axis=2).min(axis=1)
    assert d.max() < 1e-5


def test_rot_mode_changes_pose(pose_bank):
    poses, com, cube = pose_bank
    rng = np.random.default_rng(4)
    out = sample_random_poses(
        NYU_CAMERA, rng, poses, com, cube, 500, aug_modes=("rot",)
    )
    norm_bank = (poses / (cube[:, 2, None, None] / 2.0)).reshape(len(poses), -1)
    d = np.abs(out[:, None, :] - norm_bank[None, :, :]).max(axis=2).min(axis=1)
    assert (d > 1e-3).mean() > 0.9  # almost all rotated away from base


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
