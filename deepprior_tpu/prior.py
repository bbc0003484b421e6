"""The 30-D PCA pose prior — DeepPrior++'s key idea.

The network regresses a low-dimensional embedding; a fixed linear layer
(components + mean from a PCA fit over ~1e6 augmented poses) decodes it to
the full (J, 3) pose.  Reference: PCA fit at
main_nyu_posereg_embedding.py:86-92, pose sampling at
handdetector.py:805-909 (`sampleRandomPoses`), decode layer appended at
main:148-158.

The reference loops 1e6 poses in Python; `sample_random_poses` is fully
vectorized numpy (the one-off fit stays host-side — it's not worth a TPU
round trip), and the decode is a jit-friendly matmul.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import numpy as np

from deepprior_tpu.camera import Camera
from deepprior_tpu.geometry import rotate_points_2d_np, rotate_points_3d_np


class PCAPrior(NamedTuple):
    """Fitted linear pose prior: decode(e) = e @ components + mean."""

    components: np.ndarray  # (n_components, J*3)
    mean: np.ndarray  # (J*3,)

    @property
    def n_components(self) -> int:
        return self.components.shape[0]

    def transform(self, poses_flat):
        """(N, J*3) normalized poses -> (N, n_components) embeddings."""
        import jax
        import jax.numpy as jnp

        return jnp.matmul(
            jnp.asarray(poses_flat) - self.mean, self.components.T,
            precision=jax.lax.Precision.HIGHEST,
        )

    def inverse_transform(self, embedded):
        """(N, n_components) -> (N, J*3); the appended decode layer."""
        import jax
        import jax.numpy as jnp

        return (
            jnp.matmul(
                jnp.asarray(embedded), self.components,
                precision=jax.lax.Precision.HIGHEST,
            )
            + self.mean
        )


def fit_pca(data: np.ndarray, n_components: int = 30) -> PCAPrior:
    """PCA via SVD (equivalent to sklearn.decomposition.PCA.fit used at
    main_nyu_posereg_embedding.py:86)."""
    data = np.asarray(data, np.float64)
    mean = data.mean(axis=0)
    centered = data - mean
    # economical SVD: only the top components are needed
    _, _, vt = np.linalg.svd(centered, full_matrices=False)
    comps = vt[:n_components]
    # sklearn's deterministic sign convention: largest |entry| positive
    signs = np.sign(comps[np.arange(len(comps)), np.argmax(np.abs(comps), axis=1)])
    comps = comps * signs[:, None]
    return PCAPrior(comps.astype(np.float32), mean.astype(np.float32))


# every spelling the reference accepts (handdetector.py:830-833); '+'-joined
# combos are order-insensitive here (the reference's elif chain at :879
# compares some spellings against the whole aug_modes list — a latent bug we
# do not reproduce: all six 3-op spellings behave identically)
ALL_SAMPLE_MODES = (
    "none", "rot", "sc", "com", "rot+com", "com+rot",
    "rot+com+sc", "rot+sc+com", "sc+rot+com", "sc+com+rot",
    "com+sc+rot", "com+rot+sc",
)


def sample_random_poses(
    camera: Camera,
    rng: np.random.Generator,
    base_poses: np.ndarray,  # (N, J, 3) CoM-centered mm
    base_com: np.ndarray,  # (N, 3) image coords (u, v, d)
    base_cube: np.ndarray,  # (N, 3) mm
    num_poses: int,
    aug_modes: Sequence[str] = ("com", "rot", "none"),
    sigma_com: float = 5.0,
    sigma_sc: float = 0.02,
    rot_range: float = 180.0,
    rot3d: bool = False,
    return_all: bool = False,
):
    """Vectorized pose-space augmentation for the PCA fit.

    Reproduces `HandDetector.sampleRandomPoses` (handdetector.py:805-909):
    single-op modes ('com', 'rot', 'sc', 'none'), the combined modes
    ('rot+com', 'rot+com+sc' and their spellings, :879-897) and 3D rotation
    (rot3d=True -> rotatePoints3D about the CoM, :868, 890;
    transformations.py:142-155).  Two reference quirks are kept exactly:
    in the combined modes the 2D rotation centers on the NEW CoM's
    projection while the re-projection stays about the OLD com3D
    (:884-887), and the 3-op combos scale the POSE but not the cube
    (:892-894).

    Returns (num_poses, J*3) poses normalized by cube_z/2; with
    return_all=True returns (poses, new_com3d, new_cube, rot) like the
    reference's retall.

    Special case kept from the reference (handdetector.py:844-848):
    aug_modes == ['none'] does NOT resample — every base pose is returned
    exactly once (N rows, not num_poses), normalized by its own cube;
    return_all then carries rot=None (the reference's retall returns only
    3 values on this path).
    """
    num_poses = int(num_poses)
    n, j, _ = base_poses.shape
    if tuple(aug_modes) == ("none",):
        normalized = base_poses.astype(np.float64) / (
            np.asarray(base_cube, np.float64)[:, 2] / 2.0
        )[:, None, None]
        poses_flat = normalized.reshape(n, j * 3).astype(np.float32)
        if return_all:
            com3d_all = np.asarray(
                camera.img_to_3d_np(np.asarray(base_com, np.float64)),
                np.float64,
            )
            return (
                poses_flat, com3d_all,
                np.asarray(base_cube, np.float64).copy(), None,
            )
        return poses_flat
    modes = rng.integers(0, len(aug_modes), num_poses)
    ridx = rng.integers(0, n, num_poses)
    off = rng.standard_normal((num_poses, 3)) * sigma_com
    sc = np.abs(rng.standard_normal(num_poses) * sigma_sc + 1.0)
    # 3 angles per sample like the reference (:842); 2D paths use [:, 0]
    rot = rng.uniform(-rot_range, rot_range, (num_poses, 3))

    pose = base_poses[ridx].astype(np.float64)  # (P, J, 3)
    com_img = base_com[ridx].astype(np.float64)
    cube = base_cube[ridx].astype(np.float64)
    com3d = np.asarray(camera.img_to_3d_np(com_img), np.float64)

    out = np.empty((num_poses, j, 3), np.float64)
    out_com3d = com3d.copy()
    out_cube = cube.copy()

    def _rotate_2d(p, center3d, about3d, ang):
        """Project p+about3d, rotate about center3d's projection, unproject
        and re-center about about3d (handdetector.py:866-868, 884-887)."""
        p2d = np.asarray(camera.three_d_to_img_np(p + about3d[:, None, :]), np.float64)
        c2d = np.asarray(camera.three_d_to_img_np(center3d), np.float64)
        r2d = rotate_points_2d_np(p2d, c2d[:, None, :2], ang[:, None])
        return np.asarray(camera.img_to_3d_np(r2d), np.float64) - about3d[:, None, :]

    def _rotate_3d(p, about3d, ang3):
        """Host-side twin of rotate_points_3d — the one-off fit must not
        dispatch eager device ops (tunnel transfer dominates)."""
        r = rotate_points_3d_np(
            p + about3d[:, None, :],
            about3d[:, None, :],
            ang3[:, 0:1], ang3[:, 1:2], ang3[:, 2:3],
        )
        return r - about3d[:, None, :]

    for mi, mode in enumerate(aug_modes):
        if mode not in ALL_SAMPLE_MODES:
            raise NotImplementedError(f"aug mode {mode!r}")
        sel = modes == mi
        if not sel.any():
            continue
        ops = set(mode.split("+"))
        if mode == "none":
            out[sel] = pose[sel]
        elif mode == "com":
            # pose shifts opposite the CoM shift (handdetector.py:856-860)
            out_com3d[sel] = com3d[sel] + off[sel]
            out[sel] = pose[sel] - off[sel][:, None, :]
        elif mode == "sc":
            out[sel] = pose[sel]
            out_cube[sel] = cube[sel] * sc[sel, None]
        elif mode == "rot":
            if rot3d:
                out[sel] = _rotate_3d(pose[sel], com3d[sel], rot[sel])
            else:
                out[sel] = _rotate_2d(
                    pose[sel], com3d[sel], com3d[sel], rot[sel, 0]
                )
        elif ops == {"rot", "com"} or ops == {"rot", "com", "sc"}:
            new_c = com3d[sel] + off[sel]
            out_com3d[sel] = new_c
            p = pose[sel] - off[sel][:, None, :]
            if "sc" in ops:
                # quirk: pose scaled, cube NOT scaled (:892-894)
                p = p * sc[sel, None, None]
            if rot3d:
                out[sel] = _rotate_3d(p, new_c, rot[sel])
            else:
                # quirk: rotate about the NEW CoM's projection, re-center
                # about the OLD com3D (:884-887)
                out[sel] = _rotate_2d(p, new_c, com3d[sel], rot[sel, 0])
        else:
            raise NotImplementedError(f"aug mode {mode!r}")

    normalized = out / (out_cube[:, 2] / 2.0)[:, None, None]
    poses_flat = normalized.reshape(num_poses, j * 3).astype(np.float32)
    if return_all:
        return poses_flat, out_com3d, out_cube, rot
    return poses_flat


def fit_pose_prior(
    camera: Camera,
    rng: np.random.Generator,
    base_poses: np.ndarray,
    base_com: np.ndarray,
    base_cube: np.ndarray,
    n_components: int = 30,
    num_poses: int = 1_000_000,
    aug_modes: Sequence[str] = ("com", "rot", "none"),
    rot3d: bool = False,
) -> PCAPrior:
    """sampleRandomPoses + PCA fit, the flagship recipe (main:86-92)."""
    samples = sample_random_poses(
        camera, rng, base_poses, base_com, base_cube, num_poses, aug_modes,
        rot3d=rot3d,
    )
    return fit_pca(samples, n_components)
