"""Synthetic depth-frame fixtures with known joint annotations.

The reference's only offline "fixtures" were pickle caches and the
file-replay camera device (reference src/util/cameradevice.py:348-457).
This module generates parametric hands-as-blobs: a palm sphere + finger
capsules rendered into a depth map with exact ground-truth joints, so every
stage (detection, crop, augmentation, training, evaluation, realtime replay)
can be tested end-to-end without the real ICVL/NYU/MSRA data.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from deepprior_tpu.camera import Camera
from deepprior_tpu.data.basetypes import DepthFrame, ImageSequence
from deepprior_tpu.data.detector_np import HandCropper
from deepprior_tpu.geometry import transform_points_2d


def synthetic_hand_pose(
    rng: np.random.Generator, num_joints: int = 14, spread_mm: float = 80.0
) -> np.ndarray:
    """Random CoM-centered 3D pose: joints in a plausible-hand envelope."""
    pose = rng.uniform(-spread_mm, spread_mm, size=(num_joints, 3))
    pose[:, 2] *= 0.4  # hands are mostly planar in depth
    pose[0] = 0.0  # one joint at the crop center
    return pose.astype(np.float32)


def render_depth(
    camera: Camera,
    com3d: np.ndarray,
    pose3d: np.ndarray,
    radius_mm: float = 18.0,
    background: float = 0.0,
) -> np.ndarray:
    """Render joints as depth spheres into a (H, W) map.

    Each joint becomes a sphere of `radius_mm`; depth = nearest surface.
    """
    h, w = camera.height, camera.width
    dpt = np.full((h, w), np.inf, np.float32)
    pts3d = pose3d + com3d[None, :]
    uvd = np.asarray(camera.three_d_to_img(pts3d))
    cols = np.arange(w, dtype=np.float32)[None, :]
    rows = np.arange(h, dtype=np.float32)[:, None]
    for (u, v, d) in uvd:
        if d <= 0:
            continue
        r_px = radius_mm * camera.fx / d
        dist2 = (cols - u) ** 2 + (rows - v) ** 2
        mask = dist2 <= r_px**2
        # sphere surface: nearer toward the center
        bulge = radius_mm * np.sqrt(np.clip(1.0 - dist2 / max(r_px**2, 1e-6), 0, 1))
        cand = d - bulge.astype(np.float32)
        dpt = np.where(mask & (cand < dpt), cand, dpt)
    dpt[~np.isfinite(dpt)] = background
    return dpt


def make_frame(
    camera: Camera,
    rng: np.random.Generator,
    num_joints: int = 14,
    cube: Tuple[float, float, float] = (250.0, 250.0, 250.0),
    com_depth_range: Tuple[float, float] = (500.0, 900.0),
    dsize: Tuple[int, int] = (128, 128),
    docom: bool = False,
) -> DepthFrame:
    """One synthetic frame: render, crop, and annotate like an importer."""
    d = rng.uniform(*com_depth_range)
    margin = 90.0
    u = rng.uniform(margin, camera.width - margin)
    v = rng.uniform(margin, camera.height - margin)
    com = np.array([u, v, d], np.float32)
    com3d = np.asarray(camera.img_to_3d(com))
    pose3d = synthetic_hand_pose(rng, num_joints)

    dpt_full = render_depth(camera, com3d, pose3d)
    gt3d_orig = pose3d + com3d[None, :]
    gtorig = np.asarray(camera.three_d_to_img(gt3d_orig))

    hc = HandCropper(dpt_full, camera)
    crop, m, com_used = hc.crop_area_3d(
        com=gtorig[0], size=cube, dsize=dsize, docom=docom
    )
    com3d_used = np.asarray(camera.img_to_3d(com_used))
    gtcrop = np.asarray(transform_points_2d(gtorig, m))
    return DepthFrame(
        dpt=crop,
        gtorig=gtorig.astype(np.float32),
        gtcrop=gtcrop.astype(np.float32),
        T=m.astype(np.float32),
        gt3Dorig=gt3d_orig.astype(np.float32),
        gt3Dcrop=(gt3d_orig - com3d_used[None, :]).astype(np.float32),
        com=np.asarray(com_used, np.float32),
        fileName=f"synthetic_{num_joints}j",
        extraData={"dpt_full": dpt_full},
    )


def make_sequence(
    camera: Camera,
    num_frames: int,
    num_joints: int = 14,
    cube: Tuple[float, float, float] = (250.0, 250.0, 250.0),
    seed: int = 23455,
    name: str = "train",
    docom: bool = False,
    keep_full: bool = False,
) -> ImageSequence:
    """A synthetic ImageSequence shaped like an importer's output."""
    rng = np.random.default_rng(seed)
    frames = []
    for _ in range(num_frames):
        f = make_frame(camera, rng, num_joints, cube, docom=docom)
        if not keep_full:
            f = f._replace(extraData=None)
        frames.append(f)
    return ImageSequence(name=name, data=frames, config={"cube": cube})
