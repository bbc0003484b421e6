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
from deepprior_tpu.geometry import transform_points_2d_np


def synthetic_hand(
    rng: np.random.Generator, num_joints: int = 14, spread_mm: float = 80.0
):
    """Kinematic synthetic hand with consistent topology.

    Joint 0 is the palm center (the crop joint); joint 1 the wrist; the
    remaining joints distribute over 5 finger chains fanned from the palm.
    Per-frame randomness: global in-plane orientation, small 3D tilt, and
    per-finger flexion angles — so the depth-image -> joint mapping is
    *learnable* (fingers are identifiable by their fan position), unlike
    i.i.d. random blobs.

    Returns (pose (J, 3) float32 CoM-centered mm,
             fill_pts (K, 3) extra render points (bones/palm),
             fill_radii (K,)).
    """
    n_fingers = 5
    palm_r = spread_mm * 0.45
    alpha = np.deg2rad(rng.uniform(-180.0, 180.0))  # in-plane orientation
    tilt_x, tilt_y = rng.uniform(-0.35, 0.35, 2)  # out-of-plane tilt

    # distribute joints: [palm, wrist, fingers...]
    n_chain = num_joints - 2
    per_finger = [n_chain // n_fingers] * n_fingers
    for i in range(n_chain - sum(per_finger)):
        per_finger[i] += 1

    def rot_inplane(p):
        c, s = np.cos(alpha), np.sin(alpha)
        return np.array([c * p[0] - s * p[1], s * p[0] + c * p[1], p[2]])

    def tilt(p):
        # small rotations about x then y
        cx, sx = np.cos(tilt_x), np.sin(tilt_x)
        y, z = p[1] * cx - p[2] * sx, p[1] * sx + p[2] * cx
        cy, sy = np.cos(tilt_y), np.sin(tilt_y)
        x, z = p[0] * cy + z * sy, -p[0] * sy + z * cy
        return np.array([x, y, z])

    joints = [np.zeros(3)]  # palm center
    fills = [(np.zeros(3), palm_r * 0.9)]
    wrist = tilt(rot_inplane(np.array([0.0, palm_r * 1.4, 0.0])))
    joints.append(wrist)
    fills.append((wrist * 0.6, palm_r * 0.6))

    fan = np.deg2rad(np.array([-55.0, -25.0, 0.0, 25.0, 55.0]))
    seg_len = spread_mm * 0.45
    for f in range(n_fingers):
        nj = per_finger[f]
        if nj == 0:
            continue
        # finger base direction in the palm plane (pointing "up" = -y)
        theta = fan[f]
        d_plane = np.array([np.sin(theta), -np.cos(theta), 0.0])
        flex = rng.uniform(0.0, np.deg2rad(75.0))  # per-finger flexion
        pos = d_plane * palm_r
        seg = seg_len * (0.8 if f in (0, 4) else 1.0) / max(nj, 1)
        bend = 0.0
        prev = tilt(rot_inplane(pos))
        for k in range(nj):
            bend += flex / max(nj, 1)
            step = d_plane * seg * np.cos(bend) + np.array([0, 0, seg * np.sin(bend)])
            pos = pos + step
            cur = tilt(rot_inplane(pos))
            joints.append(cur)
            # bone fill between prev and cur
            fills.append(((prev + cur) / 2.0, spread_mm * 0.12))
            prev = cur

    pose = np.stack(joints[:num_joints]).astype(np.float32)
    fill_pts = np.stack([p for p, _ in fills]).astype(np.float32)
    fill_radii = np.array([r for _, r in fills], np.float32)
    return pose, fill_pts, fill_radii


def synthetic_hand_pose(
    rng: np.random.Generator, num_joints: int = 14, spread_mm: float = 80.0
) -> np.ndarray:
    """CoM-centered pose of a random kinematic hand (labels only)."""
    return synthetic_hand(rng, num_joints, spread_mm)[0]


def render_depth(
    camera: Camera,
    com3d: np.ndarray,
    pose3d: np.ndarray,
    radius_mm=14.0,
    background: float = 0.0,
) -> np.ndarray:
    """Render points as depth spheres into a (H, W) map.

    radius_mm: scalar or per-point array; depth = nearest sphere surface.
    """
    h, w = camera.height, camera.width
    dpt = np.full((h, w), np.inf, np.float32)
    pts3d = np.asarray(pose3d) + com3d[None, :]
    radii = np.broadcast_to(np.asarray(radius_mm, np.float32), (len(pts3d),))
    uvd = camera.three_d_to_img_np(pts3d)
    for (u, v, d), r in zip(uvd, radii):
        if d <= 0:
            continue
        r_px = r * camera.fx / d
        # only touch the sphere's bounding window
        x0 = max(int(u - r_px) - 1, 0)
        x1 = min(int(u + r_px) + 2, w)
        y0 = max(int(v - r_px) - 1, 0)
        y1 = min(int(v + r_px) + 2, h)
        if x0 >= x1 or y0 >= y1:
            continue
        cols = np.arange(x0, x1, dtype=np.float32)[None, :]
        rows = np.arange(y0, y1, dtype=np.float32)[:, None]
        dist2 = (cols - u) ** 2 + (rows - v) ** 2
        mask = dist2 <= r_px**2
        # sphere surface: nearer toward the center
        bulge = r * np.sqrt(np.clip(1.0 - dist2 / max(r_px**2, 1e-6), 0, 1))
        cand = (d - bulge).astype(np.float32)
        win = dpt[y0:y1, x0:x1]
        dpt[y0:y1, x0:x1] = np.where(mask & (cand < win), cand, win)
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
    com3d = camera.img_to_3d_np(com)
    pose3d, fill_pts, fill_radii = synthetic_hand(rng, num_joints)

    all_pts = np.concatenate([pose3d, fill_pts], axis=0)
    all_radii = np.concatenate(
        [np.full(len(pose3d), 14.0, np.float32), fill_radii]
    )
    dpt_full = render_depth(camera, com3d, all_pts, all_radii)
    gt3d_orig = pose3d + com3d[None, :]
    gtorig = camera.three_d_to_img_np(gt3d_orig)

    hc = HandCropper(dpt_full, camera)
    crop, m, com_used = hc.crop_area_3d(
        com=gtorig[0], size=cube, dsize=dsize, docom=docom
    )
    com3d_used = camera.img_to_3d_np(com_used)
    gtcrop = transform_points_2d_np(gtorig, m)
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


# sequences at least this long cache to ~/.cache/deepprior_synth
# (covers the probe train sets AND their 1/8-sized val/test splits)
CACHE_MIN_FRAMES = 1024


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
    """A synthetic ImageSequence shaped like an importer's output.

    Large sequences (>= CACHE_MIN_FRAMES, without full-frame extraData) cache
    to ~/.cache/deepprior_synth keyed by every generation parameter —
    rendering 49k kinematic hands on the host takes ~25 min, loading the
    cache seconds (the same npz-cache pattern the importers use).
    """
    import os

    cache = None
    if num_frames >= CACHE_MIN_FRAMES and not keep_full and not os.environ.get(
        "DEEPPRIOR_NO_SYNTH_CACHE"
    ):
        key = (f"{camera.fx:.2f}_{camera.fy:.2f}_{camera.width}x{camera.height}"
               f"{'_flip' if camera.flip_y else ''}"
               f"_n{num_frames}_j{num_joints}_c{cube[0]:g}-{cube[1]:g}-"
               f"{cube[2]:g}_s{seed}_d{int(docom)}")
        cache = os.path.expanduser(f"~/.cache/deepprior_synth/{key}.npz")
        if os.path.isfile(cache):
            # materialize each array ONCE: NpzFile re-decompresses the whole
            # member on every __getitem__, so indexing z[k][i] in the loop
            # would be O(n^2) in both time and allocator churn
            with np.load(cache) as z:
                a = {k: z[k] for k in z.files}
            frames = [
                DepthFrame(
                    dpt=a["dpt"][i], gtorig=a["gtorig"][i],
                    gtcrop=a["gtcrop"][i], T=a["T"][i],
                    gt3Dorig=a["gt3Dorig"][i], gt3Dcrop=a["gt3Dcrop"][i],
                    com=a["com"][i], fileName=f"synth/{name}/{i}",
                    subSeqName="", side="right", extraData=None,
                )
                for i in range(a["dpt"].shape[0])
            ]
            return ImageSequence(name=name, data=frames, config={"cube": cube})

    rng = np.random.default_rng(seed)
    frames = []
    for _ in range(num_frames):
        f = make_frame(camera, rng, num_joints, cube, docom=docom)
        if not keep_full:
            f = f._replace(extraData=None)
        frames.append(f)

    if cache:
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        # write-then-rename: a concurrent or interrupted run must never
        # leave a truncated npz for a later np.load to crash on
        tmp = f"{cache}.tmp.{os.getpid()}"
        np.savez_compressed(
            tmp,
            dpt=np.stack([f.dpt for f in frames]),
            gtorig=np.stack([f.gtorig for f in frames]),
            gtcrop=np.stack([f.gtcrop for f in frames]),
            T=np.stack([f.T for f in frames]),
            gt3Dorig=np.stack([f.gt3Dorig for f in frames]),
            gt3Dcrop=np.stack([f.gt3Dcrop for f in frames]),
            com=np.stack([f.com for f in frames]),
        )
        # savez appends .npz when missing; the tmp name has no .npz suffix
        os.replace(f"{tmp}.npz", cache)
    return ImageSequence(name=name, data=frames, config={"cube": cube})
