"""Pinhole camera models for depth-image hand datasets.

TPU-native replacement for the per-point Python loops of the reference
(`DepthImporter.jointImgTo3D` / `joint3DToImg`, reference
src/data/importers.py:69-119, and the MSRA inverted-Y variant at
importers.py:756-793).  All projections here are batched, dtype-stable
jnp programs usable inside `jit` / `vmap` / Pallas-adjacent code, and
equally runnable with plain numpy arrays.

Conventions
-----------
Image coordinates are (u, v, d): u = column (x), v = row (y), d = depth in mm.
World coordinates are (x, y, z) in mm, camera-centered.

`flip_y=True` encodes cameras whose projection inverts the vertical
axis:  v = uy - y/z*fy.  That is MSRA15 (importers.py:781-793) AND NYU
(importers.py:1187-1224 flip y in both jointImgTo3D and joint3DToImg —
the joint_data.mat 3D labels are y-up).  Only ICVL keeps v = y/z*fy+uy.
Note the reference NYUImporter inherits the base getCameraIntrinsics
(+fy, importers.py:135-146) despite its flipped projection; our
`intrinsics()` is self-consistent (-fy when flip_y) — deviation documented.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Camera(NamedTuple):
    """Intrinsics of a depth camera (focal lengths + principal point)."""

    fx: float
    fy: float
    ux: float
    uy: float
    flip_y: bool = False
    # native sensor resolution (width, height), used by detectors/croppers
    width: int = 320
    height: int = 240

    # ------------------------------------------------------------------
    # projections — accept (..., 3) arrays, return (..., 3) arrays
    # ------------------------------------------------------------------
    def img_to_3d(self, uvd):
        """Back-project image coords (u, v, d) -> metric 3D (x, y, z) in mm.

        Mirrors reference importers.py:80-91 (and 756-767 for flip_y).
        """
        uvd = jnp.asarray(uvd)
        u, v, d = uvd[..., 0], uvd[..., 1], uvd[..., 2]
        x = (u - self.ux) * d / self.fx
        if self.flip_y:
            y = (self.uy - v) * d / self.fy
        else:
            y = (v - self.uy) * d / self.fy
        return jnp.stack([x, y, d], axis=-1)

    def to_3d(self, uvd):  # alias
        return self.img_to_3d(uvd)

    def three_d_to_img(self, xyz):
        """Project metric 3D (x, y, z) -> image coords (u, v, d).

        Points at z == 0 map to the principal point (u, v) = (ux, uy) with
        d = 0, matching the reference's explicit zero-guard
        (importers.py:104-119).
        """
        xyz = jnp.asarray(xyz)
        x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
        safe_z = jnp.where(z == 0.0, 1.0, z)
        u = x / safe_z * self.fx + self.ux
        if self.flip_y:
            v = self.uy - y / safe_z * self.fy
        else:
            v = y / safe_z * self.fy + self.uy
        u = jnp.where(z == 0.0, self.ux, u)
        v = jnp.where(z == 0.0, self.uy, v)
        return jnp.stack([u, v, z], axis=-1)

    def to_img(self, xyz):  # alias
        return self.three_d_to_img(xyz)

    # ------------------------------------------------------------------
    # numpy twins — for host-side code paths (importers, synthetic data,
    # realtime overlays).  Eager jnp ops dispatch to the accelerator, which
    # is a per-op round trip on remote-device setups; these stay on host.
    # ------------------------------------------------------------------
    def img_to_3d_np(self, uvd):
        import numpy as np

        uvd = np.asarray(uvd, np.float32)
        u, v, d = uvd[..., 0], uvd[..., 1], uvd[..., 2]
        x = (u - self.ux) * d / self.fx
        if self.flip_y:
            y = (self.uy - v) * d / self.fy
        else:
            y = (v - self.uy) * d / self.fy
        return np.stack([x, y, d], axis=-1)

    def three_d_to_img_np(self, xyz):
        import numpy as np

        xyz = np.asarray(xyz, np.float32)
        x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
        safe_z = np.where(z == 0.0, 1.0, z)
        u = x / safe_z * self.fx + self.ux
        if self.flip_y:
            v = self.uy - y / safe_z * self.fy
        else:
            v = y / safe_z * self.fy + self.uy
        u = np.where(z == 0.0, self.ux, u)
        v = np.where(z == 0.0, self.uy, v)
        return np.stack([u, v, z], axis=-1)

    # ------------------------------------------------------------------
    # matrices
    # ------------------------------------------------------------------
    def intrinsics(self):
        """3x3 intrinsic matrix K (reference importers.py:136-146)."""
        sy = -self.fy if self.flip_y else self.fy
        return jnp.array(
            [[self.fx, 0.0, self.ux], [0.0, sy, self.uy], [0.0, 0.0, 1.0]],
            dtype=jnp.float32,
        )

    def projection(self):
        """4x4 homogeneous projection matrix (reference importers.py:121-134)."""
        sy = -self.fy if self.flip_y else self.fy
        return jnp.array(
            [
                [self.fx, 0.0, self.ux, 0.0],
                [0.0, sy, self.uy, 0.0],
                [0.0, 0.0, 1.0, 0.0],
                [0.0, 0.0, 1.0, 0.0],
            ],
            dtype=jnp.float32,
        )

    # ------------------------------------------------------------------
    def depth_to_pcl(self, dpt, crop_transform=None, background_val=0.0):
        """Convert a depth map (H, W) to an (N, 3) metric point cloud.

        If `crop_transform` (a 3x3 crop matrix M, see ops.crop) is given, the
        depth map is interpreted as a normalized crop and pixel coordinates
        are first mapped back to the full frame via M^-1
        (reference importers.py:156-173).  Host-side (numpy) utility.
        """
        import numpy as np

        dpt = np.asarray(dpt)
        vs, us = np.where(~np.isclose(dpt, background_val))
        d = dpt[vs, us].astype(np.float32)
        pts = np.stack([us + 0.5, vs + 0.5, np.ones_like(d)], axis=1)
        if crop_transform is not None:
            m_inv = np.linalg.inv(np.asarray(crop_transform))
            pts = pts @ m_inv.T
            pts = pts[:, :2] / pts[:, 2:3]
        else:
            pts = pts[:, :2]
        uvd = np.column_stack([pts, d])
        # host twin, not img_to_3d: an eager jnp op here is a per-call
        # device round trip on remote-device (axon-tunnel) setups
        return self.img_to_3d_np(uvd)


# Dataset camera presets (reference importers.py:199, 553, 891).
ICVL_CAMERA = Camera(fx=241.42, fy=241.42, ux=160.0, uy=120.0, width=320, height=240)
MSRA15_CAMERA = Camera(
    fx=241.42, fy=241.42, ux=160.0, uy=120.0, flip_y=True, width=320, height=240
)
NYU_CAMERA = Camera(
    fx=588.03, fy=587.07, ux=320.0, uy=240.0, flip_y=True, width=640, height=480
)

CAMERAS = {"icvl": ICVL_CAMERA, "msra15": MSRA15_CAMERA, "nyu": NYU_CAMERA}
