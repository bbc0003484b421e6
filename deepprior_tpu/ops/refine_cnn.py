"""CNN-based CoM refinement — the 'comref' detection mode.

Mirrors `HandDetector.refineCoM` (reference handdetector.py:634-676): the
crop around the current CoM is normalized to [-1, 1], the ScaleNet's three
scale inputs are built as center crops, and the predicted normalized 3D
offset (x cube_z/2) is added to the CoM in metric space.  Batched and
jittable; composes with ops.crop / ops.com for the full
detect -> refine -> crop chain used by the realtime pipeline and the
docom+refineNet import mode (handdetector.py:430-441).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from deepprior_tpu.camera import Camera
from deepprior_tpu.ops.crop import normalized_crop


class CNNComRefiner:
    """Wraps a trained ScaleNet (or any crop->offset model) as a batched
    CoM refiner."""

    def __init__(self, model, variables, camera: Camera, dsize=(128, 128)):
        self.model = model
        self.variables = variables
        self.camera = camera
        self.dsize = dsize

    def __call__(self, dpt, com, cube):
        """dpt: (B, H, W) clamped depth; com: (B, 3); cube: (3,)/(B, 3).
        Returns refined com (B, 3) in image coordinates."""
        cam = self.camera
        com = jnp.asarray(com, jnp.float32)
        cube_b = jnp.broadcast_to(jnp.asarray(cube, jnp.float32), com.shape)
        crops, _ = normalized_crop(
            dpt, com, cube_b, cam.fx, cam.fy, self.dsize
        )
        offset_norm = self.model.apply(
            self.variables, crops[..., None], train=False
        )  # (B, 3) normalized offsets
        offset_mm = offset_norm * (cube_b[:, 2:3] / 2.0)
        com3d = cam.img_to_3d(com)
        new_com3d = com3d + offset_mm
        new_com = cam.three_d_to_img(new_com3d)
        # degenerate-projection fallback (handdetector.py:521-523): keep the
        # old CoM when the refined one collapses to zero depth
        bad = jnp.all(jnp.isclose(new_com, 0.0), axis=-1, keepdims=True)
        return jnp.where(bad, com, new_com)
