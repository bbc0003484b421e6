"""The fused inference program: depth frame -> 3D joints, one XLA program.

The reference splits this across two processes (producer: detect+crop,
consumer: CNN+denormalize — reference
src/util/realtimehandposepipeline.py:133-219) because host preprocessing
was slow.  On TPU the whole chain is one jitted program over a batch:

  clamp -> (optional CoM detect / iterative refine) -> fused cube crop +
  normalize (ops/crop) -> regressor -> (optional PCA decode) ->
  denormalize (x * cube_z/2 + com3D)

The denormalization mirrors the consumer thread
(realtimehandposepipeline.py:199-205) and the test-time decode of the main
scripts (main_nyu_posereg_embedding.py:171-175).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from deepprior_tpu.camera import Camera
from deepprior_tpu.ops.com import detect_closest, refine_com_iterative
from deepprior_tpu.ops.crop import clamp_depth, normalized_crop
from deepprior_tpu.prior import PCAPrior


class FusedEstimator:
    """Compiles the full frame->pose pipeline once; applies it per batch.

    model_apply(variables, crops_bhw1) -> (B, out) embeddings or poses.
    """

    def __init__(
        self,
        model,
        camera: Camera,
        cube=(250.0, 250.0, 250.0),
        prior: Optional[PCAPrior] = None,
        num_joints: Optional[int] = None,
        dsize=(128, 128),
        refine_iters: int = 0,
        detect: bool = False,
        crop_method: str = "auto",
        min_depth_mm: Optional[float] = None,
    ):
        self.model = model
        self.camera = camera
        self.cube = jnp.asarray(cube, jnp.float32)
        self.prior = prior
        self.num_joints = num_joints
        self.dsize = dsize
        self.refine_iters = refine_iters
        self.detect = detect
        # 'onehot' expresses the crop as MXU matmuls — ~100x faster than
        # XLA's gather lowering on TPU for batched frames; 'pallas' is the
        # banded-window kernel (bit-identical, ~1.3x faster again on TPU —
        # the default there); 'gather' is the reference-exact fallback
        if crop_method == "auto":
            crop_method = (
                "pallas" if jax.default_backend() == "tpu" else "onehot"
            )
        self.crop_method = crop_method
        # optional deployment z-envelope: hands never closer than this ->
        # the Pallas crop can use a narrower banded window (speed only;
        # closer samples fall back to the full-frame branch)
        self.win_rows = None
        if min_depth_mm is not None:
            from deepprior_tpu.ops.pallas_crop import band_rows_for

            self.win_rows = band_rows_for(
                camera.fy, float(cube[2]), min_depth_mm
            )
        self._fn = jax.jit(self._pipeline)

    # ------------------------------------------------------------------
    def _pipeline(self, variables, depth, com):
        """depth: (B, H, W) raw mm; com: (B, 3) image coords (ignored when
        self.detect).  Returns (joints3d_mm (B, J, 3), com3d, crops)."""
        cam = self.camera
        if self.crop_method == "pallas" and not self.detect \
                and not self.refine_iters:
            # the kernel applies the clamp to the crop window itself —
            # no full-frame clean pass through HBM (bit-identical)
            from deepprior_tpu.ops.pallas_crop import pallas_normalized_crop

            crops, _ = pallas_normalized_crop(
                depth, com, self.cube, cam.fx, cam.fy, self.dsize,
                fuse_clamp=True, win_rows=self.win_rows,
            )
        else:
            depth, _, _ = clamp_depth(depth)
            if self.detect:
                com = detect_closest(depth, self.cube, cam.fx, cam.fy)
            elif self.refine_iters:
                com = refine_com_iterative(
                    depth, com, self.cube, cam.fx, cam.fy, self.refine_iters
                )
            if self.crop_method == "pallas":
                from deepprior_tpu.ops.pallas_crop import (
                    pallas_normalized_crop,
                )

                crops, _ = pallas_normalized_crop(
                    depth, com, self.cube, cam.fx, cam.fy, self.dsize,
                    win_rows=self.win_rows,
                )
            else:
                crops, _ = normalized_crop(
                    depth, com, self.cube, cam.fx, cam.fy, self.dsize,
                    method=self.crop_method,
                )
        out = self.model.apply(variables, crops[..., None], train=False)
        if self.prior is not None:
            out = (
                jnp.matmul(out, self.prior.components,
                           precision=jax.lax.Precision.HIGHEST)
                + self.prior.mean
            )
        pose = out.reshape(out.shape[0], -1, 3)
        com3d = cam.img_to_3d(com)
        joints = pose * (self.cube[2] / 2.0) + com3d[:, None, :]
        return joints, com3d, crops

    def __call__(self, variables, depth, com=None):
        if com is None:
            b = depth.shape[0]
            com = jnp.zeros((b, 3), jnp.float32)
        return self._fn(variables, depth, com)

    # ------------------------------------------------------------------
    def aot_compile(self, variables, batch: int, hw: Tuple[int, int]):
        """Ahead-of-time compile for a fixed batch/frame shape; returns the
        compiled executable (useful for latency-critical batch-1 serving)."""
        depth = jax.ShapeDtypeStruct((batch,) + hw, jnp.float32)
        com = jax.ShapeDtypeStruct((batch, 3), jnp.float32)
        var_shapes = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), variables
        )
        return self._fn.lower(var_shapes, depth, com).compile()
