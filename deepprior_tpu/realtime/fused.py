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
        resize: Optional[str] = None,
    ):
        self.model = model
        self.camera = camera
        self.cube = jnp.asarray(cube, jnp.float32)
        self.prior = prior
        self.num_joints = num_joints
        self.dsize = dsize
        self.refine_iters = refine_iters
        self.detect = detect
        # the reference ctor's resize-method switch (handdetector.py:57-69)
        # for nets trained on non-default resampling: None/'nearest' keeps
        # the default; 'linear'/'nd_bilinear' force the XLA crop (the
        # Pallas kernel implements nearest + its own two-tap bilinear;
        # the ND-aware blend is not separable — see ops/crop.py)
        if resize not in (None, "nearest", "linear", "nd_bilinear"):
            raise ValueError(f"unknown resize method {resize!r}")
        self.resize = resize
        if resize in ("linear", "nd_bilinear") and crop_method in (
            "auto", "pallas"
        ):
            crop_method = "onehot"
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
        self._fn_cfg = jax.jit(
            self._pipeline_cfg, static_argnames=("invx", "invy")
        )

    # ------------------------------------------------------------------
    def _pipeline(self, variables, depth, com):
        """depth: (B, H, W) raw mm; com: (B, 3) image coords (ignored when
        self.detect).  Returns (joints3d_mm (B, J, 3), com3d, crops).

        Fixed-config entry (constructor cube, no mirroring) — the shape
        ShardedEstimator partitions.  The realtime pipeline calls
        _pipeline_cfg, which takes the live per-frame config."""
        b = depth.shape[0]
        return self._pipeline_cfg(
            variables, depth, com,
            jnp.broadcast_to(self.cube, (b, 3)),
            jnp.zeros((b,), jnp.bool_),
        )

    def _pipeline_cfg(
        self, variables, depth, com, cube, mirror, invx=False, invy=False
    ):
        """Full pipeline with the runtime knobs traced: cube (B, 3) mm —
        the LIVE config cube, so INIT hand-size calibration and +/- cube
        resizing reach both the crop and the denormalization scale
        (the reference re-reads sync['config']['cube'] every frame,
        realtimehandposepipeline.py:330-336, 199) — and mirror (B,) bool:
        the reference mirrors RIGHT-hand CROPS (the nets' canonical
        orientation is a left hand) and flips the x of the RELATIVE pose
        back after regression (:346-351, 366-369); the com3d /
        denormalization always use the unmirrored detection.  Static
        invx/invy flip the relative pose's y/x respectively — the
        reference's swapped-index quirk (invX flips jj[:, 1], invY flips
        jj[:, 0], :353-363) reproduced as-is."""
        cam = self.camera
        if self.crop_method == "pallas" and not self.detect \
                and not self.refine_iters:
            # the kernel applies the clamp to the crop window itself —
            # no full-frame clean pass through HBM (bit-identical)
            from deepprior_tpu.ops.pallas_crop import pallas_normalized_crop

            crops, _ = pallas_normalized_crop(
                depth, com, cube, cam.fx, cam.fy, self.dsize,
                fuse_clamp=True, win_rows=self.win_rows,
            )
        else:
            depth, dmin, dmax = clamp_depth(depth)
            if self.detect:
                com = detect_closest(depth, cube, cam.fx, cam.fy,
                                     min_depth=dmin, max_depth=dmax)
            elif self.refine_iters:
                com = refine_com_iterative(
                    depth, com, cube, cam.fx, cam.fy, self.refine_iters,
                    min_depth=dmin, max_depth=dmax,
                )
            if self.crop_method == "pallas":
                from deepprior_tpu.ops.pallas_crop import (
                    pallas_normalized_crop,
                )

                crops, _ = pallas_normalized_crop(
                    depth, com, cube, cam.fx, cam.fy, self.dsize,
                    win_rows=self.win_rows,
                )
            else:
                crops, _ = normalized_crop(
                    depth, com, cube, cam.fx, cam.fy, self.dsize,
                    method=self.crop_method, resize=self.resize,
                )
        net_in = jnp.where(mirror[:, None, None], crops[:, :, ::-1], crops)
        out = self.model.apply(variables, net_in[..., None], train=False)
        if self.prior is not None:
            out = (
                jnp.matmul(out, self.prior.components,
                           precision=jax.lax.Precision.HIGHEST)
                + self.prior.mean
            )
        pose = out.reshape(out.shape[0], -1, 3)
        # relative-pose sign flips, exactly the reference's order/indices
        flip = jnp.ones((pose.shape[0], 3), jnp.float32)
        if invx:  # reference invX flips index 1 (realtimehandpose:355-358)
            flip = flip * jnp.array([1.0, -1.0, 1.0], jnp.float32)
        if invy:  # reference invY flips index 0 (:360-363)
            flip = flip * jnp.array([-1.0, 1.0, 1.0], jnp.float32)
        # un-mirror the x of mirrored (right-hand) poses (:366-369)
        flip = flip.at[:, 0].mul(jnp.where(mirror, -1.0, 1.0))
        pose = pose * flip[:, None, :]
        com3d = cam.img_to_3d(com)
        joints = pose * (cube[:, 2] / 2.0)[:, None, None] + com3d[:, None, :]
        return joints, com3d, crops

    def __call__(
        self, variables, depth, com=None, cube=None, mirror=None,
        invx=False, invy=False,
    ):
        b = depth.shape[0]
        if com is None:
            com = jnp.zeros((b, 3), jnp.float32)
        if cube is None and mirror is None and not invx and not invy:
            return self._fn(variables, depth, com)
        cb = self.cube if cube is None else jnp.asarray(cube, jnp.float32)
        cb = jnp.broadcast_to(cb, (b, 3))
        mr = (
            jnp.zeros((b,), jnp.bool_)
            if mirror is None
            else jnp.broadcast_to(jnp.asarray(mirror, jnp.bool_), (b,))
        )
        return self._fn_cfg(
            variables, depth, com, cb, mr, invx=invx, invy=invy
        )

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
