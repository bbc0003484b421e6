"""Mesh-sharded bulk serving: the fused frame->joints program over N chips.

The reference serves batches from a single GPU (`NetBase.computeOutput`,
reference netbase.py:280-320, chunked through a fixed-size Theano function)
and frames from a consumer process (realtimehandposepipeline.py:133-219).
The TPU-native scale-out for offline/bulk inference is GSPMD: shard the
frame batch over the mesh's data axes, tensor-shard the wide FC layers
over 'tp' (same Megatron specs as training, parallel/mesh.py), and jit the
UNCHANGED FusedEstimator pipeline with those shardings — XLA inserts the
collectives; every chip runs the crop kernel + regressor on its shard.

Throughput scales linearly in dp (the pipeline has no cross-sample
dependencies); 'tp' additionally splits the FC weights for models whose
head dominates HBM (ResNet's 16384x1024 FC1).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
from jax.sharding import Mesh

from deepprior_tpu.parallel.mesh import (
    batch_sharding,
    param_shardings,
    replicated,
    tree_shardings_like,
)
from deepprior_tpu.realtime.fused import FusedEstimator


class ShardedEstimator:
    """FusedEstimator scaled over a device mesh.

    variables are placed once (tp-sharded Dense stacks, everything else
    replicated); per-call frame batches are sharded over the dcn/dp axes.
    The batch must divide the data-axis size (pad to a multiple — the
    pipeline is pure, so padded rows are discarded by the caller).

    Two compilation modes:
    - pure data-parallel mesh (tp == 1): `shard_map` runs the unchanged
      pipeline — including the Pallas crop kernel — per device on its
      shard, zero collectives;
    - tp > 1: GSPMD partitions the whole program (FC weights sharded
      Megatron-style); since GSPMD cannot partition `pallas_call`, the
      crop switches to the XLA one-hot path (bit-identical output,
      ~1.3x slower crop).
    """

    def __init__(
        self,
        est: FusedEstimator,
        mesh: Mesh,
        variables: Any,
        tp_params: bool = True,
    ):
        self.est = est
        self.mesh = mesh
        self._bsh3 = batch_sharding(mesh, 3)  # (B, H, W) depth
        self._bsh2 = batch_sharding(mesh, 2)  # (B, 3) com
        tp = tp_params and "tp" in mesh.axis_names and mesh.shape["tp"] > 1
        if tp:
            vsh = param_shardings(variables, mesh)
        else:
            vsh = tree_shardings_like(variables, replicated(mesh))
        self.variables = jax.device_put(variables, vsh)

        pipeline = est._pipeline
        if tp:
            # GSPMD partitions the whole program, but it has no
            # partitioning rule for pallas_call — use the XLA one-hot crop
            # (every op partitionable) when the FC weights are tp-sharded
            if est.crop_method == "pallas":
                import copy

                est2 = copy.copy(est)
                est2.crop_method = "onehot"
                pipeline = est2._pipeline
            self._fn = jax.jit(
                pipeline,
                in_shardings=(vsh, self._bsh3, self._bsh2),
                # (joints (B,J,3), com3d (B,3), crops (B,dh,dw))
                out_shardings=(self._bsh3, self._bsh2, self._bsh3),
            )
        else:
            # pure data-parallel: shard_map runs the UNCHANGED pipeline
            # (incl. the Pallas crop kernel) independently per device on
            # its batch shard — no collectives at all
            try:
                from jax import shard_map  # jax >= 0.8
            except ImportError:  # pragma: no cover
                from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P

            from deepprior_tpu.parallel.mesh import batch_axes

            bspec = P(batch_axes(mesh))
            self._fn = jax.jit(
                shard_map(
                    pipeline,
                    mesh=mesh,
                    in_specs=(P(), bspec, bspec),
                    out_specs=(bspec, bspec, bspec),
                    # pallas_call's out ShapeDtypeStruct carries no vma
                    check_vma=False,
                )
            )

    def place_batch(self, depth, com) -> Tuple[Any, Any]:
        """Shard a host/replicated batch over the mesh's data axes."""
        return (
            jax.device_put(depth, self._bsh3),
            jax.device_put(com, self._bsh2),
        )

    def __call__(self, depth, com=None):
        """depth: (B, H, W) raw mm; com: (B, 3). Returns (joints3d_mm,
        com3d, crops) sharded over the data axes."""
        if com is None:
            import jax.numpy as jnp

            if not getattr(self.est, "detect", False):
                # a zeros CoM would crop empty space at the image origin
                # and return plausible-looking garbage joints; only a
                # detecting pipeline can recover the hand from the frame
                raise ValueError(
                    "com is required unless the wrapped FusedEstimator "
                    "was built with detect=True"
                )
            com = jnp.zeros((depth.shape[0], 3), jnp.float32)
        depth, com = self.place_batch(depth, com)
        return self._fn(self.variables, depth, com)
