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
        if tp_params and "tp" in mesh.axis_names and mesh.shape["tp"] > 1:
            vsh = param_shardings(variables, mesh)
        else:
            vsh = tree_shardings_like(variables, replicated(mesh))
        self.variables = jax.device_put(variables, vsh)
        self._fn = jax.jit(
            est._pipeline,
            in_shardings=(vsh, self._bsh3, self._bsh2),
            # (joints (B,J,3), com3d (B,3), crops (B,dh,dw))
            out_shardings=(self._bsh3, self._bsh2, self._bsh3),
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

            com = jnp.zeros((depth.shape[0], 3), jnp.float32)
        depth, com = self.place_batch(depth, com)
        return self._fn(self.variables, depth, com)
