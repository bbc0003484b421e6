"""PoseRegNet: the DeepPose-style CNN regressor.

Reference: src/net/poseregnet.py:44-165.
type 0:  C(8,5x5)P4 -> C(8,5x5)P2 -> C(8,3x3) -> FC1024 -> drop ->
         FC1024 -> drop -> FC(numJoints*nDims)            (128x128 input:
         124->31, 27->13, 11 -> flatten 8*11*11 = 968)
type 11: same trunk with a 30-D linear bottleneck before the final linear
         decode.

Inputs are NHWC (B, H, W, C); the flagship embedding config
(main_nyu_posereg_embedding.py:96-99) is PoseRegNetConfig(out_dim=30).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import flax.linen as nn
import jax.numpy as jnp

from deepprior_tpu.models.layers import ConvPool, MLPHead


class PoseRegNetConfig(NamedTuple):
    num_joints: int = 14
    n_dims: int = 3
    embedding: Optional[int] = None  # type 11's 30-D bottleneck
    hidden: int = 1024
    dropout: bool = True
    # FC nonlinearity; a 2-arg callable (layers.prelu) enables the
    # reference's learned-parameter activation (hiddenlayer.py:40-169)
    activation: Any = nn.relu
    dtype: Any = jnp.float32
    # fuse each conv+maxpool into one MXU-lane-packed strided conv (same
    # parameters/arithmetic, ~10x conv throughput — layers._PackedConvPool)
    packed_conv: bool = False

    @property
    def out_dim(self) -> int:
        return self.num_joints * self.n_dims


class PoseRegNet(nn.Module):
    cfg: PoseRegNetConfig = PoseRegNetConfig()

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, H, W, 1) normalized depth crop. Returns (B, out_dim)."""
        dt = self.cfg.dtype
        x = x.astype(dt)
        pk = self.cfg.packed_conv
        x = ConvPool(8, (5, 5), (4, 4), dtype=dt, packed=pk)(x)
        x = ConvPool(8, (5, 5), (2, 2), dtype=dt, packed=pk)(x)
        x = ConvPool(8, (3, 3), (1, 1), dtype=dt, packed=pk)(x)
        out = MLPHead(
            self.cfg.out_dim,
            hidden=self.cfg.hidden,
            dropout=self.cfg.dropout,
            embedding=self.cfg.embedding,
            activation=self.cfg.activation,
            dtype=dt,
        )(x, deterministic=not train)
        return out.astype(jnp.float32)
