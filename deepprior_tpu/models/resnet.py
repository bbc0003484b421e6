"""Pre-activation bottleneck ResNet-47 regressor.

Reference: src/net/resnet.py:45-414 (after He et al.'s preact ResNet).
Structure for all types: 5x5 stem conv ('same', no activation) + 2x2
maxpool, then 4 stages of (47-2)/9 = 5 bottleneck blocks with widths
[64, 128, 256, 256] (stem width 32).  Stages 1-3 downsample by stride 2 in
their projection block; stage 4's first block sees 256==256 channels and
takes the reference's identity path, which ignores the stride — so there is
no 4th downsample (a quirk of resnet.py:353-358 that we reproduce because
the head's flatten size depends on it: 8*8*256 = 16384 for 128x128 inputs).
Final BN+ReLU, then FC1024 -> FC1024 -> out.

Head types (resnet.py:119-...):
  0: plain            1: 30-D linear bottleneck before the decode
  2/3: dropout between the FC layers      4: dropout + 30-D bottleneck
mapped here to (dropout: bool, embedding: Optional[int]).

Bottleneck block (resnet.py:349-414): BN-ReLU-1x1(c/4) / BN-ReLU-3x3(c/4) /
BN-ReLU-1x1(c), identity or 1x1-projection shortcut taken after the first
BN-ReLU (preact "common BN" form).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from deepprior_tpu.models.layers import DROPOUT_RATE, he_init, xavier_init

# Theano's BN default_update running-average semantics (reference
# batchnormlayer.py:160-177) keep exponential averages with a fixed rate;
# flax momentum 0.9 matches the common setting.
BN_MOMENTUM = 0.9


class ResNetConfig(NamedTuple):
    num_joints: int = 14
    n_dims: int = 3
    depth: int = 47
    stages: Sequence[int] = (32, 64, 128, 256, 256)
    dropout: bool = False  # reference types 2/3/4
    embedding: Optional[int] = None  # reference types 1/4 use 30
    hidden: int = 1024
    dtype: Any = jnp.float32
    # stem conv+pool as one MXU lane-packed strided conv (4*32 = 128 output
    # lanes instead of 32; same parameters — layers._PackedConvPool)
    packed_conv: bool = False

    @property
    def out_dim(self) -> int:
        return self.num_joints * self.n_dims

    @property
    def blocks_per_stage(self) -> int:
        assert (self.depth - 2) % 9 == 0, "depth must be 9n+2"
        return (self.depth - 2) // 9

    @classmethod
    def from_reference_type(cls, type: int, num_joints: int = 14, n_dims: int = 3):
        """Map the reference's integer head types 0-4."""
        return cls(
            num_joints=num_joints,
            n_dims=n_dims,
            dropout=type in (2, 3, 4),
            embedding=30 if type in (1, 4) else None,
        )


class _Bottleneck(nn.Module):
    """Pre-activation bottleneck with optional projection shortcut."""

    features: int
    stride: int
    dtype: Any

    @nn.compact
    def __call__(self, x, train: bool):
        inner = self.features // 4
        bn = lambda: nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, dtype=self.dtype
        )
        conv = lambda f, k, s=1: nn.Conv(
            f, (k, k), strides=(s, s), padding="SAME", use_bias=True,
            kernel_init=he_init, dtype=self.dtype,
        )
        identity_path = x.shape[-1] == self.features
        if identity_path:
            # NOTE: the reference ignores the stride on this path
            h = nn.relu(bn()(x))
            h = conv(inner, 1)(h)
            h = nn.relu(bn()(h))
            h = conv(inner, 3)(h)
            h = nn.relu(bn()(h))
            h = conv(self.features, 1)(h)
            return x + h
        # "common BN, ReLU" shared by residual and shortcut
        pre = nn.relu(bn()(x))
        h = conv(inner, 1, self.stride)(pre)
        h = nn.relu(bn()(h))
        h = conv(inner, 3)(h)
        h = nn.relu(bn()(h))
        h = conv(self.features, 1)(h)
        shortcut = conv(self.features, 1, self.stride)(pre)
        return shortcut + h


class ResNet(nn.Module):
    cfg: ResNetConfig = ResNetConfig()

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, H, W, 1) normalized depth crop. Returns (B, out_dim)."""
        cfg = self.cfg
        dt = cfg.dtype
        x = x.astype(dt)
        if cfg.packed_conv:
            # SAME padding applied explicitly, then the fused VALID-conv +
            # pool phase packing (identical outputs; layers._PackedConvPool)
            from deepprior_tpu.models.layers import _PackedConvPool

            x = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
            x = _PackedConvPool(
                cfg.stages[0], (5, 5), (2, 2), dtype=dt, name="Conv_0"
            )(x)
        else:
            x = nn.Conv(
                cfg.stages[0], (5, 5), padding="SAME", kernel_init=he_init,
                dtype=dt,
            )(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2), padding="VALID")
        for width in cfg.stages[1:]:
            x = _Bottleneck(width, stride=2, dtype=dt)(x, train)
            for _ in range(cfg.blocks_per_stage - 1):
                x = _Bottleneck(width, stride=1, dtype=dt)(x, train)
        x = nn.relu(
            nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM, dtype=dt)(x)
        )
        x = x.reshape((x.shape[0], -1))
        x = nn.relu(nn.Dense(cfg.hidden, kernel_init=he_init, dtype=dt)(x))
        if cfg.dropout:
            x = nn.Dropout(DROPOUT_RATE, deterministic=not train)(x)
        x = nn.relu(nn.Dense(cfg.hidden, kernel_init=he_init, dtype=dt)(x))
        if cfg.dropout:
            x = nn.Dropout(DROPOUT_RATE, deterministic=not train)(x)
        if cfg.embedding is not None:
            x = nn.Dense(cfg.embedding, kernel_init=xavier_init, dtype=dt)(x)
        x = nn.Dense(cfg.out_dim, kernel_init=xavier_init, dtype=dt)(x)
        return x.astype(jnp.float32)
