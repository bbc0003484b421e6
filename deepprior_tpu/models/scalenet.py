"""ScaleNet: the 3-scale CoM refinement CNN.

Reference: src/net/scalenet.py:33-195 (only type==1 exists).  Three conv
towers over the full crop and its /2 and /4 *center crops* (not resizes —
see handdetector.py:657-669), concatenated into the FC1024-drop-FC1024-
drop-FC(3) head.  Optional weight sharing across the scale towers
(scalenet.py:179-180) via a shared flax submodule.

Tower shapes for 128x128 input (all conv 'valid'):
  s0: conv5 P4 -> 31, conv5 P2 -> 13, conv3 P1 -> 11   => 8*11*11 = 968
  s1 (64):  conv5 P2 -> 30, conv5 P2 -> 13, conv3 -> 11 ... reference uses
      pools (2,2,1): 60->30, 26->13, 11 => 968
  s2 (32):  conv5 P2 -> 14, conv5 P1 -> 10, conv3 -> 8  => 8*8*8 = 512
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

import jax

from deepprior_tpu.models.layers import (
    ConvPool,
    MLPHead,
    he_init,
    max_pool,
    packed_pool_kernel,
)


class ScaleNetConfig(NamedTuple):
    num_joints: int = 1
    n_dims: int = 3
    resize_factor: int = 2
    shared_conv: bool = False
    packed_conv: bool = False  # MXU lane-packed ConvPool (layers._PackedConvPool)
    hidden: int = 1024
    dropout: bool = True
    dtype: Any = jnp.float32

    @property
    def out_dim(self) -> int:
        return self.num_joints * self.n_dims


# per-scale pooling schedules (scalenet.py:53-104): scale 0 uses (4,2,1),
# scale 1 uses (2,2,1), scale 2 uses (2,1,1); kernels (5,5,3) everywhere
_POOLS = ((4, 2, 1), (2, 2, 1), (2, 1, 1))
_KERNELS = (5, 5, 3)


class _Tower(nn.Module):
    pools: Tuple[int, int, int]
    dtype: Any
    packed: bool = False

    @nn.compact
    def __call__(self, x):
        for k, p in zip(_KERNELS, self.pools):
            x = ConvPool(
                8, (k, k), (p, p), dtype=self.dtype, packed=self.packed
            )(x)
        return x.reshape((x.shape[0], -1))


class _SharedScaleConv(nn.Module):
    """One shared conv layer whose call-site supplies the pool geometry.

    The pool size is a call argument (not a module field) because the
    SAME kernel/bias serve every scale tower while each tower pools
    differently — and the MXU lane-packed formulation bakes the pool
    phases into the contraction (layers._PackedConvPool math), so packing
    must happen per call, from the one shared parameter set.  Parameter
    names/shapes/inits equal nn.Conv's, keeping checkpoints
    interchangeable with the previous nn.Conv-based sharing."""

    features: int
    kernel: Tuple[int, int]
    dtype: Any

    @nn.compact
    def __call__(self, x, pool: Tuple[int, int], packed: bool):
        kh, kw = self.kernel
        kernel = self.param(
            "kernel", he_init, (kh, kw, x.shape[-1], self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        if packed and min(pool) > 1:
            ph, pw = pool
            k2 = packed_pool_kernel(kernel, pool).astype(self.dtype)
            z = jax.lax.conv_general_dilated(
                x.astype(self.dtype), k2, window_strides=pool,
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            z = z + jnp.tile(bias.astype(self.dtype), ph * pw)
            b, oh, ow, _ = z.shape
            return z.reshape(b, oh, ow, ph * pw, self.features).max(axis=3)
        z = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        z = z + bias.astype(self.dtype)
        return max_pool(z, pool)


class _SharedConvTowers(nn.Module):
    """Scale towers sharing conv *kernels* with per-scale pooling.

    This is exactly the reference's copyLayer semantics: with shared_conv
    the towers' layers copy only W and b from tower 0
    (scalenet.py:179-180 -> convpoollayer.py:236-248) while each layer
    keeps its own cfgParams pooling — so the per-scale pooling schedules
    (_POOLS) apply unchanged under sharing.  packed=True computes each
    (shared kernel, per-scale pool) pair via the MXU lane-packed strided
    conv; pool-1 layers take the plain path (packing needs a pool)."""

    dtype: Any
    packed: bool = False

    @nn.compact
    def __call__(self, xs):
        convs = [
            _SharedScaleConv(8, (k, k), dtype=self.dtype,
                             name=f"shared_conv_{i}")
            for i, k in enumerate(_KERNELS)
        ]
        feats = []
        for scale, x in enumerate(xs):
            h = x.astype(self.dtype)
            for conv, p in zip(convs, _POOLS[scale]):
                h = conv(h, (p, p), self.packed)
                h = nn.relu(h)
            feats.append(h.reshape((h.shape[0], -1)))
        return feats


def multiscale_center_crops(x, resize_factor: int = 2):
    """Build the /2 and /4 center crops of (B, H, W, C) inputs.

    Mirrors handdetector.py:657-669 / scalenettrainer.py:239-251: the
    smaller scales are *center crops* of the normalized patch (zooms, not
    downsamples).
    """
    b, h, w, c = x.shape
    outs = [x]
    for lvl in (1, 2):
        f = resize_factor**lvl
        dh, dw = h // f, w // f
        ys = h // 2 - dh // 2
        xs = w // 2 - dw // 2
        outs.append(x[:, ys : ys + dh, xs : xs + dw, :])
    return outs


class ScaleNet(nn.Module):
    cfg: ScaleNetConfig = ScaleNetConfig()

    @nn.compact
    def __call__(self, xs, train: bool = False):
        """xs: list of 3 NHWC inputs [full, /2 crop, /4 crop] or a single
        NHWC tensor (center crops derived internally).  Returns (B, 3)."""
        if not isinstance(xs, (list, tuple)):
            xs = multiscale_center_crops(xs, self.cfg.resize_factor)
        assert len(xs) == 3, "ScaleNet type 1 takes 3 scale inputs"
        dt = self.cfg.dtype
        if self.cfg.shared_conv:
            feats = _SharedConvTowers(dt, self.cfg.packed_conv)(xs)
        else:
            feats = [
                _Tower(_POOLS[i], dt, self.cfg.packed_conv)(x.astype(dt))
                for i, x in enumerate(xs)
            ]
        x = jnp.concatenate(feats, axis=1)
        out = MLPHead(
            self.cfg.out_dim, hidden=self.cfg.hidden, dropout=self.cfg.dropout, dtype=dt
        )(x, deterministic=not train)
        return out.astype(jnp.float32)
