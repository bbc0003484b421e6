"""Shared layer building blocks and weight initializers.

Matches the reference layer library semantics (src/net/):
- conv layers use 'valid' padding (Theano conv2d default, convlayer.py)
- ConvPoolLayer adds the bias *after* max-pooling (convpoollayer.py) — for a
  per-channel bias this is identical to bias-then-maxpool, so we use the
  standard conv(use_bias=True) -> pool -> activation order
- pooling floors odd sizes (Theano pool_2d ignore_border=True)
- He/Xavier initialization (layer.py:35-124)
- dropout keeps p_drop = 0.3 (dropoutlayer.py:39-138); at inference the
  reference multiplies activations by p_keep instead of masking — standard
  inverted dropout is mathematically equivalent in expectation and is what
  flax implements

Layout is NHWC (TPU-native); the reference's NCHW tensors are transposed at
the data boundary.
"""

from __future__ import annotations

import inspect
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# reference dropoutlayer.py default p = 0.3 (drop probability)
DROPOUT_RATE = 0.3


def prelu(x, c):
    """Parametric ReLU — the canonical 2-arg activation for the learned-
    parameter mechanism (reference hiddenlayer.py:146-151 creates a
    trainable per-unit `c` whenever the activation takes two args)."""
    return jnp.where(x >= 0, x, c * x)


def takes_learned_param(fn: Optional[Callable]) -> bool:
    """True when `fn(x, c)` expects a trainable parameter tensor — the
    reference's `len(inspect.getargspec(activation).args) == 2` dispatch
    (hiddenlayer.py:145, nonlinearitylayer.py:112).

    Deliberate narrowing vs the reference: only REQUIRED positional args
    count.  The reference counts defaulted args too, so a 2-arg activation
    with a default (e.g. `leaky_relu(x, negative_slope=0.01)`) would grow
    a trainable per-unit `c` there; here it is applied plainly.  Counting
    defaults would misfire on most jax.nn activations (gelu's
    `approximate=True`, etc.); pass a genuinely 2-required-arg callable
    (like `prelu`) to opt into the learned parameter."""
    if fn is None:
        return False
    try:
        params = [
            p
            for p in inspect.signature(fn).parameters.values()
            if p.default is inspect.Parameter.empty
            and p.kind
            in (
                inspect.Parameter.POSITIONAL_ONLY,
                inspect.Parameter.POSITIONAL_OR_KEYWORD,
            )
        ]
    except (TypeError, ValueError):
        return False
    return len(params) == 2

he_init = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
xavier_init = nn.initializers.variance_scaling(1.0, "fan_avg", "uniform")
# the reference's SVD-orthogonalized init option (layer.py:~90)
orthogonal_init = nn.initializers.orthogonal()


def max_pool(x, window: Tuple[int, int]):
    """Max pool with VALID padding (floors odd extents, like Theano
    pool_2d(ignore_border=True))."""
    if window == (1, 1):
        return x
    return nn.max_pool(x, window_shape=window, strides=window, padding="VALID")


def pool2d(x, window: Tuple[int, int], kind: str = "max"):
    """Standalone pooling with the reference PoolLayer's type set
    (poollayer.py:39-157): 'max', 'avg', 'subsample' (strided pick),
    'none'."""
    if kind == "none" or window == (1, 1):
        return x
    if kind == "max":
        return nn.max_pool(x, window_shape=window, strides=window, padding="VALID")
    if kind == "avg":
        return nn.avg_pool(x, window_shape=window, strides=window, padding="VALID")
    if kind == "subsample":
        return x[:, :: window[0], :: window[1], :]
    raise ValueError(f"unknown pool kind {kind!r}")


def packed_pool_kernel(kernel, pool: Tuple[int, int]):
    """Embed a (kh, kw, C, F) stride-1 conv kernel into the phase-packed
    (ph+kh-1, pw+kw-1, C, ph*pw*F) kernel of the fused conv+maxpool (see
    _PackedConvPool).  Output channel (p*pw+q)*F+f holds K shifted to the
    pool phase (p, q); taps outside the 5x5 support are exact zeros."""
    kh, kw, _, _ = kernel.shape
    ph, pw = pool
    groups = [
        jnp.pad(kernel, ((p, ph - 1 - p), (q, pw - 1 - q), (0, 0), (0, 0)))
        for p in range(ph)
        for q in range(pw)
    ]
    return jnp.concatenate(groups, axis=-1)


class _PackedConvPool(nn.Module):
    """conv(kh x kw, stride 1, VALID) + maxpool(ph x pw) fused as ONE
    strided conv that fills the MXU's output lanes.

    The reference's conv stacks keep 8 feature maps (convpoollayer.py),
    which uses 8 of the MXU's 128 output lanes (~6%).  But the maxpool
    windows tile the conv output into ph x pw phases, so

      y[i,j,f] = max_{p,q} sum_{a,b,c} x[ph*i+p+a, pw*j+q+b, c] K[a,b,c,f]
               = max_{p,q} z[i,j,(p,q,f)]

      z = conv(x, K2; stride (ph, pw), VALID),
      K2[u,v,c,(p,q,f)] = K[u-p, v-q, c, f]   (zero outside the support)

    — one strided conv with ph*pw*F output channels (128 lanes for the
    8-map pool-4 layer) followed by a cheap max over the phase groups.
    Identical parameters and arithmetic; only the contraction gains taps
    that multiply exact zeros, so results match the plain path to f.p.
    summation order.  ~2x fewer useful FLOPs/s are spent on padding taps,
    repaid ~16x over in lane utilization.

    Parameter names/shapes/inits equal nn.Conv's ("kernel", "bias"), so a
    checkpoint trained either way loads in the other."""

    features: int
    kernel: Tuple[int, int]
    pool: Tuple[int, int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        ph, pw = self.pool
        f = self.features
        kernel = self.param(
            "kernel", he_init, (kh, kw, x.shape[-1], f), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (f,), jnp.float32)
        k2 = packed_pool_kernel(kernel, (ph, pw)).astype(self.dtype)
        z = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            k2,
            window_strides=(ph, pw),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        z = z + jnp.tile(bias.astype(self.dtype), ph * pw)
        b, oh, ow, _ = z.shape
        return z.reshape(b, oh, ow, ph * pw, f).max(axis=3)


class ConvPool(nn.Module):
    """conv(valid) -> maxpool -> ReLU: reference ConvPoolLayer
    (convpoollayer.py:39-305).

    packed=True computes the same layer via the phase-packed strided conv
    (_PackedConvPool) — same parameter tree, ~10x faster on the MXU for
    the reference's 8-map layers; falls back to the plain path when the
    geometry doesn't apply (stride != 1, no pooling, SAME padding)."""

    features: int
    kernel: Tuple[int, int]
    pool: Tuple[int, int]
    activation: Optional[Callable] = nn.relu
    padding: str = "VALID"
    stride: Tuple[int, int] = (1, 1)
    dtype: Any = jnp.float32
    packed: bool = False

    @nn.compact
    def __call__(self, x):
        if (
            self.packed
            and self.padding == "VALID"
            and self.stride == (1, 1)
            and min(self.pool) > 1
        ):
            x = _PackedConvPool(
                self.features,
                self.kernel,
                self.pool,
                dtype=self.dtype,
                name="Conv_0",
            )(x)
        else:
            x = nn.Conv(
                self.features,
                self.kernel,
                strides=self.stride,
                padding=self.padding,
                kernel_init=he_init,
                dtype=self.dtype,
            )(x)
            x = max_pool(x, self.pool)
        if self.activation is not None:
            x = self.activation(x)
        return x


class MLPHead(nn.Module):
    """FC(1024)-drop-FC(1024)-drop-FC(out) regression head, the shared tail
    of PoseRegNet/ScaleNet (poseregnet.py:100-143, scalenet.py:49-132).

    `embedding` inserts the reference's 30-D linear bottleneck before the
    final linear decode (poseregnet.py type 11, resnet.py types 1/4).  The
    flagship embedding training instead sets out_dim=30 directly and appends
    the fixed PCA decode post-training (main_nyu_posereg_embedding.py:148-158,
    see prior.PCAPrior.decode)."""

    out_dim: int
    hidden: int = 1024
    dropout: bool = True
    embedding: Optional[int] = None
    # hidden-layer nonlinearity.  A 2-arg callable (e.g. `prelu`) triggers
    # the reference's learned-parameter activation (hiddenlayer.py:40-169):
    # each hidden layer gets a trainable per-unit `c`, initialized to 0.5,
    # and computes activation(Wx + b, c).  The default (1-arg relu) keeps
    # the parameter tree unchanged.
    activation: Optional[Callable] = nn.relu
    dtype: Any = jnp.float32

    def _activate(self, x, idx: int):
        if self.activation is None:
            return x
        if takes_learned_param(self.activation):
            # per-unit trainable c, ones*0.5 init (hiddenlayer.py:146-148)
            c = self.param(
                f"c{idx}", nn.initializers.constant(0.5), (x.shape[-1],)
            )
            return self.activation(x, c)
        return self.activation(x)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = x.reshape((x.shape[0], -1))
        x = self._activate(
            nn.Dense(self.hidden, kernel_init=he_init, dtype=self.dtype)(x), 0
        )
        if self.dropout:
            x = nn.Dropout(DROPOUT_RATE, deterministic=deterministic)(x)
        x = self._activate(
            nn.Dense(self.hidden, kernel_init=he_init, dtype=self.dtype)(x), 1
        )
        if self.dropout:
            x = nn.Dropout(DROPOUT_RATE, deterministic=deterministic)(x)
        if self.embedding is not None:
            x = nn.Dense(self.embedding, kernel_init=xavier_init, dtype=self.dtype)(x)
        x = nn.Dense(self.out_dim, kernel_init=xavier_init, dtype=self.dtype)(x)
        return x
