"""Depth-aware resize ops.

`resize_bilinear_nd` ports the reference's hand-written ND-aware bilinear
resize (handdetector.py:132-202): invalid (no-depth) pixels are excluded
from the interpolation, weights renormalize over the valid taps, and a
pixel whose 2x2 neighborhood has >=3 invalid taps becomes invalid.  The
reference runs per-pixel Python loops; this is a batched vectorized
formulation usable under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_nearest(img, out_hw):
    """cv2.INTER_NEAREST semantics: src = floor(dst * scale)."""
    img = jnp.asarray(img)
    h, w = img.shape[-2:]
    oh, ow = out_hw
    rows = jnp.minimum(
        jnp.floor(jnp.arange(oh) * (h / oh)).astype(jnp.int32), h - 1
    )
    cols = jnp.minimum(
        jnp.floor(jnp.arange(ow) * (w / ow)).astype(jnp.int32), w - 1
    )
    return img[..., rows[:, None], cols[None, :]]


def resize_bilinear_nd(img, out_hw, nd_value=0.0):
    """ND-aware bilinear resize of (..., H, W) depth images.

    Valid taps are those != nd_value; their bilinear weights renormalize.
    >= 3 invalid taps out of 4 -> output ND (handdetector.py:168-198).
    """
    img = jnp.asarray(img, jnp.float32)
    h, w = img.shape[-2:]
    oh, ow = out_hw

    # align-corners=False linear mapping like cv2.INTER_LINEAR
    ys = (jnp.arange(oh, dtype=jnp.float32) + 0.5) * (h / oh) - 0.5
    xs = (jnp.arange(ow, dtype=jnp.float32) + 0.5) * (w / ow) - 0.5
    y0 = jnp.clip(jnp.floor(ys), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs), 0, w - 1)
    fy = jnp.clip(ys - y0, 0.0, 1.0)[:, None]
    fx = jnp.clip(xs - x0, 0.0, 1.0)[None, :]
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)

    def tap(yi, xi):
        return img[..., yi[:, None], xi[None, :]]

    v00, v01 = tap(y0, x0), tap(y0, x1)
    v10, v11 = tap(y1, x0), tap(y1, x1)
    return nd_blend(v00, v01, v10, v11, fy, fx, nd_value)


def nd_blend(v00, v01, v10, v11, fy, fx, nd_value=0.0):
    """The ND-aware 4-tap blend (handdetector.py:168-198): weights of
    invalid (== nd_value) taps renormalize over the valid ones; >= 3
    invalid taps -> nd_value.  fy/fx broadcast against the taps.

    Shared by `resize_bilinear_nd` and the fused nd_bilinear crop path
    (ops/crop.py), which applies the same blend to z-thresholded taps in
    crop-patch space."""
    w00 = (1 - fy) * (1 - fx)
    w01 = (1 - fy) * fx
    w10 = fy * (1 - fx)
    w11 = fy * fx

    m00 = v00 != nd_value
    m01 = v01 != nd_value
    m10 = v10 != nd_value
    m11 = v11 != nd_value

    wsum = (
        w00 * m00 + w01 * m01 + w10 * m10 + w11 * m11
    )
    vsum = (
        w00 * jnp.where(m00, v00, 0.0)
        + w01 * jnp.where(m01, v01, 0.0)
        + w10 * jnp.where(m10, v10, 0.0)
        + w11 * jnp.where(m11, v11, 0.0)
    )
    n_invalid = (
        (~m00).astype(jnp.int32) + (~m01).astype(jnp.int32)
        + (~m10).astype(jnp.int32) + (~m11).astype(jnp.int32)
    )
    out = jnp.where(
        (n_invalid >= 3) | (wsum <= 0.0), nd_value, vsum / jnp.maximum(wsum, 1e-12)
    )
    return out
