"""2D/3D point transforms, batched and jit-compatible.

Replaces the per-point Python loops of reference
src/data/transformations.py:34-167 with vectorized jnp programs.  All
functions accept arbitrary leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def inv3x3(m):
    """Closed-form inverse of (..., 3, 3) matrices via the adjugate.

    jnp.linalg.inv lowers to a looping LU factorization that is slow for
    large batches of tiny matrices on TPU; the adjugate is a handful of
    fused multiplies.
    """
    m = jnp.asarray(m)
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    co_a = e * i - f * h
    co_b = -(d * i - f * g)
    co_c = d * h - e * g
    det = a * co_a + b * co_b + c * co_c
    inv_det = 1.0 / det
    adj = jnp.stack(
        [
            jnp.stack([co_a, -(b * i - c * h), b * f - c * e], axis=-1),
            jnp.stack([co_b, a * i - c * g, -(a * f - c * d)], axis=-1),
            jnp.stack([co_c, -(a * h - b * g), a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


def transform_points_2d(pts, m):
    """Apply a 3x3 homogeneous transform to (..., 2+) points.

    Only the first two coordinates are transformed; any trailing
    coordinates (e.g. depth) are passed through unchanged.
    Mirrors reference transformations.py:47-68.
    """
    pts = jnp.asarray(pts)
    m = jnp.asarray(m)
    xy1 = jnp.concatenate(
        [pts[..., :2], jnp.ones(pts.shape[:-1] + (1,), pts.dtype)], axis=-1
    )
    # HIGHEST: coordinate transforms must not round through 1-pass bf16
    out = jnp.einsum("ij,...j->...i", m, xy1, precision=jax.lax.Precision.HIGHEST)
    xy = out[..., :2] / out[..., 2:3]
    if pts.shape[-1] > 2:
        return jnp.concatenate([xy, pts[..., 2:]], axis=-1)
    return xy


def transform_points_2d_np(pts, m):
    """Numpy twin of transform_points_2d for host-side paths (importers,
    synthetic fixtures) — avoids per-op accelerator round trips."""
    import numpy as np

    pts = np.asarray(pts, np.float32)
    m = np.asarray(m, np.float32)
    xy1 = np.concatenate(
        [pts[..., :2], np.ones(pts.shape[:-1] + (1,), np.float32)], axis=-1
    )
    out = xy1 @ m.T
    xy = out[..., :2] / out[..., 2:3]
    if pts.shape[-1] > 2:
        return np.concatenate([xy, pts[..., 2:]], axis=-1)
    return xy


def rotate_points_2d_np(pts, center, angle_deg):
    """Numpy twin of rotate_points_2d."""
    import numpy as np

    pts = np.asarray(pts, np.float64)
    center = np.asarray(center, np.float64)
    a = np.deg2rad(np.asarray(angle_deg, np.float64))
    c, s = np.cos(a), np.sin(a)
    dx = pts[..., 0] - center[..., 0]
    dy = pts[..., 1] - center[..., 1]
    x = dx * c - dy * s + center[..., 0]
    y = dx * s + dy * c + center[..., 1]
    out = np.stack([x, y], axis=-1)
    if pts.shape[-1] > 2:
        return np.concatenate([out, pts[..., 2:]], axis=-1)
    return out


def rotation_matrix_2d(center, angle_deg):
    """3x3 homogeneous matrix rotating by `angle_deg` about `center`.

    Positive angles follow the reference convention
    (transformations.py:71-89): x' = x cos - y sin, y' = x sin + y cos,
    i.e. clockwise on screen for y-down image coordinates.
    """
    a = jnp.deg2rad(jnp.asarray(angle_deg, jnp.float32))
    c, s = jnp.cos(a), jnp.sin(a)
    cx, cy = jnp.asarray(center)[..., 0], jnp.asarray(center)[..., 1]
    one = jnp.ones_like(c)
    zero = jnp.zeros_like(c)
    # T(center) @ R @ T(-center)
    return jnp.stack(
        [
            jnp.stack([c, -s, cx - c * cx + s * cy], axis=-1),
            jnp.stack([s, c, cy - s * cx - c * cy], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )


def rotate_points_2d(pts, center, angle_deg):
    """Rotate (..., 2+) points about a 2D center; depth passthrough.

    Mirrors reference transformations.py:71-102.
    """
    pts = jnp.asarray(pts)
    center = jnp.asarray(center)
    a = jnp.deg2rad(jnp.asarray(angle_deg, jnp.float32))
    c, s = jnp.cos(a), jnp.sin(a)
    dx = pts[..., 0] - center[..., 0]
    dy = pts[..., 1] - center[..., 1]
    x = dx * c - dy * s + center[..., 0]
    y = dx * s + dy * c + center[..., 1]
    out = jnp.stack([x, y], axis=-1)
    if pts.shape[-1] > 2:
        return jnp.concatenate([out, pts[..., 2:]], axis=-1)
    return out


def euler_rotation_matrix(angle_x_deg, angle_y_deg, angle_z_deg):
    """3x3 rotation from extrinsic-xyz Euler angles in degrees.

    Equivalent to transforms3d.euler.euler2mat(ax, ay, az, 'rxyz') used by
    the reference (transformations.py:105-120): R = Rx @ Ry @ Rz applied
    as intrinsic rotations, i.e. R = Rx(ax) Ry(ay) Rz(az).
    """
    ax = jnp.deg2rad(jnp.asarray(angle_x_deg, jnp.float32))
    ay = jnp.deg2rad(jnp.asarray(angle_y_deg, jnp.float32))
    az = jnp.deg2rad(jnp.asarray(angle_z_deg, jnp.float32))
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    rx = jnp.stack(
        [
            jnp.stack([jnp.ones_like(cx), jnp.zeros_like(cx), jnp.zeros_like(cx)], -1),
            jnp.stack([jnp.zeros_like(cx), cx, -sx], -1),
            jnp.stack([jnp.zeros_like(cx), sx, cx], -1),
        ],
        -2,
    )
    ry = jnp.stack(
        [
            jnp.stack([cy, jnp.zeros_like(cy), sy], -1),
            jnp.stack([jnp.zeros_like(cy), jnp.ones_like(cy), jnp.zeros_like(cy)], -1),
            jnp.stack([-sy, jnp.zeros_like(cy), cy], -1),
        ],
        -2,
    )
    rz = jnp.stack(
        [
            jnp.stack([cz, -sz, jnp.zeros_like(cz)], -1),
            jnp.stack([sz, cz, jnp.zeros_like(cz)], -1),
            jnp.stack([jnp.zeros_like(cz), jnp.zeros_like(cz), jnp.ones_like(cz)], -1),
        ],
        -2,
    )
    # 3x3 composition feeds coordinate transforms: keep it out of 1-pass
    # bf16 (repo invariant: transform matmuls run at HIGHEST).
    return jnp.matmul(
        rx,
        jnp.matmul(ry, rz, precision=jax.lax.Precision.HIGHEST),
        precision=jax.lax.Precision.HIGHEST,
    )


def rotate_points_3d(pts, center, angle_x_deg, angle_y_deg, angle_z_deg):
    """Rotate (..., 3) points about a 3D center by Euler angles in degrees.

    Mirrors reference transformations.py:123-155.
    """
    pts = jnp.asarray(pts)
    center = jnp.asarray(center)
    r = euler_rotation_matrix(angle_x_deg, angle_y_deg, angle_z_deg)
    return (
        jnp.einsum(
            "...ij,...j->...i", r, pts - center,
            precision=jax.lax.Precision.HIGHEST,
        )
        + center
    )


def rotate_points_3d_np(pts, center, angle_x_deg, angle_y_deg, angle_z_deg):
    """Numpy twin of rotate_points_3d for host-side paths (the one-off
    pose-prior fit) — avoids per-op accelerator round trips."""
    import numpy as np

    pts = np.asarray(pts, np.float64)
    center = np.asarray(center, np.float64)
    ax, ay, az = np.broadcast_arrays(
        np.deg2rad(np.asarray(angle_x_deg, np.float64)),
        np.deg2rad(np.asarray(angle_y_deg, np.float64)),
        np.deg2rad(np.asarray(angle_z_deg, np.float64)),
    )
    cx, sx = np.cos(ax), np.sin(ax)
    cy, sy = np.cos(ay), np.sin(ay)
    cz, sz = np.cos(az), np.sin(az)
    one, zero = np.ones_like(cx), np.zeros_like(cx)
    rx = np.stack(
        [np.stack([one, zero, zero], -1),
         np.stack([zero, cx, -sx], -1),
         np.stack([zero, sx, cx], -1)], -2)
    ry = np.stack(
        [np.stack([cy, zero, sy], -1),
         np.stack([zero, one, zero], -1),
         np.stack([-sy, zero, cy], -1)], -2)
    rz = np.stack(
        [np.stack([cz, -sz, zero], -1),
         np.stack([sz, cz, zero], -1),
         np.stack([zero, zero, one], -1)], -2)
    r = rx @ ry @ rz
    return np.einsum("...ij,...j->...i", r, pts - center) + center


def transform_points_3d(pts, m):
    """Apply a 4x4 homogeneous transform to (..., 3) points.

    Mirrors reference transformations.py:158-166.
    """
    pts = jnp.asarray(pts)
    m = jnp.asarray(m)
    xyz1 = jnp.concatenate(
        [pts, jnp.ones(pts.shape[:-1] + (1,), pts.dtype)], axis=-1
    )
    out = jnp.einsum(
        "ij,...j->...i", m, xyz1, precision=jax.lax.Precision.HIGHEST
    )
    return out[..., :3] / out[..., 3:4]


def affine_2d(center=(0.0, 0.0), rot_rad=0.0, trans=(0.0, 0.0), scale=1.0):
    """Build the 2x3 affine used by the reference's tracking overlay
    (transformations.py:34-44), returned as a flat 6-vector
    [a, b, tx, c, d, ty].
    """
    ca = jnp.cos(jnp.asarray(rot_rad, jnp.float32))
    sa = jnp.sin(jnp.asarray(rot_rad, jnp.float32))
    sc = jnp.asarray(scale, jnp.float32)
    cx, cy = center
    tx, ty = trans
    return jnp.stack(
        [
            ca * sc,
            -sa * sc,
            sc * (ca * (-tx - cx) + sa * (cy + ty)) + cx,
            sa * sc,
            ca * sc,
            sc * (ca * (-ty - cy) + sa * (-tx - cx)) + cy,
        ]
    )
