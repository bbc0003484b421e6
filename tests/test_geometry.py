"""Geometry transform tests (reference transformations.py parity)."""

import numpy as np
import pytest

from deepprior_tpu.geometry import (
    euler_rotation_matrix,
    rotate_points_2d,
    rotate_points_3d,
    rotation_matrix_2d,
    transform_points_2d,
    transform_points_3d,
)


def _np_rotate_point_2d(p, center, angle_deg):
    """Literal reference rotatePoint2D (transformations.py:71-89)."""
    a = np.deg2rad(angle_deg)
    pp = np.asarray(p, np.float64).copy()
    pp[:2] -= center[:2]
    out = pp.copy()
    out[0] = pp[0] * np.cos(a) - pp[1] * np.sin(a)
    out[1] = pp[0] * np.sin(a) + pp[1] * np.cos(a)
    out[:2] += center[:2]
    return out


def test_rotate_points_2d_matches_reference(rng):
    pts = rng.uniform(0, 300, (10, 3)).astype(np.float32)
    center = np.array([160.0, 120.0])
    for ang in [0.0, 30.0, -117.5, 180.0]:
        ours = np.asarray(rotate_points_2d(pts, center, ang))
        ref = np.stack([_np_rotate_point_2d(p, center, ang) for p in pts])
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_rotation_matrix_2d_consistent():
    pts = np.array([[10.0, 20.0], [100.0, 50.0]])
    center = np.array([30.0, 40.0])
    m = np.asarray(rotation_matrix_2d(center, 42.0))
    via_matrix = np.asarray(transform_points_2d(pts, m))
    direct = np.asarray(rotate_points_2d(pts, center, 42.0))
    np.testing.assert_allclose(via_matrix, direct, rtol=1e-5, atol=1e-4)


def test_transform_points_2d_depth_passthrough():
    m = np.array([[2.0, 0, 5.0], [0, 2.0, -3.0], [0, 0, 1.0]])
    pts = np.array([[1.0, 2.0, 700.0]])
    out = np.asarray(transform_points_2d(pts, m))
    np.testing.assert_allclose(out, [[7.0, 1.0, 700.0]])


def test_transform_points_3d():
    m = np.eye(4)
    m[:3, 3] = [1.0, 2.0, 3.0]
    out = np.asarray(transform_points_3d(np.array([[0.0, 0.0, 0.0]]), m))
    np.testing.assert_allclose(out, [[1.0, 2.0, 3.0]])


def test_euler_rotation_matrix_axes():
    # rotation about z by 90deg: x -> y
    r = np.asarray(euler_rotation_matrix(0.0, 0.0, 90.0))
    np.testing.assert_allclose(r @ np.array([1.0, 0, 0]), [0, 1.0, 0], atol=1e-6)
    # rotation about x by 90deg: y -> z
    r = np.asarray(euler_rotation_matrix(90.0, 0.0, 0.0))
    np.testing.assert_allclose(r @ np.array([0, 1.0, 0]), [0, 0, 1.0], atol=1e-6)
    # composition order rxyz: R = Rx @ Ry @ Rz
    rx = np.asarray(euler_rotation_matrix(10.0, 0, 0))
    ry = np.asarray(euler_rotation_matrix(0, 20.0, 0))
    rz = np.asarray(euler_rotation_matrix(0, 0, 30.0))
    r = np.asarray(euler_rotation_matrix(10.0, 20.0, 30.0))
    np.testing.assert_allclose(r, rx @ ry @ rz, atol=1e-6)


def _quat_from_axis_angle(axis, angle_rad):
    axis = np.asarray(axis, np.float64)
    half = angle_rad / 2.0
    return np.concatenate([[np.cos(half)], np.sin(half) * axis])


def _quat_mul(a, b):
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return np.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])


def _quat_rotate(q, p):
    """Sandwich p' = q (0,p) q* — no rotation matrix involved."""
    pq = np.concatenate([[0.0], np.asarray(p, np.float64)])
    qc = q * np.array([1.0, -1.0, -1.0, -1.0])
    return _quat_mul(_quat_mul(q, pq), qc)[1:]


def test_euler_rotation_matrix_matches_quaternion_oracle(rng):
    """Independent oracle for the 'rxyz' convention (transformations.py:118
    euler2mat(ax, ay, az, 'rxyz'); transforms3d is not in this image).

    Intrinsic-xyz rotation composed as unit quaternions qx*qy*qz and
    applied by the sandwich product — a computational path sharing no
    code or algebra with the matrix build (and with the prior sweep's
    scalar Rx@Ry@Rz twin, which could otherwise share a misreading)."""
    for _ in range(20):
        ax, ay, az = rng.uniform(-np.pi, np.pi, 3)
        q = _quat_mul(
            _quat_mul(
                _quat_from_axis_angle([1, 0, 0], ax),
                _quat_from_axis_angle([0, 1, 0], ay),
            ),
            _quat_from_axis_angle([0, 0, 1], az),
        )
        r = np.asarray(
            euler_rotation_matrix(np.rad2deg(ax), np.rad2deg(ay), np.rad2deg(az))
        )
        p = rng.uniform(-100, 100, 3)
        np.testing.assert_allclose(r @ p, _quat_rotate(q, p), atol=5e-4)


def test_rotate_points_3d_roundtrip(rng):
    pts = rng.uniform(-100, 100, (5, 3)).astype(np.float32)
    center = np.array([10.0, -5.0, 600.0], np.float32)
    fwd = np.asarray(rotate_points_3d(pts, center, 15.0, -30.0, 45.0))
    # inverse: transpose rotation = rotate by inverse angles in reverse order
    r = np.asarray(euler_rotation_matrix(15.0, -30.0, 45.0))
    back = (fwd - center) @ r + center  # (R^T x) via x @ R
    np.testing.assert_allclose(back, pts, rtol=1e-4, atol=1e-3)
    # center is a fixed point
    c = np.asarray(rotate_points_3d(center[None], center, 15.0, -30.0, 45.0))
    np.testing.assert_allclose(c[0], center, atol=1e-4)


def test_rotate_points_3d_np_matches_jnp(rng):
    """The numpy twin (host-side prior fit) must match the jnp path,
    including the batched-angle broadcasting shape the prior uses."""
    from deepprior_tpu.geometry import rotate_points_3d_np

    pts = rng.uniform(-125, 125, (7, 5, 3)).astype(np.float32)
    center = rng.uniform(-50, 50, (7, 1, 3)).astype(np.float32)
    ang = rng.uniform(-180, 180, (7, 3)).astype(np.float32)
    got = rotate_points_3d_np(
        pts, center, ang[:, 0:1], ang[:, 1:2], ang[:, 2:3]
    )
    want = np.asarray(
        rotate_points_3d(
            pts, center, ang[:, 0:1], ang[:, 1:2], ang[:, 2:3]
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=5e-3)
