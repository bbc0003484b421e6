"""Randomized differential sweep: pose-prior sampling vs a per-pose twin.

`prior.py::sample_random_poses` vectorizes the reference's 1e6-iteration
Python loop (`HandDetector.sampleRandomPoses`, handdetector.py:805-909).
Its unit tests pin each mode against hand derivations; this sweep pins the
WHOLE semantics — mode dispatch, the combined-mode quirks (rotation about
the NEW CoM's projection with re-centering about the OLD com3D; 3-op combos
scaling the pose but not the cube), the ['none'] no-resampling fast path,
and 2D/3D rotation — against an independent PER-POSE scalar twin
transcribed from the reference loop:

  - scalar camera projections from importers.py:80-119 (ICVL) and
    756-793 (NYU/MSRA flip-y), including the z==0 -> principal-point case
  - scalar rotatePoint2D from data/transformations.py:71-88
  - scalar rotatePoint3D via R = Rx @ Ry @ Rz applied about the center
    (transformations.py:105-139; euler2mat(ax, ay, az, 'rxyz'))
  - the reference's per-mode branches verbatim (shift / rotate / scale /
    combined), normalizing inside the branch by new_cube_z/2

Both sides consume the SAME pre-drawn (modes, ridx, off, sc, rot) arrays,
so any disagreement is a semantic divergence, not an RNG-stream artifact
(the streams themselves differ by design: Generator vs RandomState).
Tolerance is relative 1e-5: the twin follows the reference's float32
arithmetic while the repo computes in float64 and rounds once at the end
(a documented precision improvement), so bit-equality is not the contract
here — agreement to f32 round-off is.

Run on CPU: python prof_prior_sweep.py [n_scenes]
"""

import sys

import numpy as np

from deepprior_tpu.camera import ICVL_CAMERA, MSRA15_CAMERA, NYU_CAMERA
from deepprior_tpu.prior import ALL_SAMPLE_MODES, sample_random_poses

N_SCENES = int(sys.argv[1]) if len(sys.argv) > 1 else 24
P = 64  # poses per scene


# ---------------------------------------------------------------------------
# scalar reference twin (float32, per pose, reference op order)
# ---------------------------------------------------------------------------
def joint_img_to_3d(cam, s):
    """importers.py:80-91 (ICVL) / :756-766 (flip-y)."""
    s = np.asarray(s, np.float32)
    ret = np.zeros(3, np.float32)
    ret[0] = (s[0] - cam.ux) * s[2] / cam.fx
    if cam.flip_y:
        ret[1] = (cam.uy - s[1]) * s[2] / cam.fy
    else:
        ret[1] = (s[1] - cam.uy) * s[2] / cam.fy
    ret[2] = s[2]
    return ret


def joint_3d_to_img(cam, s):
    """importers.py:104-119 / :779-793 incl. the z==0 special case."""
    s = np.asarray(s, np.float32)
    ret = np.zeros(3, np.float32)
    if s[2] == 0.0:
        ret[0] = cam.ux
        ret[1] = cam.uy
        return ret
    ret[0] = s[0] / s[2] * cam.fx + cam.ux
    if cam.flip_y:
        ret[1] = cam.uy - s[1] / s[2] * cam.fy
    else:
        ret[1] = s[1] / s[2] * cam.fy + cam.uy
    ret[2] = s[2]
    return ret


def joints_3d_to_img(cam, pts):
    return np.stack([joint_3d_to_img(cam, p) for p in pts])


def joints_img_to_3d(cam, pts):
    return np.stack([joint_img_to_3d(cam, p) for p in pts])


def rotate_point_2d(p1, center, angle):
    """transformations.py:71-88."""
    alpha = angle * np.pi / 180.0
    pp = np.asarray(p1, np.float32).copy()
    pp[0:2] -= center[0:2]
    pr = np.zeros_like(pp)
    pr[0] = pp[0] * np.cos(alpha) - pp[1] * np.sin(alpha)
    pr[1] = pp[0] * np.sin(alpha) + pp[1] * np.cos(alpha)
    pr[2] = pp[2]
    pr[0:2] += center[0:2]
    return pr


def rotate_points_2d(pts, center, angle):
    return np.stack([rotate_point_2d(p, center, angle) for p in pts])


def rotate_point_3d(p1, center, ax, ay, az):
    """transformations.py:122-139; getRotationMatrix = euler2mat 'rxyz'
    = Rx(ax) @ Ry(ay) @ Rz(az) on column vectors."""
    rx, ry, rz = np.deg2rad([ax, ay, az])

    def Rx(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float64)

    def Ry(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float64)

    def Rz(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float64)

    r = np.dot(np.dot(Rx(rx), Ry(ry)), Rz(rz))
    pp = np.asarray(p1, np.float64) - center
    return (np.dot(r, pp) + center).astype(np.float32)


def rotate_points_3d(pts, center, ax, ay, az):
    return np.stack([rotate_point_3d(p, center, ax, ay, az) for p in pts])


def twin_sample(cam, base_poses, base_com_img, base_cube, aug_modes,
                modes, ridxs, off, sc, rot, rot3d):
    """The reference loop (handdetector.py:850-909) verbatim, per pose,
    consuming pre-drawn parameter arrays.  base_com_img is in image
    coords (the repo API); the reference's base_com is com3D, so convert
    per pose with the scalar projection first."""
    num = len(modes)
    j = base_poses.shape[1]
    new_poses = np.zeros((num, j, 3), np.float32)
    new_com = np.zeros((num, 3), np.float32)
    new_cube = np.zeros((num, 3), np.float32)
    if tuple(aug_modes) == ("none",):
        nb = base_poses.shape[0]
        normalized = (
            base_poses.astype(np.float32)
            / (base_cube[:, 2].astype(np.float32) / 2.0)[:, None, None]
        )
        return normalized.reshape(nb, j * 3), None, None
    for i in range(num):
        mode = aug_modes[modes[i]]
        ridx = ridxs[i]
        cube = base_cube[ridx].astype(np.float32)
        com3d = joint_img_to_3d(cam, base_com_img[ridx])
        pose = base_poses[ridx].astype(np.float32)
        if mode == "com":
            new_com[i] = com3d + off[i]
            new_cube[i] = cube
            new_poses[i] = (pose + com3d - new_com[i]) / (new_cube[i][2] / 2.0)
        elif mode == "rot":
            new_com[i] = com3d
            new_cube[i] = cube
            if not rot3d:
                joint_2d = joints_3d_to_img(cam, pose + new_com[i])
                data_2d = rotate_points_2d(
                    joint_2d, joint_3d_to_img(cam, com3d)[0:2], rot[i, 0]
                )
                new_poses[i] = (
                    joints_img_to_3d(cam, data_2d) - new_com[i]
                ) / (new_cube[i][2] / 2.0)
            else:
                new_poses[i] = (
                    rotate_points_3d(pose + new_com[i], new_com[i],
                                     rot[i, 0], rot[i, 1], rot[i, 2])
                    - new_com[i]
                ) / (new_cube[i][2] / 2.0)
        elif mode == "sc":
            new_com[i] = com3d
            new_cube[i] = cube * sc[i]
            new_poses[i] = pose / (new_cube[i][2] / 2.0)
        elif mode == "none":
            new_com[i] = com3d
            new_cube[i] = cube
            new_poses[i] = pose / (new_cube[i][2] / 2.0)
        else:
            ops = set(mode.split("+"))
            new_com[i] = com3d + off[i]
            new_cube[i] = cube
            pose = pose + com3d - new_com[i]
            if "sc" in ops:
                pose = pose * sc[i]  # quirk: cube NOT scaled (:892-894)
            if not rot3d:
                # quirk: rotate about NEW com's projection, re-center
                # about OLD com3D (:884-887)
                joint_2d = joints_3d_to_img(cam, pose + com3d)
                data_2d = rotate_points_2d(
                    joint_2d, joint_3d_to_img(cam, new_com[i])[0:2],
                    rot[i, 0],
                )
                new_poses[i] = (
                    joints_img_to_3d(cam, data_2d) - com3d
                ) / (new_cube[i][2] / 2.0)
            else:
                new_poses[i] = (
                    rotate_points_3d(pose + new_com[i], new_com[i],
                                     rot[i, 0], rot[i, 1], rot[i, 2])
                    - new_com[i]
                ) / (new_cube[i][2] / 2.0)
    return new_poses.reshape(num, j * 3), new_com, new_cube


# ---------------------------------------------------------------------------
# sweep
# ---------------------------------------------------------------------------
MODE_SETS = [
    ("com", "rot", "none"),                  # flagship recipe
    ("com", "rot", "sc", "none"),
    ("rot+com", "none"),
    ("com+rot",),
    ("rot+com+sc",),
    ("rot+sc+com", "com", "sc"),
    ("none",),                               # reference fast path
    ("sc",),
]
CAMS = {"nyu": NYU_CAMERA, "icvl": ICVL_CAMERA, "msra": MSRA15_CAMERA}


def run_sweep(n_scenes=N_SCENES, verbose=True):
    rng = np.random.default_rng(20260820)
    n_checked = 0
    worst = 0.0
    for si in range(n_scenes):
        cam_name = list(CAMS)[si % len(CAMS)]
        cam = CAMS[cam_name]
        n_base = int(rng.integers(3, 12))
        j = int(rng.integers(5, 22))
        # CoM-centered poses in mm; coms across the frustum incl. deep/near
        base_poses = rng.normal(0.0, 60.0, (n_base, j, 3))
        base_com = np.stack([
            rng.uniform(20, cam.width - 20, n_base),
            rng.uniform(20, cam.height - 20, n_base),
            rng.uniform(250, 1400, n_base),
        ], axis=1)
        base_cube = rng.uniform(150, 400, (n_base, 1)) * np.ones((1, 3))
        for mset in MODE_SETS:
            for rot3d in (False, True):
                num = P
                # pre-draw the parameter arrays both sides consume
                prng = np.random.default_rng(1000 * si + len(mset))
                modes = prng.integers(0, len(mset), num)
                ridxs = prng.integers(0, n_base, num)
                off_raw = prng.standard_normal((num, 3))
                sc_raw = prng.standard_normal(num)
                rot = prng.uniform(-180.0, 180.0, (num, 3))
                off = off_raw * 5.0
                sc = np.abs(sc_raw * 0.02 + 1.0)

                class _FixedRng:
                    """Feeds sample_random_poses the pre-drawn arrays in
                    its draw order (prior.py:117-122: modes, ridx, off,
                    sc, rot) — dispatch by call sequence, not arguments
                    (n_base can equal len(mset))."""

                    def __init__(self):
                        self._int_calls = 0
                        self._norm_calls = 0

                    def integers(self, lo, hi, size):
                        self._int_calls += 1
                        return modes if self._int_calls == 1 else ridxs

                    def standard_normal(self, size=None):
                        self._norm_calls += 1
                        return off_raw if self._norm_calls == 1 else sc_raw

                    def uniform(self, lo, hi, size):
                        return rot

                got = sample_random_poses(
                    cam, _FixedRng(), base_poses, base_com, base_cube,
                    num, aug_modes=mset, rot3d=rot3d,
                )
                want, _, _ = twin_sample(
                    cam, base_poses, base_com, base_cube, mset,
                    modes, ridxs, off, sc, rot, rot3d,
                )
                denom = np.maximum(np.abs(want), 1.0)
                rel = float(np.max(np.abs(got - want) / denom))
                worst = max(worst, rel)
                assert rel < 1e-5, (
                    f"scene {si} cam {cam_name} modes {mset} rot3d {rot3d}:"
                    f" max rel err {rel:.3e}"
                )
                n_checked += got.size
        if verbose:
            print(f"scene {si} ({cam_name}): ok (worst rel so far "
                  f"{worst:.2e})", flush=True)
    if verbose:
        print(f"\nPASS: {n_scenes} scenes x {len(MODE_SETS)} mode sets x "
              f"2 rot paths, {n_checked} values, worst rel err {worst:.2e}",
              flush=True)
    return worst


if __name__ == "__main__":
    run_sweep()
