"""Randomized differential sweep: on-device augmentation vs a numpy twin.

`ops/augment.py::augment_batch` reimplements the reference's worker-pool
augmentation (`NetTrainer.augmentCrop`, reference nettrainer.py:919-997 +
the handdetector.py moveCoM/rotateHand/scaleHand warps) as one batched
on-device program.  The existing tests pin *properties* (blob follows
label, radius preserved, output range); this sweep pins the *whole
semantics* against an independent per-sample numpy implementation written
straight from the reference's formulas: unnormalize, per-mode transform
(com-shift recrop / in-plane rotation / cube scale), inverse-affine
nearest warp with nv-masking, z-rethreshold, label math, premax/zero
renormalization.  The twin mirrors the device op ORDER in float32 so
agreement is BIT-exact (the same bar data/detector_np.py sets for crops);
any disagreement is a real semantic divergence, not noise.

Run on CPU: python prof_aug_sweep.py [n_batches]
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from deepprior_tpu.camera import ICVL_CAMERA, NYU_CAMERA
from deepprior_tpu.data.synthetic import make_frame
from deepprior_tpu.ops.augment import NV_VAL, augment_batch, sample_augment_params

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8
B = 16
rng = np.random.default_rng(20260820)


# ---------------------------------------------------------------------------
# numpy twin (per sample, float32, device op order)
# ---------------------------------------------------------------------------
def inv3x3_np(m):
    a, b, c = m[0, 0], m[0, 1], m[0, 2]
    d, e, f = m[1, 0], m[1, 1], m[1, 2]
    g, h, i = m[2, 0], m[2, 1], m[2, 2]
    co_a = e * i - f * h
    co_b = -(d * i - f * g)
    co_c = d * h - e * g
    det = a * co_a + b * co_b + c * co_c
    inv_det = np.float32(1.0) / det
    adj = np.array(
        [
            [co_a, -(b * i - c * h), b * f - c * e],
            [co_b, a * i - c * g, -(a * f - c * d)],
            [co_c, -(a * h - b * g), a * e - b * d],
        ],
        np.float32,
    )
    return adj * inv_det


def matmul3_np(x, y):
    """3x3 f32 product with explicit left-to-right accumulation."""
    out = np.zeros((3, 3), np.float32)
    for i in range(3):
        for j in range(3):
            out[i, j] = (x[i, 0] * y[0, j] + x[i, 1] * y[1, j]) + x[i, 2] * y[2, j]
    return out


def com_to_bounds_np(com, cube, fx, fy):
    """ops/crop.py::com_to_bounds twin (floats, f32 op order)."""
    u, v, d = com
    sx, sy, sz = cube
    f32 = np.float32
    half = f32(0.5)
    xs = np.floor((u * d / f32(fx) - sx / f32(2.0)) / d * f32(fx) + half)
    xe = np.floor((u * d / f32(fx) + sx / f32(2.0)) / d * f32(fx) + half)
    ys = np.floor((v * d / f32(fy) - sy / f32(2.0)) / d * f32(fy) + half)
    ye = np.floor((v * d / f32(fy) + sy / f32(2.0)) / d * f32(fy) + half)
    return xs, xe, ys, ye, d - sz / f32(2.0), d + sz / f32(2.0)


def crop_transform_np(com, cube, fx, fy, dsize=(128, 128)):
    """ops/crop.py::crop_transform twin."""
    xs, xe, ys, ye, _, _ = com_to_bounds_np(com, cube, fx, fy)
    dw, dh = dsize
    wb, hb = xe - xs, ye - ys
    f32 = np.float32
    if wb > hb:
        scale = f32(dw) / wb
        sz_w, sz_h = f32(dw), np.floor(hb * f32(dw) / wb)
    else:
        scale = f32(dh) / hb
        sz_w, sz_h = np.floor(wb * f32(dh) / hb), f32(dh)
    off_x = np.floor(f32(dw) / f32(2.0) - sz_w / f32(2.0))
    off_y = np.floor(f32(dh) / f32(2.0) - sz_h / f32(2.0))
    return np.array(
        [
            [scale, 0.0, -scale * xs + off_x],
            [0.0, scale, -scale * ys + off_y],
            [0.0, 0.0, 1.0],
        ],
        np.float32,
    )


def rotmat2d_np(center, angle_deg):
    a = np.deg2rad(np.float32(angle_deg)).astype(np.float32)
    c, s = np.cos(a), np.sin(a)
    cx, cy = np.float32(center[0]), np.float32(center[1])
    return np.array(
        [
            [c, -s, cx - c * cx + s * cy],
            [s, c, cy - s * cx - c * cy],
            [0.0, 0.0, 1.0],
        ],
        np.float32,
    )


def warp_nearest_np(img, m_fwd, border=0.0, nv_val=NV_VAL):
    """ops/crop.py::warp_patch twin (nearest, nv mask)."""
    h, w = img.shape
    m_inv = inv3x3_np(m_fwd)
    u, v = np.meshgrid(
        np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32)
    )
    sx = m_inv[0, 0] * u + m_inv[0, 1] * v + m_inv[0, 2]
    sy = m_inv[1, 0] * u + m_inv[1, 1] * v + m_inv[1, 2]
    sz = m_inv[2, 0] * u + m_inv[2, 1] * v + m_inv[2, 2]
    x = sx / sz
    y = sy / sz
    p = np.floor(x + np.float32(0.5))
    q = np.floor(y + np.float32(0.5))
    in_img = (p >= 0) & (p < w) & (q >= 0) & (q < h)
    pc = np.clip(p.astype(np.int64), 0, w - 1)
    qc = np.clip(q.astype(np.int64), 0, h - 1)
    out = img[qc, pc]
    out = np.where(in_img, out, np.float32(border)).astype(np.float32)
    out = np.where(np.isclose(out, np.float32(nv_val)), np.float32(border), out)
    return out


def twin_augment_one(cam, crop_norm, gt3d, com, cube, m, mode, off, rot, sc,
                     norm_zero_one=False):
    """Full augment semantics for ONE sample (reference nettrainer.py:
    919-997 via the ops/augment.py formulation, f32 op order)."""
    f32 = np.float32
    crop_norm = crop_norm.astype(f32)
    com = com.astype(f32)
    cube = cube.astype(f32)
    m = m.astype(f32)
    h, w = crop_norm.shape

    off = off.astype(f32) if mode == "com" else np.zeros(3, f32)
    rot = np.mod(f32(rot) if mode == "rot" else f32(0.0), f32(360.0))
    sc = f32(sc) if mode == "sc" else f32(1.0)

    com_z, cube_z = com[2], cube[2]
    if norm_zero_one:
        img = crop_norm * cube_z + (com_z - cube_z / f32(2.0))
    else:
        img = crop_norm * (cube_z / f32(2.0)) + com_z
    premax = img.max()

    com3d = cam.img_to_3d_np(com[None])[0].astype(f32)
    new_com3d = (com3d + off).astype(f32)
    new_com_c = cam.three_d_to_img_np(new_com3d[None])[0].astype(f32)
    new_com = new_com_c if mode == "com" else com
    new_cube = (cube * sc).astype(f32) if mode == "sc" else cube

    if mode in ("com", "sc"):
        m_new = crop_transform_np(new_com, new_cube, cam.fx, cam.fy, (w, h))
        a_fwd = matmul3_np(m_new, inv3x3_np(m))
        m_out = m_new
    elif mode == "rot":
        a_fwd = rotmat2d_np((w // 2, h // 2), rot)
        m_out = m
    else:
        a_fwd = np.eye(3, dtype=f32)
        m_out = m

    warped = warp_nearest_np(img, a_fwd)

    if mode in ("com", "sc"):
        # re-threshold with the ORIGINAL cube about the new com
        # (scaleHand passes size=cube, handdetector.py:771-773)
        _, _, _, _, zs, ze = com_to_bounds_np(new_com, cube, cam.fx, cam.fy)
        warped = np.where((warped < zs) & (warped != 0.0), zs, warped)
        warped = np.where(warped > ze, f32(0.0), warped)

    # labels
    if mode == "com":
        labels = gt3d + (com3d - new_com3d)[None, :]
    elif mode == "rot":
        joint2d = cam.three_d_to_img_np((gt3d + com3d[None, :]).astype(f32))
        a = np.deg2rad(rot).astype(f32)
        c, s = np.cos(a), np.sin(a)
        dx = joint2d[:, 0] - com[0]
        dy = joint2d[:, 1] - com[1]
        r2d = np.stack(
            [dx * c - dy * s + com[0], dx * s + dy * c + com[1],
             joint2d[:, 2]], axis=-1,
        ).astype(f32)
        labels = cam.img_to_3d_np(r2d).astype(f32) - com3d[None, :]
    else:
        labels = gt3d.astype(f32)
    labels_norm = labels / (new_cube[2] / f32(2.0))

    # renormalize (nettrainer.py:985-997)
    ncz, ncu = new_com[2], new_cube[2]
    zend = ncz + ncu / f32(2.0)
    zstart = ncz - ncu / f32(2.0)
    d = warped
    d = np.where(d == premax, zend, d)
    d = np.where(d == 0.0, zend, d)
    d = np.clip(d, zstart, zend)
    if norm_zero_one:
        out = (d - zstart) / ncu
    else:
        out = (d - ncz) / (ncu / f32(2.0))
    return (out.astype(f32), labels_norm.astype(f32), new_com, new_cube,
            m_out, a_fwd)


def _flips_excused(a_fwd, bad):
    """True iff every mismatching pixel is a rounding-boundary flip: its
    inverse-warp sampling coordinate sits within eps of a half-integer,
    so a 1-2 ulp difference between the twin's and XLA's float paths
    (libm trig for rot; accumulation order in the cancelling 3x3
    composition for com/sc — both observed) picks the neighboring source
    pixel.  Bounded at 2% of pixels (a boundary-aligned affine can flip a
    whole output row/column at once)."""
    f32 = np.float32
    if bad.mean() > 0.02:
        return False
    m_inv = inv3x3_np(a_fwd)
    qi, pi = np.nonzero(bad)
    u = pi.astype(f32)
    v = qi.astype(f32)
    x = (m_inv[0, 0] * u + m_inv[0, 1] * v + m_inv[0, 2]) / (
        m_inv[2, 0] * u + m_inv[2, 1] * v + m_inv[2, 2]
    )
    y = (m_inv[1, 0] * u + m_inv[1, 1] * v + m_inv[1, 2]) / (
        m_inv[2, 0] * u + m_inv[2, 1] * v + m_inv[2, 2]
    )
    eps = 1e-4
    near_x = np.abs((x + 0.5) - np.round(x + 0.5)) < eps
    near_y = np.abs((y + 0.5) - np.round(y + 0.5)) < eps
    return bool(np.all(near_x | near_y))


# ---------------------------------------------------------------------------
# sweep
# ---------------------------------------------------------------------------
MODE_SETS = [("com", "rot", "none"), ("com", "rot", "sc", "none"),
             ("sc",), ("rot",), ("com",)]

fails = 0
checked = 0
for bi in range(N):
    cam = (NYU_CAMERA, ICVL_CAMERA)[bi % 2]
    zero_one = bool(bi % 3 == 2)
    aug_modes = MODE_SETS[bi % len(MODE_SETS)]

    cube = rng.uniform(180.0, 350.0, (B, 1)).repeat(3, 1).astype(np.float32)
    frames = [
        make_frame(cam, rng, num_joints=14, cube=tuple(cube[j]))
        for j in range(B)
    ]
    crops = np.stack([f.dpt for f in frames])
    gt3d = np.stack([f.gt3Dcrop for f in frames]).astype(np.float32)
    com = np.stack([f.com for f in frames]).astype(np.float32)
    m = np.stack([f.T for f in frames]).astype(np.float32)
    # normalize the raw mm crops the way TrainData does
    com_z = com[:, 2][:, None, None]
    cz = cube[:, 2][:, None, None]
    crops = np.where(crops == 0.0, com_z + cz / 2.0, crops)
    crops = np.clip(crops, com_z - cz / 2.0, com_z + cz / 2.0)
    if zero_one:
        crops_n = ((crops - (com_z - cz / 2.0)) / cz).astype(np.float32)
    else:
        crops_n = ((crops - com_z) / (cz / 2.0)).astype(np.float32)

    key = jax.random.key(1000 + bi)
    out, lab, ncom, ncube, mout = augment_batch(
        key, crops_n, gt3d, com, cube, m, cam, aug_modes=aug_modes,
        norm_zero_one=zero_one, use_pallas=False,
    )
    out = np.asarray(out)
    lab = np.asarray(lab)
    ncom = np.asarray(ncom)
    ncube = np.asarray(ncube)
    mout = np.asarray(mout)
    # replay the device's parameter draw so the twin sees the same params
    mode_i, off_d, rot_d, sc_d = (
        np.asarray(x)
        for x in sample_augment_params(key, B, len(aug_modes))
    )

    for i in range(B):
        mode = aug_modes[int(mode_i[i])]
        t_out, t_lab, t_ncom, t_ncube, t_m, t_afwd = twin_augment_one(
            cam, crops_n[i], gt3d[i], com[i], cube[i], m[i],
            mode, off_d[i], rot_d[i], sc_d[i], norm_zero_one=zero_one,
        )
        checked += 1
        tag = f"batch={bi} i={i} mode={mode} cam={cam.width}x{cam.height}"
        if not np.array_equal(t_ncom, ncom[i]) or not np.array_equal(
            t_ncube, ncube[i]
        ):
            print(f"COM/CUBE mismatch {tag}", flush=True)
            fails += 1
            continue
        if not np.array_equal(t_m, mout[i]):
            print(f"M mismatch {tag}\n{t_m}\n{mout[i]}", flush=True)
            fails += 1
            continue
        # rot labels go through cos/sin: XLA's and numpy's libm differ by
        # ~1 ulp on some inputs, so they get a 1e-5 tolerance (normalized
        # units: ~1.5 um — far below any semantic error).  com/sc/none
        # labels must be BIT-exact.
        if mode == "rot":
            lab_ok = np.allclose(t_lab, lab[i], rtol=0.0, atol=1e-5)
        else:
            lab_ok = np.array_equal(t_lab, lab[i])
        if not lab_ok:
            err = np.abs(t_lab - lab[i]).max()
            print(f"LABEL mismatch {tag} (max {err:.3e})", flush=True)
            fails += 1
            continue
        # images must be bit-exact except excused rounding-boundary flips
        if not np.array_equal(t_out, out[i]):
            bad = t_out != out[i]
            if mode == "none" or not _flips_excused(t_afwd, bad):
                n_bad = int(bad.sum())
                err = np.abs(t_out - out[i]).max()
                print(f"IMAGE mismatch {tag} ({n_bad} px, max {err:.3e})",
                      flush=True)
                fails += 1

print(f"aug sweep done: {checked} samples, {fails} disagreements", flush=True)
sys.exit(1 if fails else 0)
