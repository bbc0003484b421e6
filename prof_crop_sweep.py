"""Randomized differential sweep: device crop paths vs the host oracle.

Hunts edge-case disagreements the fixed-geometry tests cannot reach:
random cubes (100-400 mm), CoMs at/over image borders, near-clamp and
degenerate depths, both camera geometries.  Configs are batched per
camera so each device path compiles once; per-sample BIT-exactness is
asserted for
  - crop3d(method='gather') vs HandCropper.crop_area_3d (the oracle),
  - crop3d(method='onehot') vs gather,
  - crop3d(resize='nd_bilinear') vs the host ND-aware twin (float
    tolerance — weighted blend),
  - crop3d(resize='linear') vs the cv2-exact host twin (r5 contract:
    taps/weights bit-identical, blend to <=2 ulp under XLA FMA
    contraction — docs/PARITY.md; onehot-linear vs gather-linear to f32
    round-off),
  - [--pallas only] pallas_normalized_crop (interpret, fuse_clamp on RAW
    depth) vs normalized_crop(onehot on clamped depth).

The pallas leg is OPT-IN because jax 0.9's TPU interpret mode can
deadlock on CPU when an io_callback materializes a multi-MB argument
(`_allocate_buffer`'s np.array(val) blocks on the XLA:CPU threadpool;
observed at batch>=2 NYU frames, probability rising with buffer bytes —
faulthandler traces in docs/ROADMAP.md round-4 notes).  The kernel
itself is covered by tests/test_pallas_crop.py (small frames, stable)
and by BENCH_CHECK bit-exactness on the real TPU; with --pallas this
sweep chunks the interpret calls to batch 2 and resets interpreter
state between chunks, which still hangs occasionally — run it manually
under a timeout, never in CI.

Run on CPU: python prof_crop_sweep.py [n_configs_per_camera] [--pallas]
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from deepprior_tpu.camera import ICVL_CAMERA, NYU_CAMERA
from deepprior_tpu.data.detector_np import HandCropper
from deepprior_tpu.ops.crop import clamp_depth, crop3d, normalized_crop

RUN_PALLAS = "--pallas" in sys.argv[1:]
args = [a for a in sys.argv[1:] if not a.startswith("--")]
N = int(args[0]) if args else 32
rng = np.random.default_rng(20260819)


def random_depth(cam, kind):
    h, w = cam.height, cam.width
    if kind == 0:  # uniform noise across the full working range
        return rng.uniform(300.0, 2500.0, (h, w)).astype(np.float32)
    if kind == 1:  # blob on noise floor (hand-like)
        d = np.full((h, w), 2000.0, np.float32)
        cy, cx = rng.integers(0, h), rng.integers(0, w)
        yy, xx = np.mgrid[0:h, 0:w]
        r2 = (yy - cy) ** 2 + (xx - cx) ** 2
        z = rng.uniform(450.0, 900.0)
        mask = r2 < rng.integers(400, 10000)
        d[mask] = z + rng.uniform(-40, 40, int(mask.sum()))
        return d
    if kind == 2:  # constant plane
        return np.full((h, w), rng.uniform(400.0, 1500.0), np.float32)
    # zeros with sparse speckle (invalid-heavy frame)
    d = np.zeros((h, w), np.float32)
    mask = rng.random((h, w)) < 0.01
    d[mask] = rng.uniform(300.0, 2000.0, int(mask.sum()))
    return d.astype(np.float32)


def random_com(cam, kind):
    h, w = cam.height, cam.width
    z = rng.uniform(350.0, 1400.0)
    if kind == 0:  # well inside
        return np.array(
            [rng.uniform(0.2 * w, 0.8 * w), rng.uniform(0.2 * h, 0.8 * h), z],
            np.float32,
        )
    if kind == 1:  # at/over a border
        edge = rng.integers(0, 4)
        u = [rng.uniform(-30, 10), rng.uniform(w - 10, w + 30),
             rng.uniform(0, w), rng.uniform(0, w)][edge]
        v = [rng.uniform(0, h), rng.uniform(0, h),
             rng.uniform(-30, 10), rng.uniform(h - 10, h + 30)][edge]
        return np.array([u, v, z], np.float32)
    if kind == 2:  # far outside
        return np.array(
            [rng.uniform(-500, -50), rng.uniform(-500, -50), z], np.float32
        )
    # degenerate / extreme z: exactly 0 exercises the defined center-crop
    # fallback; 30-60 mm is a pathologically close hand (bbox ~2000 px,
    # still materializable by the oracle).  z in (0, ~25) is OUT OF
    # CONTRACT: the cube projects to millions of pixels and the reference
    # itself explodes (the oracle now raises a loud ValueError there —
    # found by this sweep's first run as a 268 GiB host allocation).
    z = 0.0 if rng.random() < 0.5 else rng.uniform(30.0, 60.0)
    return np.array([rng.uniform(0, w), rng.uniform(0, h), z], np.float32)


fails = 0
for cam in (NYU_CAMERA, ICVL_CAMERA):
    print(f"[sweep] cam {cam.width}x{cam.height}: generating...", flush=True)
    dpts = np.stack([
        random_depth(cam, int(rng.integers(0, 4))) for _ in range(N)
    ])
    coms = np.stack([
        random_com(cam, int(rng.integers(0, 4))) for _ in range(N)
    ])
    cubes = rng.uniform(100.0, 400.0, (N, 1)).repeat(3, 1).astype(np.float32)

    print("[sweep] clamp...", flush=True)
    dpt_c = np.asarray(clamp_depth(dpts)[0])
    print("[sweep] device paths...", flush=True)
    got_crop, got_m = crop3d(
        dpt_c, coms, cubes, cam.fx, cam.fy, method="gather"
    )
    oh_crop, _ = crop3d(
        dpt_c, coms, cubes, cam.fx, cam.fy, method="onehot"
    )
    ref_norm, _ = normalized_crop(
        dpt_c, coms, cubes, cam.fx, cam.fy, method="onehot"
    )
    # the ND-aware resize leg (reference handdetector.py:132-202 via the
    # round-4 resize switch)
    ndb_crop, _ = crop3d(
        dpt_c, coms, cubes, cam.fx, cam.fy, resize="nd_bilinear"
    )
    # the cv2 INTER_LINEAR leg (handdetector.py:347-348 via the r5
    # cv2-exact device path)
    lin_crop, _ = crop3d(
        dpt_c, coms, cubes, cam.fx, cam.fy, resize="linear"
    )
    lin_oh, _ = crop3d(
        dpt_c, coms, cubes, cam.fx, cam.fy, resize="linear", method="onehot"
    )
    pl_norm = None
    if RUN_PALLAS:
        from jax.experimental.pallas import tpu as pltpu

        from deepprior_tpu.ops.pallas_crop import pallas_normalized_crop

        print("[sweep] pallas interpret (chunked, may hang)...", flush=True)
        chunks = []
        for i in range(0, N, 2):
            with pltpu.force_tpu_interpret_mode():
                o, _ = pallas_normalized_crop(
                    dpts[i:i + 2], coms[i:i + 2], cubes[i:i + 2],
                    cam.fx, cam.fy, fuse_clamp=True,
                )
                chunks.append(np.asarray(o))
            pltpu.reset_tpu_interpret_mode_state()
        pl_norm = np.concatenate(chunks)
    got_crop = np.asarray(got_crop)
    got_m = np.asarray(got_m)
    oh_crop = np.asarray(oh_crop)
    ref_norm = np.asarray(ref_norm)
    ndb_crop = np.asarray(ndb_crop)
    lin_crop = np.asarray(lin_crop)
    lin_oh = np.asarray(lin_oh)

    print("[sweep] host oracle loop...", flush=True)
    for i in range(N):
        tag = (f"cam={cam.width}x{cam.height} cube={cubes[i, 0]:.0f} "
               f"com={coms[i]}")
        hc = HandCropper(dpt_c[i].copy(), cam)
        want_crop, want_m, _ = hc.crop_area_3d(
            com=coms[i].copy(), size=tuple(cubes[i])
        )
        if not (got_crop[i] == want_crop).all():
            n_bad = int((got_crop[i] != want_crop).sum())
            print(f"GATHER!=ORACLE {tag} ({n_bad} px)", flush=True)
            fails += 1
            continue
        if not (oh_crop[i] == got_crop[i]).all():
            print(f"ONEHOT!=GATHER {tag}", flush=True)
            fails += 1
            continue
        if not np.allclose(got_m[i], want_m, rtol=1e-6, atol=1e-4):
            print(f"M mismatch {tag}", flush=True)
            fails += 1
            continue
        hc_nd = HandCropper(dpt_c[i].copy(), cam, resize_method="nd_bilinear")
        want_nd, _, _ = hc_nd.crop_area_3d(
            com=coms[i].copy(), size=tuple(cubes[i])
        )
        # weighted blend -> float tolerance (tests/test_resize_refine.py
        # contract), not bit-exactness like the nearest paths
        if not np.allclose(ndb_crop[i], want_nd, rtol=1e-5, atol=1e-3):
            n_bad = int(
                (~np.isclose(ndb_crop[i], want_nd, rtol=1e-5, atol=1e-3)).sum()
            )
            err = np.abs(ndb_crop[i] - want_nd).max()
            print(f"NDBILINEAR!=ORACLE {tag} ({n_bad} px, max {err:.3e})",
                  flush=True)
            fails += 1
            continue
        hc_lin = HandCropper(dpt_c[i].copy(), cam, resize_method="linear")
        want_lin, _, _ = hc_lin.crop_area_3d(
            com=coms[i].copy(), size=tuple(cubes[i])
        )
        # taps/weights bit-identical; blend to <=2 ulp (XLA FMA
        # contraction) — a flipped tap/threshold would blow the atol
        if not np.allclose(lin_crop[i], want_lin, rtol=3e-7, atol=1e-3):
            n_bad = int(
                (~np.isclose(lin_crop[i], want_lin, rtol=3e-7, atol=1e-3)).sum()
            )
            err = np.abs(lin_crop[i] - want_lin).max()
            print(f"LINEAR!=ORACLE {tag} ({n_bad} px, max {err:.3e})",
                  flush=True)
            fails += 1
            continue
        if not np.allclose(lin_oh[i], lin_crop[i], rtol=1e-5, atol=1e-2):
            err = np.abs(lin_oh[i] - lin_crop[i]).max()
            print(f"LINEAR-ONEHOT!=GATHER {tag} (max {err:.3e})", flush=True)
            fails += 1
            continue
        if pl_norm is not None and not (pl_norm[i] == ref_norm[i]).all():
            n_bad = int((pl_norm[i] != ref_norm[i]).sum())
            print(f"PALLAS!=ONEHOT {tag} ({n_bad} px)", flush=True)
            fails += 1

print(f"sweep done: {2 * N} configs, {fails} disagreements", flush=True)
sys.exit(1 if fails else 0)
