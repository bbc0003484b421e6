"""Randomized differential sweep: device detection/CoM layer vs the host
twins.

Completes the round-4 sweep family (prof_crop_sweep.py, prof_aug_sweep.py)
for the detection stack — calculateCoM, refineCoMIterative, and the full
slice-scan detector (reference handdetector.py:91-108, 546-567, 569-632;
host twins data/detector_np.py HandCropper.{calculate_com,
refine_com_iterative, detect} — an independent numpy/scipy formulation).
Hunts edge cases the fixed-geometry tests in tests/test_com.py cannot
reach:

  - multi-blob scenes with areas straddling the min_area gate,
  - blobs touching only at a corner (4- vs 8-connectivity would split),
  - border-clipped blobs and seeds at/over/far-outside the image,
  - empty-crop refinement fallbacks (z-thresholded-away content, bboxes
    crossing the image edge — the branch where the first run of this
    sweep caught the device fallback reading the RAW center depth and
    clamping the crop origin where the reference reads the THRESHOLDED
    crop center, ops/com.py _masked_com_in_bounds),
  - speckle / constant-plane / all-invalid frames,
  - non-default (num_slices, min_area) detector parameters.

Known measure-zero deviation (documented in ops/com.py detect): a pixel
exactly on an interior slice boundary belongs to one slice here but to
both overlapping [lo, hi] scans in the reference; all sweep depths are
continuous draws so the event has probability zero.

Checks (device batched-jit once per parameter group vs per-scene host):
  1. calculate_com(hc.dpt, hc.min_depth, hc.max_depth) == hc.calculate_com
     (rtol 1e-4 / atol 0.1 — summation-order tolerance, the
     tests/test_com.py contract),
  2. refine_com_iterative(...) == hc.refine_com_iterative(...) over random
     seeds (inside / border / far outside / z=0), cubes 150-350 mm, and
     both 2- and 5-iteration groups (rtol 1e-3 / atol 0.5),
  3. detect(raw) == hc.detect(...) over (num_slices=20, min_area=200) and
     (num_slices=10, min_area=50) groups (rtol 1e-3 / atol 0.5).

Run on CPU: python prof_detect_sweep.py [n_scenes_per_camera]
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from deepprior_tpu.camera import ICVL_CAMERA, NYU_CAMERA
from deepprior_tpu.data.detector_np import HandCropper
from deepprior_tpu.ops.com import (
    calculate_com,
    detect as dev_detect,
    refine_com_iterative,
)

args = [a for a in sys.argv[1:] if not a.startswith("--")]
N = int(args[0]) if args else 24
rng = np.random.default_rng(20260821)

N_KINDS = 7


def _disk(d, cy, cx, r, z):
    h, w = d.shape
    yy, xx = np.mgrid[0:h, 0:w]
    m = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
    if m.any():
        d[m] = z + rng.uniform(-5.0, 5.0, int(m.sum()))
    return m


def random_scene(cam, kind):
    h, w = cam.height, cam.width
    if kind == 0:  # k blobs, areas straddling the 200 px gate
        d = np.zeros((h, w), np.float32)
        for _ in range(int(rng.integers(1, 6))):
            _disk(d, rng.integers(20, h - 20), rng.integers(20, w - 20),
                  rng.uniform(6.0, 14.0), rng.uniform(300.0, 1400.0))
        return d
    if kind == 1:  # hand blob on a far plane + nearer sub-gate specks
        d = np.full((h, w), 1800.0, np.float32)
        _disk(d, rng.integers(60, h - 60), rng.integers(60, w - 60),
              rng.uniform(20.0, 40.0), rng.uniform(600.0, 900.0))
        for _ in range(int(rng.integers(1, 4))):
            _disk(d, rng.integers(5, h - 5), rng.integers(5, w - 5),
                  rng.uniform(1.0, 5.0), rng.uniform(300.0, 550.0))
        return d
    if kind == 2:  # border-clipped blob (center at/over an edge)
        d = np.zeros((h, w), np.float32)
        edge = int(rng.integers(0, 4))
        cy = [rng.integers(-10, 10), rng.integers(h - 10, h + 10),
              rng.integers(0, h), rng.integers(0, h)][edge]
        cx = [rng.integers(0, w), rng.integers(0, w),
              rng.integers(-10, 10), rng.integers(w - 10, w + 10)][edge]
        _disk(d, cy, cx, rng.uniform(12.0, 30.0), rng.uniform(350.0, 1200.0))
        return d
    if kind == 3:  # two squares touching ONLY at a corner, unequal areas
        d = np.zeros((h, w), np.float32)
        s1, s2 = 15, 17  # 225 / 289 px: both above the 200 gate, no tie
        y0 = int(rng.integers(10, h - s1 - s2 - 10))
        x0 = int(rng.integers(10, w - s1 - s2 - 10))
        z = rng.uniform(400.0, 1000.0)
        d[y0:y0 + s1, x0:x0 + s1] = z + rng.uniform(-2, 2, (s1, s1))
        d[y0 + s1:y0 + s1 + s2, x0 + s1:x0 + s1 + s2] = (
            z + rng.uniform(-2, 2, (s2, s2))
        )
        return d
    if kind == 4:  # constant plane (degenerate dz)
        return np.full((h, w), rng.uniform(400.0, 1400.0), np.float32)
    if kind == 5:  # speckle only — nothing exceeds any gate
        d = np.zeros((h, w), np.float32)
        m = rng.random((h, w)) < 0.005
        d[m] = rng.uniform(300.0, 1400.0, int(m.sum()))
        return d.astype(np.float32)
    return np.zeros((h, w), np.float32)  # kind 6: all-invalid frame


def random_seed_com(cam, kind):
    h, w = cam.height, cam.width
    z = rng.uniform(350.0, 1300.0)
    if kind == 0:  # inside
        return np.array([rng.uniform(0.2 * w, 0.8 * w),
                         rng.uniform(0.2 * h, 0.8 * h), z], np.float32)
    if kind == 1:  # at/over a border
        return np.array([rng.uniform(-20.0, 20.0),
                         rng.uniform(h - 20.0, h + 20.0), z], np.float32)
    if kind == 2:  # far outside (bbox fully off-image -> empty crop)
        return np.array([rng.uniform(-400.0, -80.0),
                         rng.uniform(-400.0, -80.0), z], np.float32)
    return np.array([rng.uniform(0, w), rng.uniform(0, h), 0.0],
                    np.float32)  # z=0: comToBounds center fallback


fails = 0
for cam in (NYU_CAMERA, ICVL_CAMERA):
    print(f"[sweep] cam {cam.width}x{cam.height}: generating...", flush=True)
    raws = np.stack([
        random_scene(cam, int(rng.integers(0, N_KINDS))) for _ in range(N)
    ])
    seeds = np.stack([
        random_seed_com(cam, int(rng.integers(0, 4))) for _ in range(N)
    ])
    cubes = (rng.uniform(150.0, 350.0, (N, 1)).repeat(3, 1)
             .astype(np.float32))

    croppers = [HandCropper(raws[i], cam) for i in range(N)]
    dpt_c = np.stack([hc.dpt for hc in croppers])
    min_d = np.array([hc.min_depth for hc in croppers], np.float32)
    max_d = np.array([hc.max_depth for hc in croppers], np.float32)

    print("[sweep] device paths...", flush=True)
    got_com = np.asarray(jax.jit(calculate_com)(dpt_c, min_d, max_d))
    ref2 = np.asarray(jax.jit(
        lambda d, s, c, mn, mx: refine_com_iterative(
            d, s, c, cam.fx, cam.fy, num_iter=2, min_depth=mn, max_depth=mx)
    )(dpt_c, seeds, cubes, min_d, max_d))
    ref5 = np.asarray(jax.jit(
        lambda d, s, c, mn, mx: refine_com_iterative(
            d, s, c, cam.fx, cam.fy, num_iter=5, min_depth=mn, max_depth=mx)
    )(dpt_c, seeds, cubes, min_d, max_d))
    det_default = np.asarray(jax.jit(
        lambda d, c: dev_detect(d, c, cam.fx, cam.fy)
    )(raws, cubes))
    det_alt = np.asarray(jax.jit(
        lambda d, c: dev_detect(d, c, cam.fx, cam.fy, num_slices=10,
                                min_area=50)
    )(raws, cubes))

    print("[sweep] host twins...", flush=True)
    for i in range(N):
        hc = croppers[i]
        tag = (f"cam={cam.width}x{cam.height} cube={cubes[i, 0]:.0f} "
               f"seed={seeds[i]}")
        want = hc.calculate_com()
        if not np.allclose(got_com[i], want, rtol=1e-4, atol=0.1):
            print(f"CALC_COM {tag}: {got_com[i]} != {want}", flush=True)
            fails += 1
        for iters, got_r in ((2, ref2), (5, ref5)):
            want_r = hc.refine_com_iterative(seeds[i].copy(), iters,
                                             tuple(cubes[i]))
            if not np.allclose(got_r[i], want_r, rtol=1e-3, atol=0.5):
                print(f"REFINE(it={iters}) {tag}: {got_r[i]} != {want_r}",
                      flush=True)
                fails += 1
        for (ns, ma), got_d in (((20, 200), det_default),
                                ((10, 50), det_alt)):
            want_d = hc.detect(size=tuple(cubes[i]), num_slices=ns,
                               min_area=ma)
            if not np.allclose(got_d[i], want_d, rtol=1e-3, atol=0.5):
                print(
                    f"DETECT(ns={ns},ma={ma}) {tag}: "
                    f"{got_d[i]} != {want_d}",
                    flush=True,
                )
                fails += 1

print(f"sweep done: {2 * N} scenes, {fails} disagreements", flush=True)
sys.exit(1 if fails else 0)
