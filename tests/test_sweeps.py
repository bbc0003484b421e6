"""Randomized differential sweeps as regression tests.

The repo-root probes prof_crop_sweep.py / prof_aug_sweep.py /
prof_detect_sweep.py pin the whole crop + augmentation + detection
semantics against independent numpy twins written straight from the
reference's formulas (handdetector.py:91-108, 382-490, 546-632,
nettrainer.py:919-997).  They exit nonzero on ANY disagreement.  Running
them with a small N keeps every future round honest about edge cases the
fixed-geometry tests cannot reach (border/out-of-image CoMs, random
cubes, degenerate depths); the roots remain runnable standalone with a
bigger N for deeper hunts.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, n, timeout):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, os.path.join(REPO, script), str(n)],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO,
    )


def test_crop_differential_sweep():
    # no --pallas: jax 0.9's interpret mode deadlocks on multi-MB
    # io_callback args (see the probe's docstring); the pallas kernel is
    # covered by test_pallas_crop.py + on-device BENCH_CHECK instead
    res = _run("prof_crop_sweep.py", 16, timeout=900)
    assert res.returncode == 0, res.stdout + res.stderr
    assert "0 disagreements" in res.stdout


def test_augment_differential_sweep():
    res = _run("prof_aug_sweep.py", 4, timeout=900)
    assert res.returncode == 0, res.stdout + res.stderr
    assert "0 disagreements" in res.stdout


def test_prior_differential_sweep():
    # sample_random_poses vs a per-pose scalar twin transcribed from the
    # reference loop (handdetector.py:805-909): mode dispatch, combined-
    # mode quirks, ['none'] fast path, 2D/3D rotation, all three cameras
    res = _run("prof_prior_sweep.py", 6, timeout=900)
    assert res.returncode == 0, res.stdout + res.stderr
    assert "PASS" in res.stdout


def test_detect_differential_sweep():
    # calculateCoM / refineCoMIterative / slice-scan detect vs the host
    # twins over multi-blob, corner-touching, border-clipped, plane, and
    # speckle scenes; its first run caught the empty-crop fallback reading
    # RAW depth and the missing [min,max]-depth re-mask (ops/com.py)
    res = _run("prof_detect_sweep.py", 12, timeout=900)
    assert res.returncode == 0, res.stdout + res.stderr
    assert "0 disagreements" in res.stdout
