"""Driver-hook smoke tests: entry() compiles, dryrun_multichip runs on the
simulated 8-device CPU mesh, mains run end-to-end in synthetic mode."""

import subprocess
import sys
import os

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")


def test_entry_compiles():
    import jax

    sys.path.insert(0, REPO)
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 14, 3)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_dryrun_multichip_8():
    sys.path.insert(0, REPO)
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_odd():
    sys.path.insert(0, REPO)
    import __graft_entry__ as ge

    ge.dryrun_multichip(1)


@pytest.mark.slow
@pytest.mark.parametrize(
    "script",
    [
        "main_nyu_posereg_embedding.py",
        "main_nyu_com_refine.py",
        "main_icvl_posereg_embedding.py",
        "main_icvl_com_refine.py",
        "main_msra15_com_refine.py",
    ],
)
def test_mains_synthetic_smoke(script, tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # mains/common.py applies it via the config API
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "mains", script),
            "--synthetic", "--epochs", "2", "--nmax", "48",
            "--batch-size", "16", "--out", str(tmp_path),
        ],
        capture_output=True, text=True, timeout=900, env=env,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "epoch 1" in out.stdout


@pytest.mark.slow
def test_bench_contract(tmp_path):
    """bench.py prints exactly one JSON line with the required keys."""
    import json

    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu", BENCH_BATCH="16", BENCH_ITERS="2")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    # driver contract: the four required keys; extras (flops_per_frame /
    # mfu_pct MFU accounting) are allowed
    assert {"metric", "value", "unit", "vs_baseline"} <= set(rec)
    assert rec["unit"] == "fps" and rec["value"] > 0
    assert rec.get("flops_per_frame", 1) > 0


@pytest.mark.slow
def test_bench_batch1_mode(tmp_path):
    """BENCH_MODE=batch1 prints the serving-latency JSON (pure-device +
    dispatch-inclusive ms) and exits cleanly."""
    import json

    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu", BENCH_MODE="batch1")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec["metric"] == "batch1_serving_ms"
    assert rec["value"] >= 0 and rec["dispatch_inclusive_ms"] >= 0


def test_packed_conv_default_on():
    """The lane-packed conv formulation (parameter-tree-identical,
    equality-tested, -14% step time) is the mains' DEFAULT since round 4;
    --no-packed-conv opts out."""
    sys.path.insert(0, REPO)
    from mains.common import base_parser

    p = base_parser("t")
    assert p.parse_args(["--synthetic"]).packed_conv is True
    assert p.parse_args(["--synthetic", "--no-packed-conv"]).packed_conv \
        is False


@pytest.mark.slow
def test_main_bf16_packed(tmp_path):
    """--bf16 --packed-conv trains and evaluates (compute-dtype and the
    lane-packed conv path through the full main)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "mains", "main_nyu_posereg_embedding.py"),
            "--synthetic", "--epochs", "2", "--nmax", "48",
            "--batch-size", "16", "--bf16", "--packed-conv",
            "--out", str(tmp_path),
        ],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "epoch 1" in out.stdout
