"""Acceptance-harness smoke tests (VERDICT r2 #7).

The --accept gate reimplements the reference's baseline-comparison epilogue
(main_nyu_posereg_embedding.py:161-205, main_icvl_posereg_embedding.py:
180-190) as a turnkey command: combined-test-set evaluation, shipped-
baseline comparison (Tompson .mat / LRF .txt), the paper's curves, and a
hard mean-error threshold from BASELINE.md.  These tests drive it end to
end on synthetic data + generated baseline fixtures so a future round with
the real datasets is one command away.
"""

import json
import os
import subprocess
import sys
from types import SimpleNamespace

import numpy as np
import pytest

# subprocess / multi-process / convergence tests: full runs are the
# round gate; the fast dev loop deselects with -m 'not slow'
pytestmark = pytest.mark.slow

REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, os.path.join(REPO, "mains"))


def _write_icvl_baseline_txt(path, seed, n_frames):
    """LRF-style line format (u v d x 16 joints per line), regenerated from
    the exact synthetic test sequence the main will build (same seed), plus
    pixel-scale noise so the baseline has a small nonzero error."""
    from deepprior_tpu.camera import ICVL_CAMERA
    from deepprior_tpu.data.synthetic import make_sequence

    seq = make_sequence(ICVL_CAMERA, n_frames, num_joints=16, seed=seed,
                        name="test_seq_1")
    rng = np.random.default_rng(7)
    with open(path, "w") as fh:
        for fr in seq.data:
            uvd = fr.gtorig + rng.normal(0.0, [1.0, 1.0, 3.0],
                                         fr.gtorig.shape)
            fh.write(" ".join(f"{v:.4f}" for v in uvd.reshape(-1)) + "\n")
    return len(seq.data)


def _run_main(tmp_path, extra, timeout=900):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable,
         os.path.join(REPO, "mains", "main_icvl_posereg_embedding.py"),
         "--synthetic", "--batch-size", "16", "--out", str(tmp_path),
         *extra],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO,
    )


def test_accept_icvl_pass(tmp_path):
    """Green path: --accept with a generous threshold trains, compares
    against the .txt baseline, writes the curves + overlays + acceptance
    record, and exits 0."""
    bl = tmp_path / "LRF_Results_seq_1.txt"
    # load_or_synthesize: test seq has max(32, nmax//8) frames, seed+1
    _write_icvl_baseline_txt(str(bl), seed=23455 + 1, n_frames=32)

    out = _run_main(tmp_path, ["--epochs", "2", "--nmax", "48", "--accept",
                               "--baseline-file", str(bl),
                               "--accept-mm", "1000"])
    assert out.returncode == 0, out.stderr[-3000:]
    # synthetic-fixture runs are labeled as smoke tests, never as evidence
    # against the real-dataset BASELINE.md target
    assert "acceptance [PASS (synthetic smoke)]" in out.stdout
    assert "baseline Tang et al." in out.stdout

    outdir = tmp_path / "train_EMB_PCA30"
    rec = json.load(open(outdir / "results.json"))["acceptance"]
    assert rec["pass"] is True
    assert rec["synthetic"] is True
    assert rec["threshold_mm"] == 1000.0
    assert rec["n_test_frames"] == 32
    # the fixture is gt + ~1 px noise -> small but nonzero baseline error
    assert 0.0 < rec["baseline"]["mean_mm"] < 100.0
    assert rec["baseline"]["label"] == "Tang et al."
    # the paper's curves: threshold curve + per-joint bars (one PDF) and
    # the every-20th-frame 2D overlays (32 frames -> indices 0 and 20)
    files = os.listdir(outdir)
    assert any("accept" in f and f.endswith(".pdf") for f in files), files
    pngs = [f for f in files if f.endswith("_0.png") or f.endswith("_20.png")]
    assert len(pngs) == 2, files
    # always-on training curves (reference main:133-142)
    assert "train_EMB_PCA30_cost.png" in files, files
    assert "train_EMB_PCA30_errs.png" in files, files


def test_default_run_epilogue_artifacts(tmp_path):
    """A DEFAULT flagship run (no --accept) must leave the reference's
    artifact set: semilogy cost/err curves (main:133-142) and the
    every-20th-frame skeleton overlays (main:199-205) — VERDICT r4 #4."""
    out = _run_main(tmp_path, ["--epochs", "1", "--nmax", "33"])
    assert out.returncode == 0, out.stderr[-3000:]
    outdir = tmp_path / "train_EMB_PCA30"
    files = os.listdir(outdir)
    assert "train_EMB_PCA30_cost.png" in files, files
    assert "train_EMB_PCA30_errs.png" in files, files
    # 32-frame test seq -> overlays at frames 0 and 20
    assert "train_EMB_PCA30_0.png" in files, files
    assert "train_EMB_PCA30_20.png" in files, files
    # and no acceptance record without --accept
    assert "acceptance" not in json.load(open(outdir / "results.json"))


def test_load_baseline_predictions_unit(tmp_path):
    """The shared baseline loader (VERDICT r4 #6: one code path for
    _acceptance and run_com_refine): explicit --baseline-file, --data
    relpath resolution, truncation to the gt frame count, and the
    no-baseline fallthrough."""
    import common  # mains/common.py
    from deepprior_tpu.data.importers import ICVLImporter

    n = _write_icvl_baseline_txt(str(tmp_path / "bl.txt"), seed=5,
                                 n_frames=8)
    gt = np.zeros((5, 16, 3), np.float32)  # fewer frames than the file
    spec = {"label": "Tang et al.", "relpath": "bl.txt", "kind": "txt"}
    imp_cls = lambda bp: ICVLImporter(bp, use_cache=False)

    # explicit file wins; preds truncated to gt's 5 frames
    args = SimpleNamespace(baseline_file=str(tmp_path / "bl.txt"), data=None)
    preds, path = common._load_baseline_predictions(args, imp_cls, spec, gt)
    assert preds.shape == (5, 16, 3) and preds.dtype == np.float32
    assert path == str(tmp_path / "bl.txt")

    # resolved via --data + relpath
    args = SimpleNamespace(baseline_file=None, data=str(tmp_path))
    preds2, path2 = common._load_baseline_predictions(args, imp_cls, spec, gt)
    assert path2 == os.path.join(str(tmp_path), "bl.txt")
    np.testing.assert_array_equal(preds, preds2)

    # missing file / no spec -> (None, None)
    args = SimpleNamespace(baseline_file=None, data=str(tmp_path / "nope"))
    assert common._load_baseline_predictions(args, imp_cls, spec, gt) == (
        None, None)
    args = SimpleNamespace(baseline_file=None, data=str(tmp_path))
    assert common._load_baseline_predictions(args, imp_cls, None, gt) == (
        None, None)


def test_accept_icvl_fail_exits_nonzero(tmp_path):
    """Red path: an unbeatable threshold makes the main exit non-zero with
    the FAIL diagnostics (CI contract)."""
    out = _run_main(tmp_path, ["--epochs", "1", "--nmax", "33", "--accept",
                               "--accept-mm", "0.0001"])
    assert out.returncode != 0
    assert "acceptance [FAIL (synthetic smoke)]" in out.stdout
    assert "acceptance FAILED" in out.stderr
    # the record is still written for post-mortem
    rec = json.load(
        open(tmp_path / "train_EMB_PCA30" / "results.json")
    )["acceptance"]
    assert rec["pass"] is False


def test_accept_nyu_mat_branch(tmp_path):
    """The Tompson .mat baseline branch (importer.loadBaseline with gt
    depth-fixup, reference main:192 + importers.py:1078-1122) through
    _acceptance directly: depth PNGs + predictions .mat fixture, synthetic
    NYU frames."""
    from PIL import Image
    import scipy.io

    import common  # mains/common.py
    from deepprior_tpu.camera import NYU_CAMERA
    from deepprior_tpu.data.importers import NYUImporter
    from deepprior_tpu.data.synthetic import make_sequence
    from deepprior_tpu.eval import NYUHandposeEvaluation

    seq = make_sequence(NYU_CAMERA, 4, num_joints=14, seed=11, name="test_1",
                        keep_full=True)
    gt = np.stack([f.gt3Dorig for f in seq.data]).astype(np.float32)

    # full-frame depth PNGs in NYU packing (G<<8 | B), next to the .mat
    for i, fr in enumerate(seq.data):
        d16 = fr.extraData["dpt_full"].astype(np.uint16)
        rgb = np.zeros(d16.shape + (3,), np.uint8)
        rgb[..., 1] = (d16 >> 8).astype(np.uint8)
        rgb[..., 2] = (d16 & 0xFF).astype(np.uint8)
        Image.fromarray(rgb).save(tmp_path / f"depth_1_{i + 1:07d}.png")

    # predicted (u, v) = projected gt + noise, all-nonzero confidence
    rng = np.random.default_rng(3)
    pred = np.zeros((4, 14, 3))
    for i in range(4):
        uv = NYU_CAMERA.three_d_to_img_np(gt[i])[:, :2]
        uv = uv + rng.normal(0.0, 1.0, uv.shape)
        pred[i, :, 0] = np.clip(uv[:, 0], 0, NYU_CAMERA.width - 1)
        pred[i, :, 1] = np.clip(uv[:, 1], 0, NYU_CAMERA.height - 1)
        pred[i, :, 2] = 1.0
    mat = tmp_path / "test_predictions.mat"
    scipy.io.savemat(str(mat), {
        "pred_joint_uvconf": pred[None],
        "conv_joint_names": np.array([f"j{i}" for i in range(14)])[None],
    })

    args = SimpleNamespace(accept_mm=None, baseline_file=str(mat), data=None)
    joints = gt + rng.normal(0.0, 2.0, gt.shape).astype(np.float32)
    rec = common._acceptance(
        args,
        lambda bp: NYUImporter(bp, use_cache=False),
        NYU_CAMERA, NYUHandposeEvaluation, [seq], [gt], [joints],
        str(tmp_path), "NYU_SMOKE",
        baseline_spec={"label": "Tompson et al.",
                       "relpath": os.path.join("test",
                                               "test_predictions.mat"),
                       "kind": "mat"},
        accept_mm=10.0,
    )
    assert rec["baseline"]["label"] == "Tompson et al."
    # noisy-projection baseline: finite, nonzero, small error
    assert 0.0 < rec["baseline"]["mean_mm"] < 100.0
    assert rec["pass"] == (rec["mean_mm"] < 10.0)
    files = os.listdir(tmp_path)
    assert any("accept" in f and f.endswith(".pdf") for f in files), files
    # overlays live in the always-on epilogue helper now (r5), not in
    # _acceptance; exercise it directly on the same fixtures
    hpe = NYUHandposeEvaluation(gt, joints)
    hpe.subfolder = str(tmp_path)
    written = common._plot_overlays(hpe, NYU_CAMERA, seq, joints,
                                    "NYU_SMOKE")
    assert len(written) == 1  # 4 frames, stride 20 -> index 0 only
    assert "NYU_SMOKE_0.png" in os.listdir(tmp_path)


def test_cli_resume_and_streamed(tmp_path):
    """CLI wiring for --resume and --streamed: an interrupted streamed run
    resumes from its rolling snapshot and re-produces the uninterrupted
    epoch-1 validation number (the bit-identical-resume guarantee,
    tests/test_resume.py, surfaced through the entry points)."""
    first = _run_main(tmp_path, ["--epochs", "2", "--nmax", "48",
                                 "--streamed"])
    assert first.returncode == 0, first.stderr[-3000:]
    assert (tmp_path / "train_EMB_PCA30" / "net_last.ckpt").exists()

    second = _run_main(tmp_path, ["--epochs", "4", "--nmax", "48",
                                  "--streamed", "--resume"])
    assert second.returncode == 0, second.stderr[-3000:]
    assert "resuming from" in second.stdout
    # resumed run starts at the snapshot epoch, not epoch 0
    assert "epoch 0:" not in second.stdout
    assert "epoch 3:" in second.stdout


def _run_com_main(tmp_path, extra, timeout=900):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable,
         os.path.join(REPO, "mains", "main_icvl_com_refine.py"),
         "--synthetic", "--batch-size", "16", "--out", str(tmp_path),
         *extra],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO,
    )


def test_com_refine_epilogue_and_accept_pass(tmp_path):
    """The com_refine mains carry the reference's full eval epilogue
    (main_nyu_com_refine.py:228-251): refined-CoM HandposeEvaluation,
    shipped-baseline crop-joint comparison, raw-CoM comparison, curve
    plots, result persistence — and an HONORED --accept gate (VERDICT r3
    missing #2 / weak #1)."""
    bl = tmp_path / "LRF_Results_seq_1.txt"
    _write_icvl_baseline_txt(str(bl), seed=23455 + 1, n_frames=32)

    out = _run_com_main(tmp_path, ["--epochs", "2", "--nmax", "48",
                                   "--accept", "--baseline-file", str(bl),
                                   "--accept-mm", "1000"])
    assert out.returncode == 0, out.stderr[-3000:]
    # the three printed mean errors (refined / baseline / raw CoM)
    assert "Refined CoM mean error:" in out.stdout
    assert "Baseline Tang et al. crop-joint mean error:" in out.stdout
    assert "Raw CoM mean error:" in out.stdout
    assert "acceptance [PASS (synthetic smoke)]" in out.stdout

    outdir = tmp_path / "train_COM"
    rec = json.load(open(outdir / "results.json"))
    assert rec["refined"]["mean_mm"] > 0
    assert rec["baseline"]["label"] == "Tang et al."
    assert 0.0 < rec["baseline"]["mean_mm"] < 100.0
    assert rec["com"]["mean_mm"] > 0
    assert rec["acceptance"]["pass"] is True
    assert rec["acceptance"]["synthetic"] is True
    files = os.listdir(outdir)
    # result persistence (reference main:233) + training curves + the
    # success-curve PDFs with the baselines overlaid
    assert "result_train_COM.npy" in files
    assert "train_COM_cost.png" in files and "train_COM_errs.png" in files
    assert any(f.endswith(".pdf") for f in files), files
    joints = np.load(outdir / "result_train_COM.npy")
    assert joints.shape == (32, 1, 3) and np.isfinite(joints).all()


def test_com_refine_accept_fail_exits_nonzero(tmp_path):
    """Red path: the com --accept gate exits non-zero on a miss (it used
    to be a silent no-op on this path)."""
    out = _run_com_main(tmp_path, ["--epochs", "1", "--nmax", "33",
                                   "--accept", "--accept-mm", "0.0001"])
    assert out.returncode != 0
    assert "acceptance [FAIL (synthetic smoke)]" in out.stdout
    assert "acceptance FAILED" in out.stderr
    rec = json.load(open(tmp_path / "train_COM" / "results.json"))
    assert rec["acceptance"]["pass"] is False
