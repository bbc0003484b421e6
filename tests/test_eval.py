"""Evaluation metric suite tests."""

import os

import numpy as np
import pytest

from deepprior_tpu.eval import (
    HandposeEvaluation,
    ICVLHandposeEvaluation,
    MSRAHandposeEvaluation,
    NYUHandposeEvaluation,
    evaluation_for,
)


@pytest.fixture
def ev():
    rng = np.random.default_rng(0)
    gt = rng.uniform(-100, 100, (50, 14, 3)).astype(np.float32)
    pred = gt + rng.normal(0, 5, gt.shape).astype(np.float32)
    return NYUHandposeEvaluation(gt, pred), gt, pred


def test_mean_error(ev):
    e, gt, pred = ev
    expect = np.sqrt(((gt - pred) ** 2).sum(2)).mean()
    assert e.getMeanError() == pytest.approx(expect, rel=1e-6)


def test_max_error(ev):
    e, gt, pred = ev
    expect = np.sqrt(((gt - pred) ** 2).sum(2)).max()
    assert e.getMaxError() == pytest.approx(expect, rel=1e-6)


def test_joint_errors(ev):
    e, gt, pred = ev
    d = np.sqrt(((gt - pred) ** 2).sum(2))
    for j in [0, 7, 13]:
        assert e.getJointMeanError(j) == pytest.approx(d[:, j].mean(), rel=1e-6)
        assert e.getJointMaxError(j) == pytest.approx(d[:, j].max(), rel=1e-6)


def test_frames_within_dist(ev):
    e, gt, pred = ev
    d = np.sqrt(((gt - pred) ** 2).sum(2))
    for t in [5.0, 10.0, 30.0]:
        assert e.getNumFramesWithinMaxDist(t) == (d.max(1) <= t).sum()
    assert e.getNumFramesWithinMaxDist(1e9) == 50
    t, frac = e.successCurve()
    assert frac[-1] >= frac[0]
    assert ((frac >= 0) & (frac <= 1)).all()


def test_perfect_prediction():
    gt = np.random.default_rng(1).uniform(-50, 50, (10, 16, 3)).astype(np.float32)
    e = ICVLHandposeEvaluation(gt, gt.copy())
    assert e.getMeanError() == 0.0
    assert e.getMaxError() == 0.0
    assert e.getNumFramesWithinMaxDist(0.001) == 10


def test_shape_validation():
    with pytest.raises(ValueError):
        HandposeEvaluation(np.zeros((5, 14, 3)), np.zeros((6, 14, 3)))
    bad = np.zeros((5, 14, 3))
    bad[0, 0, 0] = np.nan
    with pytest.raises(ValueError):
        HandposeEvaluation(bad, np.zeros((5, 14, 3)))


def test_dataset_skeletons():
    assert len(ICVLHandposeEvaluation.joint_names) == 16
    assert len(MSRAHandposeEvaluation.joint_names) == 21
    assert len(NYUHandposeEvaluation.EVAL_JOINT_NAMES) == 14
    # every connection references valid joints
    for cls, nj in [(ICVLHandposeEvaluation, 16), (MSRAHandposeEvaluation, 21)]:
        for a, b in cls.joint_connections:
            assert 0 <= a < nj and 0 <= b < nj
    assert evaluation_for(14) is NYUHandposeEvaluation
    assert evaluation_for(21) is MSRAHandposeEvaluation
    assert evaluation_for(16) is ICVLHandposeEvaluation


def test_plots_written(tmp_path):
    rng = np.random.default_rng(2)
    gt = rng.uniform(-100, 100, (20, 16, 3)).astype(np.float32)
    pred = gt + rng.normal(0, 8, gt.shape).astype(np.float32)
    e = ICVLHandposeEvaluation(gt, pred)
    e.subfolder = str(tmp_path)
    base = ICVLHandposeEvaluation(gt, gt + rng.normal(0, 15, gt.shape).astype(np.float32))
    files = e.plotEvaluation("testrun", baseline=[("worse", base)])
    assert len(files) == 3
    for f in files:
        assert os.path.exists(f) and os.path.getsize(f) > 0


def test_plot_result(tmp_path):
    rng = np.random.default_rng(3)
    gt = rng.uniform(-100, 100, (5, 16, 3)).astype(np.float32)
    e = ICVLHandposeEvaluation(gt, gt)
    e.subfolder = str(tmp_path)
    dpt = rng.uniform(-1, 1, (128, 128)).astype(np.float32)
    j2d = rng.uniform(10, 118, (16, 2)).astype(np.float32)
    p = e.plotResult(dpt, j2d, j2d + 2.0, name="overlay")
    assert os.path.exists(p)


def test_plot_result_3d(tmp_path):
    from deepprior_tpu.eval.plots import plot_result_3d

    rng = np.random.default_rng(4)
    gt = rng.uniform(-100, 100, (5, 21, 3)).astype(np.float32)
    e = MSRAHandposeEvaluation(gt, gt)
    e.subfolder = str(tmp_path)
    pcl = rng.uniform(-100, 100, (1000, 3)).astype(np.float32)
    p = plot_result_3d(e, gt[0], pcl, name="hand3d")
    assert os.path.exists(p)
