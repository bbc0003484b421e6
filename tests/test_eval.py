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


def test_over_seq_surface(ev):
    """The per-frame metric family (handpose_evaluation.py:106-228)."""
    e, gt, pred = ev
    d = np.sqrt(((gt - pred) ** 2).sum(2))
    np.testing.assert_allclose(e.getMeanErrorOverSeq(), d.mean(1), rtol=1e-6)
    np.testing.assert_allclose(e.getMaxErrorOverSeq(), d.max(1), rtol=1e-6)
    for j in [0, 5, 13]:
        np.testing.assert_allclose(e.getJointErrorOverSeq(j), d[:, j], rtol=1e-6)
        np.testing.assert_allclose(
            e.getJointDiffOverSeq(j), gt[:, j] - pred[:, j], rtol=1e-6
        )


def test_median_and_joint_frame_counts(ev):
    e, gt, pred = ev
    d = np.sqrt(((gt - pred) ** 2).sum(2))
    for t in [3.0, 8.0, 20.0]:
        assert e.getNumFramesWithinMedianDist(t) == (np.median(d, 1) <= t).sum()
        for j in [0, 13]:
            assert e.getJointNumFramesWithinMaxDist(t, j) == (d[:, j] <= t).sum()


def test_cumulative_moving_average():
    """Reproduces the reference's lagging prefix average EXACTLY
    (handpose_evaluation.py:183-194): cma[0]=x[0], cma[i]=mean(x[0:i])."""
    data = np.array([4.0, 2.0, 6.0, 0.0, 8.0])
    cma = HandposeEvaluation.cumulativeMovingAverage(data)
    assert cma.shape == (5, 1)
    # the reference loop, verbatim
    expect = np.zeros((5, 1))
    expect[0] = data[0]
    for i in range(1, 5):
        expect[i] = np.nanmean(data[0:i])
    np.testing.assert_allclose(cma, expect)
    # nan handling matches nanmean-of-prefix
    datan = np.array([1.0, np.nan, 3.0, 5.0])
    cman = HandposeEvaluation.cumulativeMovingAverage(datan)
    assert cman[2, 0] == pytest.approx(1.0)   # mean of [1, nan]
    assert cman[3, 0] == pytest.approx(2.0)   # mean of [1, nan, 3]


def test_get_pcl():
    """Per-dataset getPCL dispatch (handpose_evaluation.py:730,843,906)."""
    rng = np.random.default_rng(5)
    gt = rng.uniform(-50, 50, (4, 16, 3)).astype(np.float32)
    e = ICVLHandposeEvaluation(gt, gt)
    dpt = np.zeros((128, 128), np.float32)
    dpt[64, 64] = 500.0
    dpt[10, 100] = 600.0
    T = np.eye(3, dtype=np.float32)  # identity crop: pixels are frame coords
    pcl = e.getPCL(dpt, T)
    assert pcl.shape == (2, 3)
    assert set(np.round(pcl[:, 2])) == {500.0, 600.0}
    # identity transform -> matches the camera's direct back-projection
    direct = e.camera.depth_to_pcl(dpt)
    np.testing.assert_allclose(pcl, direct, atol=1e-4)
    # the base class has no camera bound
    with pytest.raises(NotImplementedError):
        HandposeEvaluation(gt, gt).getPCL(dpt, T)
    # NYU/MSRA dispatch to their own (flipped) cameras
    gtn = rng.uniform(-50, 50, (4, 14, 3)).astype(np.float32)
    en = NYUHandposeEvaluation(gtn, gtn)
    pn = en.getPCL(dpt, T)
    assert pn.shape == (2, 3)
    # flipped camera: v below center -> negative y for the (64,64) point
    assert pn[np.argmin(np.abs(pn[:, 2] - 500.0)), 1] > 0  # v=64 above uy=240


def test_plot_joints_axis_and_image(tmp_path):
    """plotJoints draws on both a matplotlib axis and an ndarray image
    (handpose_evaluation.py:435-487)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rng = np.random.default_rng(6)
    gt = rng.uniform(-50, 50, (3, 16, 3)).astype(np.float32)
    e = ICVLHandposeEvaluation(gt, gt)
    j2d = rng.uniform(20, 100, (16, 2)).astype(np.float32)

    fig, ax = plt.subplots()
    e.plotJoints(ax, j2d, color="nice", jcolor="nice")
    assert len(ax.lines) == len(e.joint_connections)
    plt.close(fig)

    img = np.zeros((128, 128, 3), np.uint8)
    e.plotJoints(img, j2d, color="nice", jcolor="nice", annoscale=1)
    assert img.any(), "rasterized skeleton wrote no pixels"
    # explicit colour + gray path + jcolor=None (no markers)
    img2 = np.zeros((128, 128, 3), np.uint8)
    e.plotJoints(img2, j2d, color=(255, 0, 0), jcolor=None)
    assert (img2[..., 0] > 0).any() and not (img2[..., 1] > 0).any()
    fig, ax = plt.subplots()
    e.plotJoints(ax, j2d, color="gray", jcolor="gray")
    plt.close(fig)
    # too few joints for the skeleton -> connections skipped, no crash
    img3 = np.zeros((64, 64, 3), np.uint8)
    e.plotJoints(img3, j2d[:4], color="nice", jcolor=None)
    assert not img3.any()


def test_perfect_prediction():
    gt = np.random.default_rng(1).uniform(-50, 50, (10, 16, 3)).astype(np.float32)
    e = ICVLHandposeEvaluation(gt, gt.copy())
    assert e.getMeanError() == 0.0
    assert e.getMaxError() == 0.0
    assert e.getNumFramesWithinMaxDist(0.001) == 10


def test_shape_validation():
    with pytest.raises(ValueError):
        HandposeEvaluation(np.zeros((5, 14, 3)), np.zeros((6, 14, 3)))
    with pytest.raises(ValueError):  # reference: non-zero size (:63-65)
        HandposeEvaluation(np.zeros((0, 14, 3)), np.zeros((0, 14, 3)))
    # NaN inputs are ACCEPTED (reference is nan-tolerant throughout;
    # tests/test_metrics_diff.py pins the per-method NaN semantics)
    bad = np.zeros((5, 14, 3))
    bad[0, 0, 0] = np.nan
    e = HandposeEvaluation(bad, np.zeros((5, 14, 3)))
    assert np.isfinite(e.getMeanError())


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


def test_nyu_all_skeleton_dispatch():
    """evaluation_for(36) must expose the 36-joint skeleton at CLASS level —
    the realtime show() path reads joint_connections without instantiating
    (realtimehandposepipeline.py:398-405)."""
    from deepprior_tpu.eval import NYUAllHandposeEvaluation

    cls = evaluation_for(36)
    assert cls is NYUAllHandposeEvaluation
    assert len(cls.joint_names) == 36
    assert cls.joint_connections is NYUHandposeEvaluation.ALL_CONNECTIONS
    for a, b in cls.joint_connections:
        assert 0 <= a < 36 and 0 <= b < 36
    # instances default to the 'all' subset but can still ask for 'eval'
    rng = np.random.default_rng(0)
    gt = rng.uniform(-100, 100, (4, 36, 3)).astype(np.float32)
    inst = cls(gt, gt.copy())
    assert inst.joint_connections is NYUHandposeEvaluation.ALL_CONNECTIONS


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
