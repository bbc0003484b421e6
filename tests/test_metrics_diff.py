"""Differential test: HandposeEvaluation vs the reference formulas.

Pins EVERY quantitative method of eval/metrics.py against statistics
transcribed verbatim from the reference (same pattern as the crop/augment
/detect differential sweeps, prof_*_sweep.py):
reference src/util/handpose_evaluation.py:92-228.

The transcription below is an independent per-method numpy re-statement of
the reference's math (nanmean/nanstd/nanmax compositions, the plain-median
quirk of getNumFramesWithinMedianDist, scipy.stats.nanmedian's default
axis=0 in getMedianError, the lagging-prefix cumulativeMovingAverage) —
NOT a call into the repo code, so a drift on either side fails loudly.

Runs over clean inputs AND NaN-bearing inputs (shipped baseline prediction
files can carry missing values; the reference evaluates them instead of
raising, :92-228).
"""

import warnings

import numpy as np
import pytest

from deepprior_tpu.eval import HandposeEvaluation


def _dists(gt, pred):
    # the reference recomputes this expression inline in every method:
    # numpy.sqrt(numpy.square(gt - joints).sum(axis=2))
    return np.sqrt(np.square(gt - pred).sum(axis=2))


def _make(seed, n=60, j=14, nan_frac=0.0):
    rng = np.random.default_rng(seed)
    gt = rng.uniform(-120, 120, (n, j, 3)).astype(np.float32)
    pred = gt + rng.normal(0, 7, gt.shape).astype(np.float32)
    if nan_frac:
        # poke NaNs into predictions (missing baseline values), never a
        # full frame — all-NaN rows are degenerate on both sides
        mask = rng.uniform(size=(n, j)) < nan_frac
        mask[:, 0] = False  # keep one joint per frame
        pred[mask] = np.nan
    return gt, pred


CASES = [
    ("clean", _make(0)),
    ("nan_sparse", _make(1, nan_frac=0.05)),
    ("nan_dense", _make(2, nan_frac=0.35)),
    ("nan_in_gt", (_make(3)[0], _make(3)[1])),
]
# one case with NaN in the ground truth too (reference treats both sides
# through the same dists expression)
CASES[3][1][0][5, 3, :] = np.nan  # gt NaN
CASES = [(k, v) for k, v in CASES]


@pytest.fixture(params=CASES, ids=[k for k, _ in CASES])
def case(request):
    gt, pred = request.param[1]
    return HandposeEvaluation(gt, pred), _dists(gt, pred)


def test_mean_error_ref(case):
    e, d = case
    # reference :92-98: nanmean over frames of nanmean over joints
    assert e.getMeanError() == pytest.approx(
        np.nanmean(np.nanmean(d, axis=1)), rel=1e-6
    )


def test_std_error_ref(case):
    e, d = case
    # reference :99-105: nanmean of the PER-FRAME nanstd over joints
    assert e.getStdError() == pytest.approx(
        np.nanmean(np.nanstd(d, axis=1)), rel=1e-6
    )


def test_median_error_ref(case):
    e, d = case
    # reference :114-121: scipy.stats.nanmedian(dists) -> default axis=0,
    # i.e. a (J,) array of per-joint medians
    got = e.getMedianError()
    assert got.shape == (d.shape[1],)
    np.testing.assert_allclose(got, np.nanmedian(d, axis=0), rtol=1e-6)


def test_max_error_ref(case):
    e, d = case
    assert e.getMaxError() == pytest.approx(np.nanmax(d), rel=1e-6)


def test_over_seq_ref(case):
    e, d = case
    np.testing.assert_allclose(
        e.getMeanErrorOverSeq(), np.nanmean(d, axis=1), rtol=1e-6
    )
    np.testing.assert_allclose(
        e.getMaxErrorOverSeq(), np.nanmax(d, axis=1), rtol=1e-6
    )


def test_joint_errors_ref(case):
    e, d = case
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        for jid in range(d.shape[1]):
            assert e.getJointMeanError(jid) == pytest.approx(
                np.nanmean(d[:, jid]), rel=1e-6, nan_ok=True
            )
            assert e.getJointStdError(jid) == pytest.approx(
                np.nanstd(d[:, jid]), rel=1e-6, nan_ok=True
            )
            assert e.getJointMaxError(jid) == pytest.approx(
                np.nanmax(d[:, jid]), rel=1e-6, nan_ok=True
            )
            np.testing.assert_allclose(
                e.getJointErrorOverSeq(jid), d[:, jid], rtol=1e-6
            )


def test_frames_within_ref(case):
    e, d = case
    for t in [3.0, 8.0, 15.0, 40.0]:
        # :196-202 nanmax; :204-210 nanmean
        assert e.getNumFramesWithinMaxDist(t) == (
            np.nanmax(d, axis=1) <= t
        ).sum()
        assert e.getNumFramesWithinMeanDist(t) == (
            np.nanmean(d, axis=1) <= t
        ).sum()
        # :213-219 quirk: PLAIN numpy.median — NaN frames never count
        assert e.getNumFramesWithinMedianDist(t) == (
            np.median(d, axis=1) <= t
        ).sum()
        for jid in [0, d.shape[1] - 1]:
            assert e.getJointNumFramesWithinMaxDist(t, jid) == (
                d[:, jid] <= t
            ).sum()


def test_cma_ref(case):
    e, d = case
    # float64 on both sides: the repo CMA accumulates in float64
    # (a documented precision upgrade over the reference's input dtype)
    data = np.nanmean(d, axis=1).astype(np.float64)
    got = e.cumulativeMovingAverage(data)
    # the reference loop, verbatim (:183-194)
    expect = np.zeros((data.shape[0], 1), float)
    expect[0] = data[0]
    for i in range(1, data.shape[0]):
        expect[i] = np.nanmean(data[0:i])
    np.testing.assert_allclose(got, expect, rtol=1e-9)


def test_nan_baseline_evaluates_not_raises():
    """A baseline file with missing predictions must evaluate (the r4
    metric layer raised ValueError and would have crashed --accept)."""
    gt, pred = _make(9, nan_frac=0.1)
    e = HandposeEvaluation(gt, pred)
    assert np.isfinite(e.getMeanError())
    assert np.isfinite(e.getStdError())
    assert np.isfinite(e.getMedianError()).all()
    t, frac = e.successCurve()
    assert ((frac >= 0) & (frac <= 1)).all()
