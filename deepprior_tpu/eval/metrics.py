"""Hand-pose metric suite over (N, J, 3) ground-truth/prediction arrays.

Mirrors the quantitative surface of the reference `HandposeEvaluation`
(reference src/util/handpose_evaluation.py:92-228): mean/max/median errors,
per-joint variants, per-frame sequences, and frames-within-distance
counts.  Vectorized numpy (the reference loops per frame); inputs in mm.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


class HandposeEvaluation:
    """Metric container; subclasses add skeletons/names for plotting."""

    joint_names: Sequence[str] = ()
    # skeleton as (parent, child) joint-index pairs
    joint_connections: Sequence = ()
    plot_max_dist = 80.0  # mm, threshold-curve x-range
    # per-dataset subclasses (eval/datasets.py) bind their Camera here so
    # getPCL can back-project frames (handpose_evaluation.py:730,843,906)
    camera = None

    def __init__(self, gt: np.ndarray, joints: np.ndarray, dolegend=True):
        gt = np.asarray(gt, np.float32)
        joints = np.asarray(joints, np.float32)
        if gt.shape != joints.shape or gt.ndim != 3:
            raise ValueError(
                f"gt {gt.shape} and predictions {joints.shape} must both be (N, J, 3)"
            )
        if np.isnan(gt).any() or np.isnan(joints).any():
            raise ValueError("NaN in evaluation inputs")
        self.gt = gt
        self.joints = joints
        self.dolegend = dolegend
        self.subfolder = "./eval/"
        # (N, J) per-joint Euclidean distances
        self.dists = np.sqrt(np.sum((gt - joints) ** 2, axis=2))

    # ------------------------------------------------------------------
    def getMeanError(self) -> float:
        """Mean over frames of (mean over joints) error
        (handpose_evaluation.py:110-116)."""
        return float(self.dists.mean(axis=1).mean())

    def getStdError(self) -> float:
        return float(self.dists.mean(axis=1).std())

    def getMedianError(self) -> float:
        return float(np.median(self.dists.mean(axis=1)))

    def getMaxError(self) -> float:
        return float(self.dists.max())

    def getJointMeanError(self, joint: int) -> float:
        return float(self.dists[:, joint].mean())

    def getJointStdError(self, joint: int) -> float:
        return float(self.dists[:, joint].std())

    def getJointMaxError(self, joint: int) -> float:
        return float(self.dists[:, joint].max())

    def getErrorPerFrame(self) -> np.ndarray:
        return self.dists.mean(axis=1)

    def getMaxErrorPerFrame(self) -> np.ndarray:
        return self.dists.max(axis=1)

    # ------------------------------------------------------------------
    # per-frame ("over sequence") surface, handpose_evaluation.py:106-228
    # ------------------------------------------------------------------
    def getMeanErrorOverSeq(self) -> np.ndarray:
        """(N,) mean-over-joints error per frame
        (handpose_evaluation.py:106-112)."""
        return self.dists.mean(axis=1)

    def getMaxErrorOverSeq(self) -> np.ndarray:
        """(N,) worst-joint error per frame
        (handpose_evaluation.py:130-136)."""
        return self.dists.max(axis=1)

    def getJointErrorOverSeq(self, joint: int) -> np.ndarray:
        """(N,) Euclidean error of one joint per frame
        (handpose_evaluation.py:156-163)."""
        return self.dists[:, joint]

    def getJointDiffOverSeq(self, joint: int) -> np.ndarray:
        """(N, 3) signed gt - prediction offsets of one joint
        (handpose_evaluation.py:165-172)."""
        return self.gt[:, joint, :] - self.joints[:, joint, :]

    @staticmethod
    def cumulativeMovingAverage(data) -> np.ndarray:
        """Running average of a 1D series, (N, 1) like the reference.

        Reproduces the reference quirk (handpose_evaluation.py:183-194)
        exactly: entry 0 is data[0], entry i >= 1 averages data[0:i] —
        EXCLUDING data[i] — so the curve lags one sample.  Vectorized
        (the reference is an O(N^2) Python loop)."""
        data = np.asarray(data, np.float64).reshape(-1)
        out = np.empty((data.shape[0], 1), float)
        out[0, 0] = data[0]
        if data.shape[0] > 1:
            # nanmean semantics: divide by the non-NaN count of the prefix
            counts = np.cumsum(~np.isnan(data), dtype=np.float64)[:-1]
            with np.errstate(invalid="ignore", divide="ignore"):
                out[1:, 0] = np.nancumsum(data)[:-1] / counts
        return out

    def getNumFramesWithinMaxDist(self, dist: float) -> int:
        """Frames whose WORST joint is within `dist` mm
        (handpose_evaluation.py:~200, the standard success-rate metric)."""
        return int((self.dists.max(axis=1) <= dist).sum())

    def getNumFramesWithinMeanDist(self, dist: float) -> int:
        return int((self.dists.mean(axis=1) <= dist).sum())

    def getNumFramesWithinMedianDist(self, dist: float) -> int:
        """Frames whose MEDIAN joint error is within `dist` mm
        (handpose_evaluation.py:213-219)."""
        return int((np.median(self.dists, axis=1) <= dist).sum())

    def getJointNumFramesWithinMaxDist(self, dist: float, joint: int) -> int:
        """Frames where one specific joint is within `dist` mm
        (handpose_evaluation.py:221-228)."""
        return int((self.dists[:, joint] <= dist).sum())

    def getFractionWithinMaxDist(self, dist: float) -> float:
        return self.getNumFramesWithinMaxDist(dist) / self.dists.shape[0]

    def successCurve(self, thresholds: Optional[np.ndarray] = None):
        """(thresholds, fraction of frames with max-joint error <= t)."""
        if thresholds is None:
            thresholds = np.arange(0.0, self.plot_max_dist + 1.0, 1.0)
        frac = (self.dists.max(axis=1)[None, :] <= thresholds[:, None]).mean(axis=1)
        return thresholds, frac

    # ------------------------------------------------------------------
    def plotEvaluation(self, name: str, methodName="Ours", baseline=None):
        """Threshold curve + per-joint mean/max bar charts -> PDFs
        (handpose_evaluation.py:230-346).  `baseline` is a list of
        (label, HandposeEvaluation) pairs."""
        from deepprior_tpu.eval.plots import plot_evaluation

        return plot_evaluation(self, name, methodName, baseline or [])

    def plotResult(self, dpt, gtcrop, joint_2d, name=None, showGT=True):
        """2D skeleton overlay on a depth patch
        (handpose_evaluation.py:348-433)."""
        from deepprior_tpu.eval.plots import plot_result

        return plot_result(self, dpt, gtcrop, joint_2d, name, showGT)

    def plotJoints(self, ax, joint, color="nice", jcolor=None, annoscale=1):
        """Draw this dataset's skeleton + joint markers on a matplotlib
        axis or an (H, W, 3) uint8 image (handpose_evaluation.py:435-487)."""
        from deepprior_tpu.eval.plots import plot_joints

        return plot_joints(self, ax, joint, color, jcolor, annoscale)

    def getPCL(self, dpt, T) -> np.ndarray:
        """(N, 3) metric point cloud of a cropped frame: pixel coords map
        back through crop transform T, then the dataset camera
        back-projects (handpose_evaluation.py:730, 843, 906 — per-dataset
        `<DS>Importer.depthToPCL` dispatch)."""
        if self.camera is None:
            raise NotImplementedError(
                "use a per-dataset evaluation class (eval/datasets.py)"
            )
        return self.camera.depth_to_pcl(dpt, crop_transform=T)
