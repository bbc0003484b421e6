"""Evaluation layer: metric suite, per-dataset skeletons, plots."""

from deepprior_tpu.eval.metrics import HandposeEvaluation
from deepprior_tpu.eval.datasets import (
    ICVLHandposeEvaluation,
    MSRAHandposeEvaluation,
    NYUAllHandposeEvaluation,
    NYUHandposeEvaluation,
    evaluation_for,
)

__all__ = [
    "HandposeEvaluation",
    "ICVLHandposeEvaluation",
    "NYUHandposeEvaluation",
    "NYUAllHandposeEvaluation",
    "MSRAHandposeEvaluation",
    "evaluation_for",
]
