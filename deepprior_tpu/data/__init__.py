"""Dataset layer: base types, importers, stacking, synthetic fixtures."""

from deepprior_tpu.data.basetypes import DepthFrame, ImageSequence

__all__ = ["DepthFrame", "ImageSequence"]
