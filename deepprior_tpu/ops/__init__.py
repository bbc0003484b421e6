"""Batched, jit-compiled depth-image ops: crop geometry, CoM, augmentation."""

from deepprior_tpu.ops.crop import (
    CropConfig,
    clamp_depth,
    com_to_bounds,
    crop_transform,
    crop3d,
    normalize_crop,
    normalized_crop,
    warp_patch,
)
from deepprior_tpu.ops.com import calculate_com, check_image, refine_com_iterative

__all__ = [
    "CropConfig",
    "clamp_depth",
    "com_to_bounds",
    "crop_transform",
    "crop3d",
    "normalize_crop",
    "normalized_crop",
    "warp_patch",
    "calculate_com",
    "check_image",
    "refine_com_iterative",
]
