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
from deepprior_tpu.ops.augment import augment_batch
from deepprior_tpu.ops.resize import resize_bilinear_nd, resize_nearest
from deepprior_tpu.ops.refine_cnn import CNNComRefiner

__all__ = [
    "augment_batch",
    "resize_bilinear_nd",
    "resize_nearest",
    "CNNComRefiner",
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
