from deepprior_tpu.utils.helpers import (
    cartesian,
    chunks,
    gaussian_kernel,
    rgb_to_gray,
    shuffle_many_inplace,
)

__all__ = [
    "cartesian",
    "chunks",
    "gaussian_kernel",
    "rgb_to_gray",
    "shuffle_many_inplace",
]
