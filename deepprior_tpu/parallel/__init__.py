"""Scaling layer: device meshes, shardings, distributed training.

The reference is strictly single-GPU (SURVEY.md §2.8: no NCCL/MPI, no data
parallelism — its only concurrency is host-side augmentation workers).
This package is the capability the reference lacks: batch data-parallelism
and tensor-parallel FC layers over a `jax.sharding.Mesh`, with XLA/GSPMD
inserting the psum/all-gather collectives over ICI.
"""

from deepprior_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
)
from deepprior_tpu.parallel.serve import ShardedEstimator
from deepprior_tpu.parallel.train_dist import DistributedTrainer

__all__ = [
    "make_mesh",
    "batch_sharding",
    "param_shardings",
    "replicated",
    "DistributedTrainer",
    "ShardedEstimator",
]
