"""deepprior_tpu — a TPU-native (JAX/XLA/Pallas/pjit) hand-pose estimation framework.

A ground-up rebuild of the capabilities of `moberweger/deep-prior-pp`
(DeepPrior++, ICCV-W 2017: 3D hand pose estimation from a single depth image),
re-designed for TPU hardware:

- camera models + crop geometry as batched, jit-compiled array programs
  (reference: src/util/handdetector.py, src/data/importers.py)
- the center-of-mass cube crop expressed as a single fused affine-warp +
  normalize pass over batched depth maps (static shapes, XLA/Pallas friendly)
  instead of the reference's per-image dynamic slicing
- on-device training-time augmentation (CoM jitter / in-plane rotation /
  cube scaling) folded into the jitted train step, replacing the reference's
  pool of multiprocessing augmentation workers (src/trainer/nettrainer.py)
- flax model zoo (PoseRegNet / ScaleNet / ResNet-47) with a 30-D PCA pose
  prior bottleneck (src/net/)
- optax-based trainer with the reference's LR schedule, NaN sentinels,
  validation observers and best-weights early stopping
- data-parallel + tensor-parallel scaling over a `jax.sharding.Mesh`
- an evaluation suite (mean/max/per-joint errors, frames-within-threshold)
  and a realtime detect->refine->regress pipeline compiled as one XLA program
"""

__version__ = "0.1.0"

from deepprior_tpu.camera import Camera, ICVL_CAMERA, NYU_CAMERA, MSRA15_CAMERA


def __getattr__(name):
    # lazy subpackage access: deepprior_tpu.models / ops / train / ...
    import importlib

    if name in (
        "camera", "geometry", "ops", "data", "models", "train",
        "parallel", "eval", "realtime", "utils", "prior",
    ):
        return importlib.import_module(f"deepprior_tpu.{name}")
    raise AttributeError(name)


__all__ = [
    "Camera",
    "ICVL_CAMERA",
    "NYU_CAMERA",
    "MSRA15_CAMERA",
]
