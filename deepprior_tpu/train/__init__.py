"""Training layer: optimizers, schedules, the jitted trainer, checkpoints."""

from deepprior_tpu.train.optimizer import lr_of_ep, reference_adam, reference_rmsprop
from deepprior_tpu.train.trainer import TrainConfig, TrainData, Trainer, TrainState

__all__ = [
    "lr_of_ep",
    "reference_adam",
    "reference_rmsprop",
    "TrainConfig",
    "TrainData",
    "Trainer",
    "TrainState",
]
