"""Realtime inference: the fused detect->crop->regress->decode XLA program
and the host-side camera pipeline around it."""

from deepprior_tpu.realtime.batcher import MicroBatchServer
from deepprior_tpu.realtime.fused import FusedEstimator

__all__ = ["FusedEstimator", "MicroBatchServer"]
