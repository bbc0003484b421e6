"""Realtime inference: the fused detect->crop->regress->decode XLA program
and the host-side camera pipeline around it."""

from deepprior_tpu.realtime.batcher import MicroBatchServer
from deepprior_tpu.realtime.fused import FusedEstimator
from deepprior_tpu.realtime.pipeline import RealtimeHandposePipeline

__all__ = ["FusedEstimator", "MicroBatchServer", "RealtimeHandposePipeline"]
