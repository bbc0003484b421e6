"""Model zoo: PoseRegNet, ScaleNet, ResNet-47 as flax modules.

TPU-native redesign of reference src/net/: the Theano layer-graph machinery
(NetBase reflection over *Params lists, netbase.py:52-477) is replaced by
plain flax modules; XLA owns compilation and memory.  Architectures and
numerics (layer sizes, pooling, dropout p, the PCA bottleneck head) match
the reference exactly.
"""

from deepprior_tpu.models.poseregnet import PoseRegNet, PoseRegNetConfig
from deepprior_tpu.models.scalenet import ScaleNet, ScaleNetConfig
from deepprior_tpu.models.resnet import ResNet, ResNetConfig

__all__ = [
    "PoseRegNet",
    "PoseRegNetConfig",
    "ScaleNet",
    "ScaleNetConfig",
    "ResNet",
    "ResNetConfig",
]
