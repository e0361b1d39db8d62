"""NN module library (flax.linen, NHWC / NTHWC)."""

from .blocks import (
    AdaIN,
    Conv2dBlock,
    Conv2dTransposeBlock,
    NormConv2d,
    ResBlock,
    Spade,
)
from .discriminators import (
    PatchDiscriminator2D,
    ResNet3DDiscriminator,
    adaptive_disc_weight,
    bce_d_loss,
    fmap_loss,
    gen_loss,
    gradient_penalty,
    hinge_d_loss,
)
from .encoders import (
    ConvDecoder,
    ConvEncoder,
    FirstStageWrapper,
    SpadeCondConvDecoder,
)
from .gru import ConvGRU, ConvGRUCell
from .lpips import init_lpips_params, load_torch_lpips_npz, lpips
from .motion import BasicBlock3d, ResNetMotionEncoder
from .raft import RAFT, RAFTConfig, load_torch_raft_npz, raft_estimator
