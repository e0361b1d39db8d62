"""Stage assemblies (L3 equivalents)."""

from .big_ae import BigAE, BigGANGenerator, ResnetEncoder, gaussian_kl
from .fc_baseline import (
    BaselineFCEncoder,
    BaselineFCGenerator,
    FCBaselineModel,
    FirstStageFCWrapper,
    SecondStageModelFC,
)
from .first_stage import (
    FirstStageModel,
    build_first_stage,
    create_first_stage_state,
    make_first_stage_train_step,
)
from .image_ae import build_image_ae, create_image_ae_state, make_image_ae_train_step
from .poke_vae import PokeVAEModel, RNNMotionModel
from .second_stage import (
    FrozenBundle,
    SecondStageModel,
    create_second_stage_state,
    make_second_stage_train_step,
)
from .third_stage import (
    ConvFlowVAE,
    FlowMotionModel,
    ThirdStageFC,
    create_third_stage_state,
    make_flow_motion_train_step,
    make_third_stage_fc_train_step,
)
