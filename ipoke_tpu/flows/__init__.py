"""Invertible-flow engine (functional, TPU-first).

Public surface mirrors the reference INN wrappers
(``models/modules/INN/INN.py``): :func:`build_macow_transformer` is the
equivalent of ``SupervisedMacowTransformer`` / ``UnsupervisedMaCowTransformer``
— pass ``h_channels=0`` for the unconditional case.
"""

from .base import Chain, Flow, count_params, trainable_mask
from .loss import flow_loss, nll
from .macow import (
    MaskedConvFlow,
    MultiScaleInternal,
    MultiScalePrior,
    MultiscaleStack,
    NICE2d,
    ScannedSteps,
    make_macow_step,
    make_macow_unit,
)
from .primitives import ActNorm, InvConvLU, Shuffle, SpaceToDepth


def build_macow_transformer(arch) -> MultiScaleInternal:
    """Build the multi-scale MaCow cINN from an ``architecture`` config block
    with the reference's key names (``INN.py:447-482``):

    flow_in_channels, flow_mid_channels (or flow_mid_channels_factor),
    h_channels, factor, num_steps, kernel_size, transform, prior_transform,
    activation, use1x1, condition_nice.
    """
    get = arch.get if hasattr(arch, "get") else lambda k, d=None: getattr(arch, k, d)
    in_c = get("flow_in_channels")
    mid = get("flow_mid_channels")
    if mid is None:
        mid = int(get("flow_mid_channels_factor", 8) * in_c)
    if get("multistack", False):
        # reference MacowTransformerMultiStep (INN.py:424-445)
        return MultiscaleStack(
            levels=tuple(tuple(l) for l in get("levels")),
            factors=tuple(get("factors")),
            in_channels=in_c,
            mid_channels_factor=int(get("flow_mid_channels_factor", 8)),
            h_channels=int(get("h_channels", 0)),
            reshape=get("reshape", "none"),
            transform=get("transform", "affine"),
            prior_transform=get("prior_transform", "affine"),
            kernel_size=tuple(get("kernel_size", (2, 3))),
            activation=get("activation", "elu"),
            use_1x1=bool(get("use1x1", False)),
            condition_nice=bool(get("condition_nice", False)),
        )
    return MultiScaleInternal(
        num_steps=tuple(get("num_steps")),
        in_channels=in_c,
        hidden_channels=mid,
        h_channels=int(get("h_channels", 0)),
        factor=int(get("factor", 16)),
        transform=get("transform", "affine"),
        prior_transform=get("prior_transform", "affine"),
        kernel_size=tuple(get("kernel_size", (2, 3))),
        activation=get("activation", "elu"),
        use_1x1=bool(get("use1x1", False)),
        condition_nice=bool(get("condition_nice", False)),
    )
