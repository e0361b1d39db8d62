"""Second-stage conditional INN (the core generative model).

Rebuild of reference ``models/second_stage_video.py`` (``PokeMotionModel``):
a multi-scale MaCow cINN maps the frozen first stage's motion latent
``z_m (B, s, s, z_dim)`` <-> N(0, I), conditioned on
``h = [phi(x_0), phi(poke)]`` from the frozen conditioner / poke embedder.

Design differences (TPU-first):
* frozen sub-models are explicit param pytrees passed to the jitted step
  (no module surgery / ``state_dict`` tricks — reference ``:193-247``);
* density and sampling directions are separately jitted pure functions;
* optional augmented input channels with learned scale/shift
  (reference ``:315-319``) live in the trainable param tree.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..core.optim import zero_buffer_grads
from ..flows import build_macow_transformer, flow_loss
from ..flows.base import count_params
from .first_stage import FirstStageModel
from ..nn.encoders import FirstStageWrapper


class FrozenBundle(struct.PyTreeNode):
    """Variables of a frozen sub-model (params + any batch stats)."""

    params: Any
    stats: Any = struct.field(default_factory=dict)


class FlowTrainState(struct.PyTreeNode):
    params: Any      # {'flow': ..., ['scale_augment','shift_augment']}
    opt: Any
    step: jnp.ndarray


class SecondStageModel:
    """Static composition object; all methods are pure functions of params."""

    def __init__(
        self,
        config,
        first_stage: FirstStageModel,
        conditioner: Optional[FirstStageWrapper],
        poke_embedder: FirstStageWrapper,
    ):
        self.config = config
        arch = config["architecture"]
        self.first_stage = first_stage
        self.conditioner = conditioner
        self.poke_embedder = poke_embedder
        self.use_cond = conditioner is not None
        self.poke_key = "flow" if config.get("poke_embedder", {}).get(
            "flow_ae", False) else "poke"
        self.embed_poke_and_image = poke_embedder.poke_and_image

        self.augment_input = bool(arch.get("augmented_input", False))
        self.augment_channels = int(arch.get("augment_channels", 0))
        z_dim = first_stage.z_dim
        flow_in = z_dim + (self.augment_channels if self.augment_input else 0)
        h_channels = poke_embedder.nf_max + (
            conditioner.nf_max if self.use_cond else 0
        )
        flow_arch = dict(arch)
        flow_arch.update(
            flow_in_channels=flow_in,
            h_channels=h_channels,
            flow_mid_channels=int(
                arch.get("flow_mid_channels_factor", 8) * flow_in
            ),
        )
        self.flow = build_macow_transformer(flow_arch)
        self.flow_in_channels = flow_in
        self.min_spatial_size = first_stage.min_spatial_size
        # conv_adapt: learned spatial adapters when the poke-embedder /
        # conditioner latent size differs from the first stage's (reference
        # second_stage_video.py:125-141: strided conv to downsample,
        # Conv2dTransposeBlock(norm=group) to upsample; params live in the
        # trainable tree, applied inside make_flow_input :286-297)
        self.adapt_poke = self._make_adapter(
            poke_embedder.min_spatial_size, self.min_spatial_size,
            poke_embedder.nf_max)
        self.adapt_cond = self._make_adapter(
            conditioner.min_spatial_size, self.min_spatial_size,
            conditioner.nf_max) if self.use_cond else None

    @staticmethod
    def _make_adapter(src: int, dst: int, nf: int):
        from flax import linen as nn

        from ..nn.blocks import Conv2dTransposeBlock

        if src == dst:
            return None
        if src > dst:
            assert src % dst == 0, (src, dst)
            f = src // dst
            return nn.Conv(nf, (3, 3), strides=(f, f), padding=1)
        assert dst % src == 0, (src, dst)
        return Conv2dTransposeBlock(out_dim=nf, ks=3, st=dst // src,
                                    norm="group")

    # -- init ---------------------------------------------------------------
    def init(self, rng) -> Any:
        s = self.min_spatial_size
        shape = (1, s, s, self.flow_in_channels)
        k1, k2, k3 = jax.random.split(rng, 3)
        params = {"flow": self.flow.init(k1, shape)}
        if self.augment_input:
            params["scale_augment"] = jnp.ones((self.augment_channels,))
            params["shift_augment"] = jnp.zeros((self.augment_channels,))
        if self.adapt_poke is not None:
            src = self.poke_embedder.min_spatial_size
            params["adapt_poke"] = self.adapt_poke.init(
                k2, jnp.zeros((1, src, src, self.poke_embedder.nf_max))
            )["params"]
        if self.adapt_cond is not None:
            src = self.conditioner.min_spatial_size
            params["adapt_cond"] = self.adapt_cond.init(
                k3, jnp.zeros((1, src, src, self.conditioner.nf_max))
            )["params"]
        return params

    # -- frozen embeddings ---------------------------------------------------
    def embed_conditioning(self, frozen, batch, params=None):
        """h = [phi(x_0), phi(poke)] (reference make_flow_input :266-326).

        ``params`` carries the trainable conv_adapt adapters (if any); the
        embedders themselves stay frozen."""
        poke = batch[self.poke_key]
        X = batch["images"]
        if self.embed_poke_and_image:
            poke = jnp.concatenate([poke, X[:, 0]], axis=-1)
        poke_emb, *_ = self.poke_embedder.apply(
            {"params": frozen["poke"].params,
             "batch_stats": frozen["poke"].stats},
            poke, train=False, method=FirstStageWrapper.encode,
        )
        if self.adapt_poke is not None:
            assert params is not None, "conv_adapt requires trainable params"
            poke_emb = self.adapt_poke.apply(
                {"params": params["adapt_poke"]}, poke_emb)
        if not self.use_cond:
            return poke_emb
        z, mean, _ = self.conditioner.apply(
            {"params": frozen["cond"].params,
             "batch_stats": frozen["cond"].stats},
            X[:, 0], train=False, method=FirstStageWrapper.encode,
        )
        cond = z if self.conditioner.deterministic else mean
        if self.adapt_cond is not None:
            assert params is not None, "conv_adapt requires trainable params"
            cond = self.adapt_cond.apply(
                {"params": params["adapt_cond"]}, cond)
        return jnp.concatenate([cond, poke_emb], axis=-1)

    def encode_first_stage(self, frozen, X, rng):
        motion, mu, logvar = self.first_stage.apply(
            {"params": frozen["fs"].params, "batch_stats": frozen["fs"].stats},
            X, rng=rng, method=FirstStageModel.encode,
        )
        return motion

    def decode_first_stage(self, frozen, motion, start_frame, length: int):
        return self.first_stage.apply(
            {"params": frozen["fs"].params, "batch_stats": frozen["fs"].stats},
            motion, start_frame, length, False, method=FirstStageModel.decode,
        )

    # -- directions -----------------------------------------------------------
    def _augment(self, params, flow_input, rng):
        if not self.augment_input:
            return flow_input
        aug = jax.random.normal(
            rng, (*flow_input.shape[:-1], self.augment_channels),
            flow_input.dtype,
        )
        aug = params["scale_augment"] * aug + params["shift_augment"]
        return jnp.concatenate([flow_input, aug], axis=-1)

    def forward_density(self, params, frozen, batch, rng):
        """(z, logdet) for NLL training (reference :356-361)."""
        r1, r2 = jax.random.split(rng)
        cond = self.embed_conditioning(frozen, batch, params)
        motion = self.encode_first_stage(frozen, batch["images"], r1)
        flow_input = self._augment(params, jax.lax.stop_gradient(motion), r2)
        return self.flow.forward(params["flow"], flow_input, cond)

    def forward_sample(self, params, frozen, batch, rng, length: int):
        """Sample a video: z ~ N(0,I) -> flow^{-1} -> first-stage decode
        (reference :337-354)."""
        X = batch["images"]
        s = self.min_spatial_size
        cond = self.embed_conditioning(frozen, batch, params)
        # base sample drawn at the flow's OUTPUT shape — differs from the
        # input shape for reshaping multistacks (reference make_flow_input,
        # second_stage_video.py:300-311); latent dtype follows the input
        # (bf16 end-to-end under mixed precision / bf16 weight streaming)
        z_shape = self.flow.output_shape((s, s, self.flow_in_channels))
        z = jax.random.normal(rng, (X.shape[0], *z_shape), X.dtype)
        motion = self.flow.inverse(params["flow"], z, cond)
        if self.augment_input:
            motion = motion[..., : self.first_stage.z_dim]
        return self.decode_first_stage(frozen, motion, X[:, 0], length)

    def ddi(self, params, frozen, batch, rng):
        """Data-dependent init of the flow from one batch."""
        r1, r2 = jax.random.split(rng)
        cond = self.embed_conditioning(frozen, batch, params)
        motion = self.encode_first_stage(frozen, batch["images"], r1)
        flow_input = self._augment(params, motion, r2)
        _, _, new_flow = self.flow.ddi(params["flow"], flow_input, cond)
        out = dict(params)
        out["flow"] = new_flow
        return out


def make_second_stage_train_step(model: SecondStageModel, tx) -> Callable:
    tcfg = model.config["training"]
    spatial_mean = bool(tcfg.get("spatial_mean", False))
    # master-weights mixed precision (training.mixed_prec_master): params and
    # frozen nets are bf16-resident (set up by the experiment), so the batch
    # must enter in bf16 too — a bf16 param x fp32 input matmul promotes to
    # fp32 and defeats the halved HBM traffic.  Loss/logdet reductions are
    # fp32 (flows/loss.py, flows/primitives._sum_logdet)
    mixed = bool(tcfg.get("mixed_prec_master", False))

    def step(state: FlowTrainState, frozen, batch, rng):
        if mixed:
            from ..core.optim import cast_floats

            batch = cast_floats(batch, jnp.bfloat16)
        r1, r2 = jax.random.split(rng)

        def loss_fn(params):
            z, logdet = model.forward_density(params, frozen, batch, r1)
            loss, log = flow_loss(z, logdet, rng=r2, spatial_mean=spatial_mean)
            return loss, log

        # allow_int: shuffle permutations are int32 buffer leaves; their
        # float0 cotangents are zeroed below and masked in the optimizer
        (loss, log), grads = jax.value_and_grad(
            loss_fn, has_aux=True, allow_int=True
        )(state.params)
        grads = zero_buffer_grads(grads, state.params)
        upd, opt = tx.update(grads, state.opt, state.params)
        params = optax.apply_updates(state.params, upd)
        return state.replace(params=params, opt=opt, step=state.step + 1), log

    return step


def create_second_stage_state(rng, model: SecondStageModel, tx) -> FlowTrainState:
    params = model.init(rng)
    return FlowTrainState(
        params=params, opt=tx.init(params), step=jnp.zeros((), jnp.int32)
    )
