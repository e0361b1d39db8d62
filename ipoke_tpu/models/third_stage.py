"""Third stage: predict the second stage's residual from (encoded) optical
flow — so pokes/flow can be *hallucinated* rather than measured at inference.

Two variants, mirroring the fork:

* ``FlowMotionModel`` (reference ``models/flow_motion.py`` /
  ``opticalFlowINN.py``): a conv FlowVAE encodes the flow map to a spatial
  latent; an unconditional multi-scale MaCow INN maps
  ``[flow_latent, noise]`` onto the *conv* second stage's residual space.
  Loss = flow NLL + w_recon * smooth-L1(z, second_stage.forward_density)
  (reference flow_motion.py:182-191).
* ``ThirdStageFC`` (reference ``models/third_stage_video_fc.py``): a BigAE
  encodes the flow map to a vector latent; an unconditional (or
  poke-conditioned, reference ``third_stage_video_fc_conditional.py``) flat
  coupling INN aligns it with an FC second stage's residual.
  Loss = flow NLL + w_recon * MSE (reference ``:227-237``), with the
  recon-weight doubling schedule (``:197-199``).

The composed capability: z_flow -> INN -> residual -> second-stage inverse ->
first-stage decode = video synthesis WITHOUT ground-truth flow.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct

from ..core.optim import zero_buffer_grads
from ..flows import MultiScaleInternal, flow_loss
from ..flows.fc import ConditionalFlatFlow, UnconditionalFlatFlow
from ..nn.encoders import ConvDecoder, ConvEncoder
from .big_ae import BigAE
from .second_stage import FlowTrainState, SecondStageModel


class ConvFlowVAE(nn.Module):
    """Conv VAE over flow maps -> spatial latent (reference
    ``models/opticalFlow/models.py`` FlowVAE/FlowVAE3)."""

    spatial_size: int
    bottleneck_channels: int = 8
    nf_max: int = 128
    min_spatial_size: int = 8
    dtype: Any = None

    def setup(self):
        import numpy as np

        n_stages = int(np.log2(self.spatial_size // self.min_spatial_size))
        self.encoder = ConvEncoder(
            nf_in=2, nf_max=self.nf_max, n_stages=n_stages, variational=False,
            dtype=self.dtype,
        )
        self.to_mu = nn.Conv(self.bottleneck_channels, (3, 3), padding=1,
                             dtype=self.dtype)
        self.to_logvar = nn.Conv(self.bottleneck_channels, (3, 3), padding=1,
                                 dtype=self.dtype)
        self.from_z = nn.Conv(self.nf_max, (3, 3), padding=1, dtype=self.dtype)
        self.decoder = ConvDecoder(
            nf_in=self.nf_max,
            in_channels=(self.nf_max,) + self.encoder.depths,
            out_channels=2, dtype=self.dtype,
        )

    def encode(self, x, rng=None, train: bool = False):
        h, *_ = self.encoder(x, train=train)
        mu, logvar = self.to_mu(h), jnp.clip(self.to_logvar(h), -30.0, 20.0)
        if rng is None:
            return mu, mu, logvar
        z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mu.shape,
                                                           mu.dtype)
        return z, mu, logvar

    def decode(self, z, train: bool = False):
        return self.decoder(self.from_z(z), train=train)

    def __call__(self, x, rng=None, train: bool = False):
        z, mu, logvar = self.encode(x, rng, train=train)
        return self.decode(z, train=train), mu, logvar


def smooth_l1(a, b, beta: float = 1.0):
    d = jnp.abs(a - b)
    return jnp.mean(jnp.where(d < beta, 0.5 * d**2 / beta, d - 0.5 * beta))


class ThirdStageState(struct.PyTreeNode):
    params: Any
    opt: Any
    step: jnp.ndarray
    weight_recon: jnp.ndarray


class FlowMotionModel:
    """Conv third stage over a frozen conv ``SecondStageModel``.

    frozen dict gains a ``"flow_vae"`` bundle (params of ConvFlowVAE).
    """

    def __init__(self, config, second_stage: SecondStageModel,
                 flow_vae: ConvFlowVAE):
        self.config = config
        self.second_stage = second_stage
        self.flow_vae = flow_vae
        arch = config["architecture"]
        self.z_total = second_stage.flow_in_channels
        self.z_flow = flow_vae.bottleneck_channels
        assert self.z_total >= self.z_flow
        self.inn = MultiScaleInternal(
            num_steps=tuple(arch.get("num_steps", (2, 2))),
            in_channels=self.z_total,
            hidden_channels=int(arch.get("flow_mid_channels_factor", 4)
                                * self.z_total),
            h_channels=0,
            factor=int(arch.get("factor", 8)),
            transform=arch.get("transform", "affine"),
            prior_transform=arch.get("prior_transform", "affine"),
            kernel_size=tuple(arch.get("kernel_size", (2, 3))),
            activation=arch.get("activation", "elu"),
        )
        self.s = second_stage.min_spatial_size

    def init(self, rng):
        return {"inn": self.inn.init(
            rng, (1, self.s, self.s, self.z_total))}

    def make_flow_input(self, frozen, batch, rng, reverse=False):
        if reverse:
            b = batch["images"].shape[0]
            return jax.random.normal(rng, (b, self.s, self.s, self.z_total))
        r1, r2 = jax.random.split(rng)
        z, mu, logvar = self.flow_vae.apply(
            {"params": frozen["flow_vae"].params,
             "batch_stats": frozen["flow_vae"].stats},
            batch["flow"], rng=r1, method=ConvFlowVAE.encode,
        )
        noise = jax.random.normal(
            r2, (*z.shape[:-1], self.z_total - self.z_flow), z.dtype)
        return jnp.concatenate([z, noise], axis=-1)

    def forward_density(self, params, frozen, batch, rng):
        flow_input = self.make_flow_input(frozen, batch, rng)
        return self.inn.forward(params["inn"],
                                jax.lax.stop_gradient(flow_input), None)

    def forward_sample_flow(self, params, frozen, batch, rng):
        """z ~ N(0, I) -> INN inverse -> flow-VAE decode = hallucinated flow."""
        z = self.make_flow_input(frozen, batch, rng, reverse=True)
        out = self.inn.inverse(params["inn"], z, None)
        return self.flow_vae.apply(
            {"params": frozen["flow_vae"].params,
             "batch_stats": frozen["flow_vae"].stats},
            out[..., : self.z_flow], method=ConvFlowVAE.decode,
        )

    def forward_video_from_flow(self, params, ss_params, frozen, batch, rng,
                                length: int):
        """The composed fork capability: measured/encoded flow -> INN ->
        second-stage residual -> motion latent -> video (no poke needed)."""
        residual, _ = self.forward_density(params, frozen, batch, rng)
        cond = self.second_stage.embed_conditioning(frozen, batch, ss_params)
        motion = self.second_stage.flow.inverse(ss_params["flow"], residual,
                                                cond)
        if self.second_stage.augment_input:
            motion = motion[..., : self.second_stage.first_stage.z_dim]
        return self.second_stage.decode_first_stage(
            frozen, motion, batch["images"][:, 0], length)


def make_flow_motion_train_step(model: FlowMotionModel, ss_params, tx) -> Callable:
    spatial_mean = bool(model.config["training"].get("spatial_mean", False))

    def step(state: ThirdStageState, frozen, batch, rng):
        r1, r2, r3 = jax.random.split(rng, 3)
        target, _ = model.second_stage.forward_density(
            ss_params, frozen, batch, r2)
        target = jax.lax.stop_gradient(target)

        def loss_fn(params):
            out, logdet = model.forward_density(params, frozen, batch, r1)
            loss, log = flow_loss(out, logdet, rng=r3,
                                  spatial_mean=spatial_mean)
            recon = smooth_l1(out, target)
            log["reconstruction_loss"] = recon
            loss = loss + state.weight_recon * recon
            log["flow_loss"] = loss
            return loss, log

        (loss, log), grads = jax.value_and_grad(
            loss_fn, has_aux=True, allow_int=True)(state.params)
        grads = zero_buffer_grads(grads, state.params)
        upd, opt = tx.update(grads, state.opt, state.params)
        params = optax.apply_updates(state.params, upd)
        return state.replace(params=params, opt=opt,
                             step=state.step + 1), log

    return step


class ThirdStageFC:
    """Vector third stage over a frozen FC second stage + frozen BigAE
    (reference ``third_stage_video_fc.py`` / ``..._conditional.py``)."""

    def __init__(self, config, flow_encoder: BigAE,
                 second_stage_density: Callable, poke_cond_dim: int = 0):
        """``second_stage_density(frozen, batch, rng) -> residual (B, D)``."""
        self.config = config
        arch = config["architecture"]
        self.flow_encoder = flow_encoder
        self.second_stage_density = second_stage_density
        self.z_total = int(arch["flow_in_channels"])
        self.z_flow = flow_encoder.z_dim
        assert self.z_total >= self.z_flow
        self.conditional = poke_cond_dim > 0
        mid = int(arch.get("flow_mid_channels",
                           arch.get("flow_mid_channels_factor", 4)
                           * self.z_total))
        if self.conditional:
            self.inn = ConditionalFlatFlow(
                self.z_total, poke_cond_dim, mid,
                int(arch.get("flow_hidden_depth", 2)),
                int(arch.get("n_flows", 20)))
        else:
            self.inn = UnconditionalFlatFlow(
                self.z_total, mid, int(arch.get("flow_hidden_depth", 2)),
                int(arch.get("n_flows", 20)))

    def init(self, rng):
        return {"inn": self.inn.init(rng, (1, self.z_total))}

    def encode_flow(self, frozen, x):
        """Encoder indirection: the repo's flax BigAE (apply with
        method=...) or a ported reference FCAE (models/biggan_compat.py
        BigAECompat — its variables dict rides in the bundle's params)."""
        if hasattr(self.flow_encoder, "apply"):
            return self.flow_encoder.apply(
                {"params": frozen["flow_enc"].params}, x,
                method=BigAE.encode)
        return self.flow_encoder.encode(frozen["flow_enc"].params, x)

    def decode_flow_latent(self, frozen, z_flow):
        """Flow decode (for sampling + the EE metrics against the
        AE-reconstructed ground truth, reference third_stage_video_fc.py
        :341-347)."""
        if hasattr(self.flow_encoder, "apply"):
            return self.flow_encoder.apply(
                {"params": frozen["flow_enc"].params}, z_flow,
                method=BigAE.decode)
        return self.flow_encoder.decode(frozen["flow_enc"].params, z_flow)

    def make_flow_input(self, frozen, batch, rng, reverse=False):
        if reverse:
            b = batch["flow"].shape[0]
            return jax.random.normal(rng, (b, self.z_total))
        r1, r2 = jax.random.split(rng)
        mu, logvar = self.encode_flow(frozen, batch["flow"])
        z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(r1, mu.shape)
        rest = self.z_total - self.z_flow
        if rest:
            z = jnp.concatenate(
                [z, jax.random.normal(r2, (z.shape[0], rest))], axis=-1)
        return z

    def forward_density(self, params, frozen, batch, rng, h=None):
        z = self.make_flow_input(frozen, batch, rng)
        return self.inn.forward(params["inn"], jax.lax.stop_gradient(z), h)

    def forward_sample_flow(self, params, frozen, batch, rng, h=None,
                            z=None):
        """z ~ N(0,I) (or an explicit residual, reference forward_sample's
        ``flow_input=`` seeding, third_stage_video_fc_conditional.py:215-233)
        -> INN inverse -> BigAE decode = hallucinated optical flow."""
        if z is None:
            z = self.make_flow_input(frozen, batch, rng, reverse=True)
        out = self.inn.inverse(params["inn"], z, h)
        flow = self.decode_flow_latent(frozen, out[:, : self.z_flow])
        return flow, out[:, self.z_flow :]


def make_third_stage_fc_train_step(model: ThirdStageFC, tx,
                                   cond_fn: Optional[Callable] = None) -> Callable:
    def step(state: ThirdStageState, frozen, batch, rng):
        r1, r2, r3 = jax.random.split(rng, 3)
        target = jax.lax.stop_gradient(
            model.second_stage_density(frozen, batch, r2))
        h = cond_fn(frozen, batch) if cond_fn is not None else None

        def loss_fn(params):
            out, logdet = model.forward_density(params, frozen, batch, r1, h)
            loss, log = flow_loss(out, logdet, rng=r3)
            recon = jnp.mean((out - target.reshape(out.shape)) ** 2)
            log["reconstruction_loss"] = recon
            loss = loss + state.weight_recon * recon
            log["flow_loss"] = loss
            return loss, log

        (loss, log), grads = jax.value_and_grad(
            loss_fn, has_aux=True, allow_int=True)(state.params)
        grads = zero_buffer_grads(grads, state.params)
        upd, opt = tx.update(grads, state.opt, state.params)
        params = optax.apply_updates(state.params, upd)
        return state.replace(params=params, opt=opt,
                             step=state.step + 1), log

    return step


def create_third_stage_state(rng, model, tx,
                             weight_recon: float = 1.0) -> ThirdStageState:
    params = model.init(rng)
    return ThirdStageState(
        params=params, opt=tx.init(params), step=jnp.zeros((), jnp.int32),
        weight_recon=jnp.asarray(weight_recon),
    )


def double_recon_weight_schedule(state: ThirdStageState, epoch: int,
                                 initial: float, every: int = 10
                                 ) -> ThirdStageState:
    """Reference third_stage_video_fc.py:197-199: x2 at the START of every
    epoch with ``epoch % every == every - 1`` — so the weight is 2x initial
    DURING epochs 9-18, 4x during 19-28, ... == initial * 2^((epoch+1)//10).

    Pure function of the epoch, so the per-batch fit loop may call it any
    number of times without compounding — and resume lands on the right
    weight."""
    return state.replace(
        weight_recon=jnp.asarray(initial * 2.0 ** ((epoch + 1) // every),
                                 jnp.float32))
