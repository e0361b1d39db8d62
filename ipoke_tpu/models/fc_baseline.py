"""FC (vector-latent) baseline tower.

Rebuild of the reference FC stack:
* ``BaselineFCEncoder`` / ``BaselineFCGenerator`` / ``FirstStageFCWrapper``
  (``models/modules/autoencoders/baseline_fc_models.py:10-100``) — conv
  encoder to 4x4 then a valid 4x4 conv to a VECTOR latent; generator =
  Dense -> 4x4 reshape -> upsampling ResBlocks with optional SPADE;
* ``FCBaseline`` first stage (``models/first_stage_motion_model.py:548-610``)
  — 3D-ResNet motion encoder with 4x4 valid heads -> vector z, dense GRU
  rollout, FC generator; trains under the same VAE-GAN step as the conv
  first stage;
* ``PokeMotionModelFC`` second stage (``models/second_stage_video_fc.py``) —
  a flat coupling cINN over the vector latent, conditioned on the FC
  image/poke embeddings.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..flows.fc import build_supervised_transformer
from ..nn.blocks import Conv2dBlock, NormConv2d, ResBlock, Spade
from ..nn.encoders import ConvEncoder
from ..nn.motion import BasicBlock3d, _gn, _stage


class BaselineFCEncoder(nn.Module):
    """Image/poke -> vector latent (reference baseline_fc_models.py:28-54)."""

    nf_in: int
    nf_max: int
    spatial_size: int
    variational: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, rng=None, train: bool = False):
        n_stages = int(np.log2(self.spatial_size // 4))
        h, *_ = ConvEncoder(
            nf_in=self.nf_in, nf_max=self.nf_max, n_stages=n_stages,
            variational=False, dtype=self.dtype,
        )(x, train=train)
        vec = NormConv2d(self.nf_max, ks=4, st=1, padding=0,
                         dtype=self.dtype)(h)
        vec = vec.reshape(vec.shape[0], -1)
        if not self.variational:
            return vec, vec, None
        mu = nn.Dense(self.nf_max, dtype=self.dtype)(vec)
        logstd = jax.nn.sigmoid(nn.Dense(self.nf_max, dtype=self.dtype)(vec))
        if rng is None:
            return mu, mu, logstd
        z = mu + jnp.exp(logstd) * jax.random.normal(rng, mu.shape, mu.dtype)
        return z, mu, logstd


class BaselineFCGenerator(nn.Module):
    """Vector -> image via Dense + upsampling ResBlocks, optional SPADE on the
    start frame (reference baseline_fc_models.py:56-100)."""

    dec_channels: Sequence[int]
    spatial_size: int
    out_channels: int = 3
    use_spade: bool = False
    snorm: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, z, start_frame=None, train: bool = False):
        nf0 = self.dec_channels[0]
        h = nn.Dense(4 * 4 * nf0, dtype=self.dtype)(z)
        h = h.reshape(h.shape[0], 4, 4, nf0)
        for nf in self.dec_channels[1:]:
            h = ResBlock(nf, norm="none" if self.use_spade else "group",
                         upsampling=True, snorm=self.snorm,
                         dtype=self.dtype)(h, train)
            if self.use_spade:
                assert start_frame is not None
                h = Spade(nf, dtype=self.dtype)(h, start_frame)
        return Conv2dBlock(
            self.out_channels, 3, 1, 1, norm="none",
            activation="tanh" if self.out_channels == 3 else "none",
            dtype=self.dtype,
        )(h, train)


class FirstStageFCWrapper(nn.Module):
    """FC AE for the FC poke/img encoders (reference
    baseline_fc_models.py:10-26).  Presents the same ``encode`` contract as
    ``FirstStageWrapper`` but the latent is a vector."""

    spatial_size: int
    nf_in: int
    nf_max: int
    deterministic: bool = True
    poke_and_image: bool = False
    min_spatial_size: int = 1  # vector latent (reference forces 1, :66)
    dtype: Any = None

    def setup(self):
        nf_in_enc = self.nf_in + (3 if self.poke_and_image else 0)
        self.encoder_net = BaselineFCEncoder(
            nf_in=nf_in_enc, nf_max=self.nf_max,
            spatial_size=self.spatial_size,
            variational=not self.deterministic, dtype=self.dtype,
        )
        n_up = int(np.log2(self.spatial_size // 4))
        chans = [self.nf_max] + [
            max(self.nf_max // (2**i), 32) for i in range(1, n_up + 1)
        ]
        self.decoder_net = BaselineFCGenerator(
            dec_channels=chans, spatial_size=self.spatial_size,
            out_channels=self.nf_in, dtype=self.dtype,
        )

    def encode(self, x, rng=None, train: bool = False):
        return self.encoder_net(x, rng=rng, train=train)

    def decode(self, z, train: bool = False):
        return self.decoder_net(z, train=train)

    def __call__(self, x, rng=None, train: bool = False):
        z, *_ = self.encode(x, rng=rng, train=train)
        return self.decode(z, train=train)


class _VectorMotionEncoder(nn.Module):
    """3D-ResNet to a VECTOR latent: 4x4 valid conv heads (reference
    ``ResNet`` variant, motion_encoder.py:77-147)."""

    channels: Sequence[int]
    z_dim: int
    spatial_size: int
    layers: Sequence[int] = (2, 2, 2, 2)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, rng=None):
        ch = list(self.channels)
        h = nn.Conv(ch[0], (3, 7, 7), strides=(2, 2, 2),
                    padding=((1, 1), (3, 3), (3, 3)), use_bias=False,
                    dtype=self.dtype)(x)
        h = jax.nn.relu(_gn(ch[0])(h))
        for blk in _stage(ch[1], self.layers[0], (2, 1, 1), self.dtype):
            h = blk(h)
        for blk in _stage(ch[2], self.layers[1], (2, 2, 2), self.dtype):
            h = blk(h)
        for blk in _stage(ch[3], self.layers[2], (2, 2, 2), self.dtype):
            h = blk(h)
        if self.spatial_size // 2**3 > 4:
            c4 = ch[4] if len(ch) > 4 else ch[-1]
            for blk in _stage(c4, self.layers[3], (2, 2, 2), self.dtype):
                h = blk(h)
        h = jnp.mean(h, axis=1)  # collapse temporal
        mu = nn.Conv(self.z_dim, (4, 4), padding="VALID",
                     dtype=self.dtype)(h).reshape(h.shape[0], -1)
        logvar = nn.Conv(self.z_dim, (4, 4), padding="VALID",
                         dtype=self.dtype)(h).reshape(h.shape[0], -1)
        if rng is None:
            return mu, mu, logvar
        z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mu.shape,
                                                           mu.dtype)
        return z, mu, logvar


class FCBaselineModel(nn.Module):
    """FC first stage: vector motion latent + dense GRU rollout + FC
    generator with SPADE (reference ``FCBaseline``,
    first_stage_motion_model.py:548-610).  Presents the same interface as
    ``FirstStageModel`` so the VAE-GAN train step applies unchanged."""

    spatial_size: int
    z_dim: int = 128
    enc_channels: Sequence[int] = (64, 128, 256, 256, 256)
    dec_channels: Sequence[int] = (256, 256, 128, 64)
    n_gru_layers: int = 2
    max_frames: int = 10
    full_seq: bool = True
    use_spade: bool = True
    deterministic: bool = False
    dtype: Any = None

    # vector latent: "min_spatial_size" forced to 1
    min_spatial_size: int = 1

    def setup(self):
        self.enc_motion = _VectorMotionEncoder(
            channels=self.enc_channels, z_dim=self.z_dim,
            spatial_size=self.spatial_size, dtype=self.dtype,
        )
        self.cells = [
            nn.GRUCell(features=self.z_dim, name=f"gru_{i}")
            for i in range(self.n_gru_layers)
        ]
        self.gen = BaselineFCGenerator(
            dec_channels=list(self.dec_channels),
            spatial_size=self.spatial_size, out_channels=3,
            use_spade=self.use_spade, dtype=self.dtype,
        )

    def encode(self, X, rng=None):
        X_in = X if self.full_seq else X[:, 1:]
        return self.enc_motion(X_in, rng=rng)

    def decode(self, motion, start_frame, length: int, train: bool = False):
        hidden = [motion] * self.n_gru_layers
        hs = []
        for _ in range(length):
            inp = motion
            for i, cell in enumerate(self.cells):
                hidden[i], _ = cell(hidden[i], inp)
                inp = hidden[i]
            hs.append(hidden[-1])
        if not train:
            # ONE batched generator apply over (B*T) (B-major flatten;
            # identical math — see FirstStageModel.decode)
            B = motion.shape[0]
            flat = jnp.stack(hs, axis=1).reshape(B * length, -1)
            sf = jnp.repeat(start_frame, length, axis=0)
            frames = self.gen(flat, sf, train=False)
            return frames.reshape(B, length, *frames.shape[1:])
        return jnp.stack(
            [self.gen(h, start_frame, train=train) for h in hs], axis=1)

    def __call__(self, X, rng=None, train: bool = False):
        motion, mu, logvar = self.encode(X, rng)
        X_hat = self.decode(motion, X[:, 0], X.shape[1] - 1, train=train)
        return X_hat, mu, logvar


class SecondStageModelFC:
    """cINN over the FC first stage's vector latent (reference
    ``PokeMotionModelFC``, second_stage_video_fc.py:33-120): flow =
    flat coupling transformer, cond = [phi(x_0), phi(poke)] vectors."""

    def __init__(self, config, first_stage: FCBaselineModel,
                 conditioner: Optional[FirstStageFCWrapper],
                 poke_embedder: FirstStageFCWrapper):
        self.config = config
        arch = config["architecture"]
        self.first_stage = first_stage
        self.conditioner = conditioner
        self.poke_embedder = poke_embedder
        self.use_cond = conditioner is not None
        self.poke_key = "poke"
        # vector latent: no augmented-input channels (the conv second stage's
        # option, second_stage.py) — but test modes branch on the attribute,
        # so expose it with the same name
        self.augment_input = False
        self.flow_in_channels = first_stage.z_dim
        h_channels = poke_embedder.nf_max + (
            conditioner.nf_max if self.use_cond else 0)
        flow_arch = dict(arch)
        flow_arch.update(
            flow_in_channels=self.flow_in_channels,
            h_channels=h_channels,
            flow_mid_channels=int(arch.get("flow_mid_channels_factor", 8)
                                  * self.flow_in_channels),
        )
        self.flow = build_supervised_transformer(flow_arch)
        # radial base distribution option (reference
        # second_stage_video_fc.py:48-50)
        self.radial = config.get("training", {}).get(
            "base_distribution", "gaussian") == "radial"

    def init(self, rng):
        return {"flow": self.flow.init(rng, (1, self.flow_in_channels))}

    def embed_conditioning(self, frozen, batch, params=None):
        # ``params`` accepted for signature parity with the conv second stage
        # (SecondStageModel.embed_conditioning) — the FC tower has no
        # trainable conv_adapt adapters, so it is unused
        del params
        poke = batch[self.poke_key]
        X = batch["images"]
        if self.poke_embedder.poke_and_image:
            poke = jnp.concatenate([poke, X[:, 0]], axis=-1)
        poke_emb, *_ = self.poke_embedder.apply(
            {"params": frozen["poke"].params,
             "batch_stats": frozen["poke"].stats},
            poke, train=False, method=FirstStageFCWrapper.encode)
        if not self.use_cond:
            return poke_emb
        z, mean, _ = self.conditioner.apply(
            {"params": frozen["cond"].params,
             "batch_stats": frozen["cond"].stats},
            X[:, 0], train=False, method=FirstStageFCWrapper.encode)
        cond = z if self.conditioner.deterministic else mean
        return jnp.concatenate([cond, poke_emb], axis=-1)

    def encode_first_stage(self, frozen, X, rng):
        motion, *_ = self.first_stage.apply(
            {"params": frozen["fs"].params, "batch_stats": frozen["fs"].stats},
            X, rng, method=FCBaselineModel.encode)
        return motion

    def decode_first_stage(self, frozen, motion, start_frame, length: int):
        return self.first_stage.apply(
            {"params": frozen["fs"].params, "batch_stats": frozen["fs"].stats},
            motion, start_frame, length, False,
            method=FCBaselineModel.decode)

    def forward_density(self, params, frozen, batch, rng):
        cond = self.embed_conditioning(frozen, batch)
        motion = self.encode_first_stage(frozen, batch["images"], rng)
        return self.flow.forward(params["flow"],
                                 jax.lax.stop_gradient(motion), cond)

    def sample_base(self, rng, batch_size):
        z = jax.random.normal(rng, (batch_size, self.flow_in_channels))
        if self.radial:
            z = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-12)
            r = jnp.abs(jax.random.normal(jax.random.fold_in(rng, 1),
                                          (batch_size, 1)))
            z = z * r
        return z

    def forward_sample(self, params, frozen, batch, rng, length: int):
        X = batch["images"]
        cond = self.embed_conditioning(frozen, batch)
        z = self.sample_base(rng, X.shape[0])
        motion = self.flow.inverse(params["flow"], z, cond)
        return self.decode_first_stage(frozen, motion, X[:, 0], length)

    def ddi(self, params, frozen, batch, rng):
        cond = self.embed_conditioning(frozen, batch)
        motion = self.encode_first_stage(frozen, batch["images"], rng)
        _, _, new_flow = self.flow.ddi(params["flow"], motion, cond)
        return {"flow": new_flow}
