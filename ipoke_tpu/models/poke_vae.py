"""Poke-conditioned cVAE baseline (reference ``models/poke_vae.py:25-412``).

The ablation baseline against the cINN: same 3D motion encoder + ConvGRU +
SPADE decoder as the first stage, but the GRU is DRIVEN by a poke
representation (ConvEncoder over [x_0, poke] -> z_dim spatial map) — either
as the recurrent input (default) or stacked with the motion latent
(``stack_motion_and_poke``).  Sampling draws motion ~ N(0, I) while the poke
still steers the rollout.  Trained under the shared first-stage VAE-GAN step
with KL annealing (``training.kl_annealing`` epochs of linear ramp,
reference ``:43-46,107-114``).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn import ConvGRU, ResNetMotionEncoder, SpadeCondConvDecoder
from ..nn.encoders import ConvEncoder


class PokeVAEModel(nn.Module):
    """Interface-compatible with ``FirstStageModel`` (the shared GAN train
    step passes ``poke``); min latent map s x s x z_dim."""

    needs_poke = True

    spatial_size: int
    z_dim: int = 32
    enc_channels: Sequence[int] = (64, 128, 256, 256, 256)
    dec_channels: Sequence[int] = (256, 256, 256, 128, 64)
    n_gru_layers: int = 4
    min_spatial_size: int = 8
    max_frames: int = 10
    full_seq: bool = True
    stack_motion_and_poke: bool = False
    norm: str = "group"
    spectral_norm: bool = True
    deterministic: bool = False
    dtype: Any = None

    def setup(self):
        import numpy as np

        self.enc_motion = ResNetMotionEncoder(
            channels=self.enc_channels, z_dim=self.z_dim,
            spatial_size=self.spatial_size, max_frames=self.max_frames,
            full_seq=self.full_seq, min_spatial_size=self.min_spatial_size,
            deterministic=self.deterministic, dtype=self.dtype,
        )
        hidden = 2 * self.z_dim if self.stack_motion_and_poke else self.z_dim
        self.rnn = ConvGRU(hidden_size=hidden, n_layers=self.n_gru_layers,
                           dtype=self.dtype)
        n_stages = int(np.log2(self.spatial_size // self.min_spatial_size))
        self.poke_enc = ConvEncoder(
            nf_in=5, nf_max=self.z_dim, n_stages=n_stages, dtype=self.dtype)
        self.gen = SpadeCondConvDecoder(
            dec_channels=self.dec_channels, out_channels=3, norm=self.norm,
            snorm=self.spectral_norm, dtype=self.dtype,
        )

    def encode(self, X, rng=None):
        X_in = X if self.full_seq else X[:, 1:]
        return self.enc_motion(X_in, rng=rng)

    def _poke_repr(self, start_frame, poke, train):
        inp = jnp.concatenate([start_frame, poke], axis=-1)
        repr_, *_ = self.poke_enc(inp, train=train)
        return repr_

    def decode(self, motion, start_frame, length: int, train: bool = False,
               poke=None):
        assert poke is not None, "PokeVAE decoding requires a poke map"
        poke_repr = self._poke_repr(start_frame, poke, train)
        if self.stack_motion_and_poke:
            state0 = jnp.concatenate([motion, poke_repr], axis=-1)
            in_rnn = jnp.zeros_like(state0)
        else:
            state0 = motion
            in_rnn = poke_repr
        hidden = tuple(state0 for _ in range(self.n_gru_layers))
        # start frame is fixed across the rollout: one SPADE modulation pass
        mods = self.gen.spade_modulations(start_frame, motion.shape[1])
        hs = []
        for _ in range(length):
            hidden = self.rnn(in_rnn, hidden)
            hs.append(hidden[-1])
        if not train:
            # render all frames in ONE batched decoder apply (B-major flatten;
            # identical math — see FirstStageModel.decode)
            B = motion.shape[0]
            flat = jnp.stack(hs, axis=1).reshape(B * length, *hs[0].shape[1:])
            # (B,)-batched mods broadcast per clip inside the fused SPADE
            # apply (b-major flat layout)
            frames = self.gen(flat, None, train=False, mods=mods)
            return frames.reshape(B, length, *frames.shape[1:])
        return jnp.stack(
            [self.gen(h, start_frame, train=train, mods=mods) for h in hs],
            axis=1)

    def __call__(self, X, rng=None, train: bool = False, poke=None,
                 sample_prior: bool = False):
        if sample_prior:
            s = self.min_spatial_size
            motion = jax.random.normal(
                rng, (X.shape[0], s, s, self.z_dim), X.dtype)
            mu = logvar = jnp.zeros_like(motion)
        else:
            motion, mu, logvar = self.encode(X, rng)
        X_hat = self.decode(motion, X[:, 0], X.shape[1] - 1, train=train,
                            poke=poke)
        return X_hat, mu, logvar


class RNNMotionModel(nn.Module):
    """First-stage variant: scene encoder on x_0 feeds the ConvGRU input,
    plain (non-SPADE) decoder renders each hidden state (reference
    ``RNNMotionModel``, first_stage_motion_model.py:394-465)."""

    spatial_size: int
    z_dim: int = 32
    enc_channels: Sequence[int] = (64, 128, 256, 256, 256)
    dec_channels: Sequence[int] = (256, 256, 256, 128, 64)
    n_gru_layers: int = 4
    min_spatial_size: int = 8
    max_frames: int = 10
    full_seq: bool = True
    deterministic: bool = False
    dtype: Any = None

    def setup(self):
        import numpy as np

        from ..nn.encoders import ConvDecoder

        self.enc_motion = ResNetMotionEncoder(
            channels=self.enc_channels, z_dim=self.z_dim,
            spatial_size=self.spatial_size, max_frames=self.max_frames,
            full_seq=self.full_seq, min_spatial_size=self.min_spatial_size,
            dtype=self.dtype,
        )
        n_stages = int(np.log2(self.spatial_size // self.min_spatial_size))
        self.enc_static = ConvEncoder(
            nf_in=3, nf_max=self.z_dim, n_stages=n_stages, dtype=self.dtype)
        self.rnn = ConvGRU(hidden_size=self.z_dim,
                           n_layers=self.n_gru_layers, dtype=self.dtype)
        self.post_hidden = nn.Conv(self.z_dim, (3, 3), padding=1,
                                   dtype=self.dtype)
        self.gen = ConvDecoder(
            nf_in=self.z_dim,
            in_channels=tuple(self.dec_channels), out_channels=3,
            dtype=self.dtype,
        )

    def encode(self, X, rng=None):
        X_in = X if self.full_seq else X[:, 1:]
        return self.enc_motion(X_in, rng=rng)

    def decode(self, motion, start_frame, length: int, train: bool = False):
        scene, *_ = self.enc_static(start_frame, train=train)
        hidden = tuple(motion for _ in range(self.n_gru_layers))
        x = scene
        xs = []
        for _ in range(length):
            hidden = self.rnn(x, hidden)
            x = self.post_hidden(hidden[-1])
            xs.append(x)
        if not train:
            B = motion.shape[0]
            flat = jnp.stack(xs, axis=1).reshape(B * length, *xs[0].shape[1:])
            frames = self.gen(flat, train=False)
            return frames.reshape(B, length, *frames.shape[1:])
        return jnp.stack([self.gen(x, train=train) for x in xs], axis=1)

    def __call__(self, X, rng=None, train: bool = False, poke=None):
        del poke
        motion, mu, logvar = self.encode(X, rng)
        X_hat = self.decode(motion, X[:, 0], X.shape[1] - 1, train=train)
        return X_hat, mu, logvar
