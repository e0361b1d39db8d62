"""2D conv encoder/decoder pairs used by the poke/image encoders and the
first-stage decoder (reference ``models/modules/autoencoders/fully_conv_models.py``).

``ConvEncoder`` (ref ``:28-109``): strided Conv2dBlock stem + stride-2
ResBlocks + bottleneck ResBlock; optional variational heads with a
sigmoid-squashed logstd.  ``ConvDecoder`` (ref ``:111-148``): mirrored
upsampling ResBlocks.  ``SpadeCondConvDecoder`` (ref ``:150-192``): each
upsampling ResBlock followed by SPADE conditioning on the start frame.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import Conv2dBlock, NormConv2d, ResBlock, Spade


class ConvEncoder(nn.Module):
    nf_in: int
    nf_max: int
    n_stages: int
    variational: bool = False
    norm: str = "group"
    snorm: bool = True
    dtype: Any = None

    @property
    def depths(self) -> Tuple[int, ...]:
        """Per-stage channel widths, shallowest last (decoder input spec)."""
        out = [32]
        nf = 32
        for _ in range(self.n_stages - 1):
            nf = min(nf * 2, self.nf_max)
            out.insert(0, nf)
        return tuple(out)

    @nn.compact
    def __call__(self, x, rng=None, train: bool = False, sample_prior: bool = False):
        """Returns (z, mean, logstd); deterministic encoders return
        (h, h, None) like the reference's non-variational path."""
        nf = 32
        h = Conv2dBlock(
            nf, 3, 2, 1, norm=self.norm, activation="elu", snorm=self.snorm,
            dtype=self.dtype,
        )(x, train)
        for _ in range(self.n_stages - 1):
            nf = min(nf * 2, self.nf_max)
            h = ResBlock(
                nf, stride=2, norm=self.norm, activation="elu",
                snorm=self.snorm, dtype=self.dtype,
            )(h, train)
        mean_pre = h
        h = ResBlock(
            self.nf_max, norm=self.norm, activation="elu", snorm=self.snorm,
            dtype=self.dtype,
        )(h, train)
        if not self.variational:
            return h, mean_pre, None
        mean = NormConv2d(self.nf_max, 3, padding=1, dtype=self.dtype)(h)
        logstd = jax.nn.sigmoid(
            NormConv2d(self.nf_max, 3, padding=1, dtype=self.dtype)(h)
        )
        if sample_prior:
            z = jax.random.normal(rng, mean.shape, mean.dtype)
        elif rng is not None:
            eps = jax.random.normal(rng, mean.shape, mean.dtype)
            z = eps * jnp.exp(logstd) + mean
        else:
            z = mean
        return z, mean, logstd


class ConvDecoder(nn.Module):
    """in_channels: channel plan, deepest first (``[nf_max] + encoder.depths``)."""

    nf_in: int
    in_channels: Sequence[int]
    out_channels: int = 3
    norm: str = "group"
    snorm: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, z, train: bool = False):
        h = ResBlock(
            self.in_channels[0], norm=self.norm, snorm=self.snorm,
            dtype=self.dtype,
        )(z, train)
        for nf in self.in_channels[1:]:
            h = ResBlock(
                nf, norm=self.norm, upsampling=True, snorm=self.snorm,
                dtype=self.dtype,
            )(h, train)
        return Conv2dBlock(
            self.out_channels, 3, 1, 1, norm="none",
            activation="tanh" if self.out_channels == 3 else "none",
            dtype=self.dtype,
        )(h, train)


class SpadeCondConvDecoder(nn.Module):
    """Upsampling decoder with SPADE(start_frame) after every ResBlock —
    the shipped first-stage frame renderer (ref ``fully_conv_models.py:150-192``).

    ``torch_compat`` enables exact reference semantics for weight porting:
    torch transpose-conv cropping, its elu->ReLU quirk, and
    align_corners=True SPADE resizing."""

    dec_channels: Sequence[int]
    out_channels: int = 3
    norm: str = "group"
    snorm: bool = True
    torch_compat: bool = False
    dtype: Any = None

    def setup(self):
        # explicit names reproduce the previous @nn.compact auto-naming so
        # ported checkpoints / *_weights sidecars load unchanged
        self.head = ResBlock(
            self.dec_channels[0], norm=self.norm, snorm=self.snorm,
            dtype=self.dtype, name="ResBlock_0",
        )
        ups, spades = [], []
        for i, nf in enumerate(self.dec_channels[1:]):
            ups.append(ResBlock(
                nf, norm="none", upsampling=True, snorm=self.snorm,
                torch_crop=self.torch_compat, dtype=self.dtype,
                name=f"ResBlock_{i + 1}",
            ))
            spades.append(Spade(
                nf, norm=self.norm, align_corners=self.torch_compat,
                dtype=self.dtype, name=f"Spade_{i}",
            ))
        self.ups = tuple(ups)
        self.spades = tuple(spades)
        self.out = Conv2dBlock(
            self.out_channels, 3, 1, 1, norm="none",
            activation="tanh" if self.out_channels == 3 else "none",
            dtype=self.dtype, name="Conv2dBlock_0",
        )

    def spade_modulations(self, start_frame, in_size: int):
        """Per-level SPADE (gamma, beta) from the start frame alone — the
        per-frame decode input ``h_t`` enters only through GroupNorm, so a
        T-frame rollout from one start frame can compute these ONCE and pass
        them to every frame via ``mods=`` (identical math to the reference's
        per-frame recompute, ~T x fewer conditioning-branch FLOPs)."""
        mods = []
        size = in_size
        for sp in self.spades:
            size *= 2
            mods.append(sp.modulation(start_frame, size, size))
        return tuple(mods)

    def __call__(self, h_t, start_frame, train: bool = False, mods=None):
        h = self.head(h_t, train)
        for i, (up, sp) in enumerate(zip(self.ups, self.spades)):
            h = up(h, train)
            h = sp(h, start_frame, mod=None if mods is None else mods[i])
        return self.out(h, train)


class FirstStageWrapper(nn.Module):
    """Deterministic (or variational) encoder/decoder AE used for the image
    conditioner and poke embedder (ref ``fully_conv_models.py:9-26``).

    config keys mirror the reference ``architecture`` block: nf_in, nf_max,
    min_spatial_size, deterministic, poke_and_image.
    """

    spatial_size: int
    nf_in: int
    nf_max: int
    min_spatial_size: int = 8
    deterministic: bool = True
    poke_and_image: bool = False
    snorm: bool = True  # False for ported reference weights (collapsed SN)
    dtype: Any = None

    def setup(self):
        import numpy as np

        n_stages = int(np.log2(self.spatial_size // self.min_spatial_size))
        nf_in_enc = self.nf_in + (3 if self.poke_and_image else 0)
        self.encoder = ConvEncoder(
            nf_in=nf_in_enc, nf_max=self.nf_max, n_stages=n_stages,
            variational=not self.deterministic, snorm=self.snorm,
            dtype=self.dtype,
        )
        self.decoder = ConvDecoder(
            nf_in=self.nf_max,
            in_channels=(self.nf_max,) + self.encoder.depths,
            out_channels=self.nf_in, snorm=self.snorm,
            dtype=self.dtype,
        )

    def __call__(self, x, rng=None, train: bool = False):
        z, *_ = self.encoder(x, rng=rng, train=train)
        return self.decoder(z, train=train)

    def encode(self, x, rng=None, train: bool = False):
        return self.encoder(x, rng=rng, train=train)
