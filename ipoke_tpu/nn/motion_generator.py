"""Alternative 3D-conv video generator (reference
``models/modules/motion_models/motion_generator.py``): z -> Dense ->
(1, 4, 4, 16*nf) seed, then 6 up-blocks of [SPADE(start frame) + ADAIN(z)]
modulated Conv3d pairs with trilinear upsampling over (T, H, W)."""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import AdaIN, _num_groups


class _Spade3D(nn.Module):
    """SPADE over (B, T, H, W, C) conditioned on the start frame."""

    num_features: int
    hidden: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, x, y):
        normalized = nn.GroupNorm(
            num_groups=_num_groups(self.num_features), use_bias=False,
            use_scale=False, dtype=self.dtype)(x)
        y = jax.image.resize(
            y, (y.shape[0], x.shape[2], x.shape[3], y.shape[-1]), "bilinear")
        y = jax.nn.leaky_relu(
            nn.Conv(self.hidden, (3, 3), padding=1, dtype=self.dtype)(y), 0.2)
        gamma = nn.Conv(self.num_features, (3, 3), padding=1,
                        dtype=self.dtype)(y)[:, None]
        beta = nn.Conv(self.num_features, (3, 3), padding=1,
                       dtype=self.dtype)(y)[:, None]
        return normalized * (1.0 + gamma) + beta


class GeneratorBlock3D(nn.Module):
    out_channels: int
    t_up: bool
    dtype: Any = None

    @nn.compact
    def __call__(self, x, start_frame, z):
        b, t, h, w, c = x.shape
        t2 = t * 2 if self.t_up else t
        x = jax.image.resize(x, (b, t2, h * 2, w * 2, c), "trilinear")
        x = _Spade3D(c, dtype=self.dtype)(x, start_frame)
        x = jax.nn.leaky_relu(x, 0.2)
        x = nn.Conv(self.out_channels, (3, 3, 3), padding=1,
                    dtype=self.dtype)(x)
        x = AdaIN(self.out_channels, dtype=self.dtype)(x, z)
        x = jax.nn.leaky_relu(x, 0.2)
        x = nn.Conv(self.out_channels, (3, 3, 3), padding=1,
                    dtype=self.dtype)(x)
        return x


class Generator3D(nn.Module):
    """(B, z_dim) + start frame -> (B, T, S, S, 3) video
    (reference ``Generator``, motion_generator.py:55-117)."""

    nf: int = 16
    z_dim: int = 128
    spatial_size: int = 64
    max_frames: int = 10
    dtype: Any = None

    @nn.compact
    def __call__(self, z, start_frame):
        import numpy as np

        n_up = int(np.log2(self.spatial_size // 4))
        h = nn.Dense(4 * 4 * 16 * self.nf, dtype=self.dtype)(z)
        h = h.reshape(h.shape[0], 1, 4, 4, 16 * self.nf)
        t_ups = int(np.ceil(np.log2(self.max_frames)))
        chans = [max(16 * self.nf // (2 ** (i + 1)), self.nf)
                 for i in range(n_up)]
        for i, c in enumerate(chans):
            h = GeneratorBlock3D(c, t_up=(i < t_ups), dtype=self.dtype)(
                h, start_frame, z)
        h = jnp.tanh(nn.Conv(3, (3, 3, 3), padding=1, dtype=self.dtype)(h))
        return h[:, : self.max_frames]
