"""3D-ResNet motion encoder (reference
``models/modules/motion_models/motion_encoder.py:151-244``,
``resnet18_alternative`` with ``BasicBlock``).

Video layout (B, T, H, W, C); Conv3d stem (3,7,7)/(2,2,2) + GroupNorm(16),
ResNet-18-style stages whose temporal/spatial strides are derived from
``max_frames`` / ``full_seq`` / ``min_spatial_size`` exactly as the reference
does, 3x3 conv heads for (mu, logvar), and reparameterized output
``z in (B, min_spatial_size, min_spatial_size, z_dim)`` with the temporal
axis collapsed to 1 before the heads.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _gn(c):
    g = min(16, c)
    while c % g:
        g -= 1
    return nn.GroupNorm(num_groups=g)


class BasicBlock3d(nn.Module):
    planes: int
    stride: Tuple[int, int, int] = (1, 1, 1)
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        inplanes = x.shape[-1]
        h = nn.Conv(
            self.planes, (3, 3, 3), strides=self.stride, padding=1,
            use_bias=False, dtype=self.dtype,
        )(x)
        h = jax.nn.relu(_gn(self.planes)(h))
        h = nn.Conv(
            self.planes, (3, 3, 3), padding=1, use_bias=False, dtype=self.dtype
        )(h)
        h = _gn(self.planes)(h)
        if self.stride != (1, 1, 1) or inplanes != self.planes:
            res = nn.Conv(
                self.planes, (1, 1, 1), strides=self.stride, use_bias=False,
                dtype=self.dtype,
            )(x)
            res = _gn(self.planes)(res)
        else:
            res = x
        return jax.nn.relu(h + res)


def _stage(planes, blocks, stride, dtype):
    layers = [BasicBlock3d(planes, stride, dtype=dtype)]
    layers += [BasicBlock3d(planes, dtype=dtype) for _ in range(blocks - 1)]
    return layers


class ResNetMotionEncoder(nn.Module):
    """Returns (z, mu, logvar); mu/logvar are (B, s, s, z_dim) maps.

    Config semantics follow reference ``motion_encoder.py:151-244``:
    stage-1 gets temporal stride 2 when the channel list is short relative to
    log2(max_frames) or when ``full_seq``; an extra stage-4/5 downsamples
    space until ``min_spatial_size``.
    """

    channels: Sequence[int]  # ENC_M_channels
    z_dim: int
    spatial_size: int
    max_frames: int
    full_seq: bool = True
    min_spatial_size: int = 8
    deterministic: bool = False
    layers: Sequence[int] = (2, 2, 2, 2)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, rng=None):
        ch = list(self.channels)
        h = nn.Conv(
            ch[0], (3, 7, 7), strides=(2, 2, 2), padding=((1, 1), (3, 3), (3, 3)),
            use_bias=False, dtype=self.dtype,
        )(x)
        h = jax.nn.relu(_gn(ch[0])(h))

        first_block_down = (
            len(ch) - 1 < int(np.ceil(np.log2(self.max_frames))) or self.full_seq
        )
        s1 = (2, 1, 1) if first_block_down else (1, 1, 1)
        for blk in _stage(ch[1], self.layers[0], s1, self.dtype):
            h = blk(h)
        for blk in _stage(ch[2], self.layers[1], (2, 2, 2), self.dtype):
            h = blk(h)
        for blk in _stage(ch[3], self.layers[2], (2, 2, 2), self.dtype):
            h = blk(h)

        stride4 = None
        if self.full_seq and self.max_frames >= 16:
            stride4 = (2, 1, 1)
        if self.spatial_size // 2**3 > self.min_spatial_size:
            stride4 = (2, 2, 2)
        if stride4 is not None:
            c4 = ch[4] if len(ch) > 4 else ch[-1]
            for blk in _stage(c4, self.layers[3], stride4, self.dtype):
                h = blk(h)
        if self.spatial_size // 2**4 > self.min_spatial_size:
            c5 = ch[5] if len(ch) > 5 else ch[-1]
            for blk in _stage(c5, self.layers[3], (2, 2, 2), self.dtype):
                h = blk(h)

        # collapse any remaining temporal extent (reference squeezes T==1;
        # we mean-reduce so arbitrary max_frames settings still compile)
        h = jnp.mean(h, axis=1)

        mu = nn.Conv(self.z_dim, (3, 3), padding=1, dtype=self.dtype)(h)
        logvar = nn.Conv(self.z_dim, (3, 3), padding=1, dtype=self.dtype)(h)
        if self.deterministic or rng is None:
            return mu, mu, logvar
        eps = jax.random.normal(rng, logvar.shape, mu.dtype)
        z = eps * jnp.exp(0.5 * logvar) + mu
        return z, mu, logvar
