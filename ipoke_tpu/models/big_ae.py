"""BigGAN-style autoencoder (the third stage's flow/image encoder).

Rebuild of reference ``models/modules/autoencoders/big_ae.py`` +
``biggan.py``: a ResNet encoder producing a diagonal-Gaussian posterior over
``z_dim`` and a BigGAN generator decoder (hierarchical z-splitting,
class-conditional batchnorm driven by a learned embedding of z, SAGAN
self-attention, residual up-blocks).  The reference vendors a pretrained
ImageNet BigGAN with latent-size surgery (``biggan.py:573-629``); with no
downloadable weights this trains from scratch — structure and capacity match.
NHWC / flax.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class ConditionalBatchNorm(nn.Module):
    """BN without learned affine; gamma/beta from the conditioning vector
    (reference biggan.py:116-163)."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, cond):
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.var(x, axis=(0, 1, 2))
        xn = (x - mean) * jax.lax.rsqrt(var + 1e-4)
        gamma = nn.Dense(self.features, use_bias=False, dtype=self.dtype)(cond)
        beta = nn.Dense(self.features, use_bias=False, dtype=self.dtype)(cond)
        return xn * (1.0 + gamma[:, None, None, :]) + beta[:, None, None, :]


class SelfAttention(nn.Module):
    """SAGAN attention (reference biggan.py:76-114)."""

    channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        theta = nn.Conv(c // 8, (1, 1), use_bias=False, dtype=self.dtype)(x)
        phi = nn.Conv(c // 8, (1, 1), use_bias=False, dtype=self.dtype)(x)
        phi = nn.max_pool(phi, (2, 2), strides=(2, 2))
        g = nn.Conv(c // 2, (1, 1), use_bias=False, dtype=self.dtype)(x)
        g = nn.max_pool(g, (2, 2), strides=(2, 2))
        attn = jax.nn.softmax(
            jnp.einsum("bid,bjd->bij", theta.reshape(b, h * w, -1),
                       phi.reshape(b, -1, phi.shape[-1])), axis=-1)
        o = jnp.einsum("bij,bjd->bid", attn, g.reshape(b, -1, g.shape[-1]))
        o = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype)(
            o.reshape(b, h, w, c // 2))
        gamma = self.param("gamma", nn.initializers.zeros, ())
        return x + gamma * o


class GBlock(nn.Module):
    """CBN-relu-up-conv x2 residual up-block (reference biggan.py:166-246)."""

    out_channels: int
    upsample: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, cond):
        c_in = x.shape[-1]
        h = jax.nn.relu(ConditionalBatchNorm(c_in, self.dtype)(x, cond))
        if self.upsample:
            h = jax.image.resize(
                h, (h.shape[0], h.shape[1] * 2, h.shape[2] * 2, h.shape[3]),
                "nearest")
            x = jax.image.resize(
                x, (x.shape[0], x.shape[1] * 2, x.shape[2] * 2, x.shape[3]),
                "nearest")
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype)(h)
        h = jax.nn.relu(
            ConditionalBatchNorm(self.out_channels, self.dtype)(h, cond))
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype)(h)
        if c_in != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype)(x)
        return x + h


class BigGANGenerator(nn.Module):
    """Hierarchical-z BigGAN generator (reference Generator64/128,
    biggan.py:249-460): z is chunked per block; each chunk + the class
    embedding conditions that block's CBNs."""

    spatial_size: int = 64
    ch: int = 48
    z_dim: int = 128
    embed_dim: int = 128
    out_channels: int = 3
    attention_at: int = 32
    dtype: Any = None

    def _arch(self):
        import numpy as np

        n_blocks = int(np.log2(self.spatial_size)) - 2  # 4x4 start
        # reference Generator64/128 width plans, generalized to any 2^k
        mults_out = tuple([16, 8, 4, 2, 1][:n_blocks])
        mults_in = (16,) + mults_out[:-1]
        return mults_in, mults_out

    @nn.compact
    def __call__(self, z, embed):
        mults_in, mults_out = self._arch()
        n_blocks = len(mults_in)
        chunks = jnp.split(z, n_blocks + 1, axis=-1)
        h = nn.Dense(4 * 4 * mults_in[0] * self.ch, dtype=self.dtype)(chunks[0])
        h = h.reshape(h.shape[0], 4, 4, mults_in[0] * self.ch)
        res = 4
        for i, m_out in enumerate(mults_out):
            cond = jnp.concatenate([chunks[i + 1], embed], axis=-1)
            h = GBlock(m_out * self.ch, dtype=self.dtype)(h, cond)
            res *= 2
            if res == self.attention_at:
                h = SelfAttention(m_out * self.ch, dtype=self.dtype)(h)
        h = jax.nn.relu(nn.GroupNorm(num_groups=min(16, h.shape[-1]))(h))
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype)(h)
        return jnp.tanh(h)


class ClassUp(nn.Module):
    """z -> class-embedding MLP (reference big_ae.py:46-64)."""

    out_dim: int
    hidden: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, z):
        h = jax.nn.leaky_relu(nn.Dense(self.hidden, dtype=self.dtype)(z), 0.2)
        h = nn.Dense(self.out_dim, dtype=self.dtype)(h)
        return h / (jnp.linalg.norm(h, axis=-1, keepdims=True) + 1e-8)


class _EncBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        h = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype)(x)
        h = jax.nn.relu(nn.GroupNorm(num_groups=min(16, self.planes))(h))
        h = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype)(h)
        h = nn.GroupNorm(num_groups=min(16, self.planes))(h)
        if self.stride != 1 or c_in != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride,
                        use_bias=False, dtype=self.dtype)(x)
        return jax.nn.relu(h + x)


class ResnetEncoder(nn.Module):
    """ResNet image/flow encoder -> (mu, logvar) over z_dim (reference
    ``ResnetEncoder``, big_ae.py:130-225, torchvision backbone +
    DenseEncoderLayer)."""

    z_dim: int
    channels: Sequence[int] = (64, 128, 256, 512)
    blocks_per_stage: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.channels[0], (7, 7), strides=2, padding=3,
                    use_bias=False, dtype=self.dtype)(x)
        h = jax.nn.relu(nn.GroupNorm(num_groups=16)(h))
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, c in enumerate(self.channels):
            stride = 1 if i == 0 else 2
            h = _EncBlock(c, stride, dtype=self.dtype)(h)
            for _ in range(self.blocks_per_stage - 1):
                h = _EncBlock(c, dtype=self.dtype)(h)
        h = jnp.mean(h, axis=(1, 2))
        out = nn.Dense(2 * self.z_dim, dtype=self.dtype)(h)
        mu, logvar = jnp.split(out, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        return mu, logvar


class BigAE(nn.Module):
    """encoder -> diagonal Gaussian z -> BigGAN decoder (reference
    ``BigAE``, big_ae.py:12-43)."""

    z_dim: int
    spatial_size: int = 64
    in_channels: int = 2  # flow maps by default
    gen_ch: int = 48
    dtype: Any = None

    def setup(self):
        import numpy as np

        self.encoder = ResnetEncoder(z_dim=self.z_dim, dtype=self.dtype)
        n_blocks = int(np.log2(self.spatial_size)) - 2 + 1  # + input chunk
        self.gen_z_dim = ((self.z_dim + n_blocks - 1) // n_blocks) * n_blocks
        self.class_up = ClassUp(out_dim=128, dtype=self.dtype)
        self.decoder = BigGANGenerator(
            spatial_size=self.spatial_size, ch=self.gen_ch,
            z_dim=self.gen_z_dim, out_channels=self.in_channels,
            dtype=self.dtype,
        )

    def encode(self, x):
        return self.encoder(x)

    def decode(self, z):
        pad = self.gen_z_dim - self.z_dim
        if pad:
            z = jnp.concatenate(
                [z, jnp.zeros((z.shape[0], pad), z.dtype)], axis=-1)
        embed = self.class_up(z)
        return self.decoder(z, embed)

    def __call__(self, x, rng=None, sample_posterior: bool = True):
        mu, logvar = self.encoder(x)
        if sample_posterior and rng is not None:
            z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(
                rng, mu.shape, mu.dtype)
        else:
            z = mu
        rec = self.decode(z)
        return rec, mu, logvar


def gaussian_kl(mu, logvar):
    """KL(q || N(0,I)) per batch mean (reference distributions.py:25-60)."""
    return jnp.mean(
        0.5 * jnp.sum(mu**2 + jnp.exp(logvar) - 1.0 - logvar, axis=-1)
    )
