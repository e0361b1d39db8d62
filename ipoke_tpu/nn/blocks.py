"""Conv building blocks (flax.linen, NHWC, bf16-ready).

TPU-native equivalents of the reference block library
(``models/modules/autoencoders/util.py``: ``Conv2dBlock:195-273``,
``Conv2dTransposeBlock:7-73``, ``ResBlock:106-192``, ``NormConv2d:275``,
``Spade:473-500``, ``Norm3D:503``, ``ADAIN:522``).  Differences by design:
channels-last layout, XLA-fused norm+act, optional ``dtype`` for bfloat16
compute with fp32 params, and no hardcoded device placement (the reference
has stray ``.cuda()`` calls, e.g. ``util.py:496``).

All modules that may contain spectral norm take a ``train`` kwarg; spectral
norm power-iteration state lives in the ``batch_stats`` collection.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def get_activation(name: str) -> Optional[Callable]:
    return {
        "relu": jax.nn.relu,
        "lrelu": lambda x: jax.nn.leaky_relu(x, 0.2),
        "elu": jax.nn.elu,
        "tanh": jnp.tanh,
        "none": None,
    }[name]


def make_norm(name: str, channels: int, dtype=None) -> Optional[nn.Module]:
    """Norm factory matching the reference's names ('bn' maps to GroupNorm —
    batch statistics don't shard cleanly over a data mesh; group norm is the
    TPU-native stand-in and is what the shipped configs use anyway)."""
    if name in ("none", None):
        return None
    if name in ("group", "Group", "bn", "BN", "batch"):
        # epsilon 1e-5 matches torch GroupNorm for weight-porting parity
        return nn.GroupNorm(num_groups=_num_groups(channels), epsilon=1e-5,
                            dtype=dtype)
    if name in ("in", "instance"):
        return nn.GroupNorm(
            group_size=1, num_groups=None, use_bias=False, use_scale=False,
            epsilon=1e-5, dtype=dtype,
        )
    raise ValueError(f"unsupported norm {name!r}")


def resize_bilinear_align_corners(y, out_h: int, out_w: int):
    """Bilinear resize matching torch F.interpolate(align_corners=True)
    (output pixel i samples input coordinate i*(in-1)/(out-1))."""

    def interp_axis(v, out_n, axis):
        in_n = v.shape[axis]
        if in_n == out_n:
            return v
        if in_n == 1:
            return jnp.repeat(v, out_n, axis=axis)
        coords = jnp.linspace(0.0, in_n - 1.0, out_n)
        lo = jnp.floor(coords).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, in_n - 1)
        w = (coords - lo).astype(v.dtype)
        shape = [1] * v.ndim
        shape[axis] = out_n
        w = w.reshape(shape)
        return (jnp.take(v, lo, axis=axis) * (1 - w)
                + jnp.take(v, hi, axis=axis) * w)

    y = interp_axis(y, out_h, 1)
    return interp_axis(y, out_w, 2)


def _num_groups(channels: int, max_groups: int = 16) -> int:
    g = min(channels, max_groups)
    while channels % g != 0:
        g -= 1
    return g


class Conv2dBlock(nn.Module):
    """conv -> norm -> activation (reference ``util.py:195-273``)."""

    out_dim: int
    ks: int = 3
    st: int = 1
    padding: int = 0
    norm: str = "none"
    activation: str = "elu"
    snorm: bool = False
    use_bias: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = nn.Conv(
            self.out_dim, (self.ks, self.ks), strides=(self.st, self.st),
            padding=self.padding, use_bias=self.use_bias, dtype=self.dtype,
        )
        if self.snorm:
            x = nn.SpectralNorm(conv)(x, update_stats=train)
        else:
            x = conv(x)
        norm = make_norm(self.norm, self.out_dim, self.dtype)
        if norm is not None:
            x = norm(x)
        act = get_activation(self.activation)
        return act(x) if act is not None else x


class Conv2dTransposeBlock(nn.Module):
    """2x (or ``st``x) upsampling transpose conv -> norm -> activation
    (reference ``util.py:7-73``).

    ``torch_crop`` reproduces torch ConvTranspose2d(k3, s2, p=1,
    output_padding=1) exactly (VALID + crop[1:, 1:]; mapping proven in
    tests/test_torch_parity.py) — used when porting reference weights."""

    out_dim: int
    ks: int = 3
    st: int = 2
    norm: str = "none"
    activation: str = "elu"
    snorm: bool = False
    torch_crop: bool = False
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = nn.ConvTranspose(
            self.out_dim, (self.ks, self.ks), strides=(self.st, self.st),
            padding="VALID" if self.torch_crop else "SAME",
            transpose_kernel=self.torch_crop, dtype=self.dtype,
        )
        if self.snorm:
            x = nn.SpectralNorm(conv)(x, update_stats=train)
        else:
            x = conv(x)
        if self.torch_crop:
            x = x[:, 1:, 1:, :]
        norm = make_norm(self.norm, self.out_dim, self.dtype)
        if norm is not None:
            x = norm(x)
        act_name = self.activation
        if self.torch_crop and act_name == "elu":
            # reference quirk: its Conv2dTransposeBlock maps "elu" to ReLU
            # (util.py:41-42); replicate in port mode
            act_name = "relu"
        act = get_activation(act_name)
        return act(x) if act is not None else x


class ResBlock(nn.Module):
    """Two-conv residual block, optional stride-2 down or transpose-conv up
    (reference ``util.py:106-192``)."""

    dim_out: int
    norm: str = "group"
    activation: str = "elu"
    upsampling: bool = False
    stride: int = 1
    snorm: bool = False
    torch_crop: bool = False
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dim_in = x.shape[-1]
        if self.upsampling:
            h = Conv2dTransposeBlock(
                self.dim_out, 3, 2, norm=self.norm, activation=self.activation,
                snorm=self.snorm, torch_crop=self.torch_crop, dtype=self.dtype,
            )(x, train)
        else:
            h = Conv2dBlock(
                self.dim_out, 3, self.stride, 1, norm=self.norm,
                activation=self.activation, snorm=self.snorm, dtype=self.dtype,
            )(x, train)
        h = Conv2dBlock(
            self.dim_out, 3, 1, 1, norm=self.norm, activation="none",
            snorm=self.snorm, dtype=self.dtype,
        )(h, train)

        residual = x
        if dim_in != self.dim_out or self.upsampling or self.stride != 1:
            if self.upsampling:
                residual = Conv2dTransposeBlock(
                    self.dim_out, 3, 2, norm="in", activation=self.activation,
                    snorm=self.snorm, torch_crop=self.torch_crop,
                    dtype=self.dtype,
                )(x, train)
            else:
                residual = Conv2dBlock(
                    self.dim_out, 3, self.stride, 1, norm="in",
                    activation=self.activation, snorm=self.snorm,
                    dtype=self.dtype,
                )(x, train)
        return h + residual


class NormConv2d(nn.Module):
    """Conv with per-out-channel l2 weight normalization and learned scale
    (reference ``util.py:275-342``)."""

    out_dim: int
    ks: int = 3
    st: int = 1
    padding: int = 0
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        v = self.param(
            "v", nn.initializers.normal(0.05), (self.ks, self.ks, cin, self.out_dim)
        )
        gamma = self.param("gamma", nn.initializers.ones, (self.out_dim,))
        beta = self.param("beta", nn.initializers.zeros, (self.out_dim,))
        w = v / (jnp.sqrt(jnp.sum(v**2, axis=(0, 1, 2))) + 1e-12)
        pad = [(self.padding, self.padding)] * 2
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype or x.dtype), w.astype(self.dtype or w.dtype),
            (self.st, self.st), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return gamma * y + beta


class Spade(nn.Module):
    """SPADE conditioning: parameter-free GroupNorm modulated by gamma/beta
    convs over the (resized) conditioning image (reference ``util.py:473-500``).

    ``modulation(y, h, w)`` exposes the (gamma, beta) branch separately: it
    depends only on the conditioning image, so a caller decoding T frames
    from ONE start frame can compute it once and pass it back via ``mod=``
    (the reference recomputes it every frame — identical math, ~10x the
    conditioning-branch FLOPs).  Submodules carry the explicit names the
    previous ``@nn.compact`` auto-naming produced (``GroupNorm_0``,
    ``Conv_0..2``) so ported checkpoints load unchanged.
    """

    num_features: int
    norm: str = "group"
    hidden: int = 128
    align_corners: bool = False  # torch F.interpolate(align_corners=True)
    dtype: Dtype = None

    def setup(self):
        self.norm_layer = nn.GroupNorm(
            num_groups=_num_groups(self.num_features), use_bias=False,
            use_scale=False, epsilon=1e-5, dtype=self.dtype,
            name="GroupNorm_0",
        )
        self.conv_hidden = nn.Conv(
            self.hidden, (3, 3), padding=1, dtype=self.dtype, name="Conv_0")
        self.conv_gamma = nn.Conv(
            self.num_features, (3, 3), padding=1, dtype=self.dtype,
            name="Conv_1")
        self.conv_beta = nn.Conv(
            self.num_features, (3, 3), padding=1, dtype=self.dtype,
            name="Conv_2")

    def modulation(self, y, height: int, width: int):
        """(gamma, beta) at the target resolution from the conditioning
        image alone."""
        if self.align_corners:
            y = resize_bilinear_align_corners(y, height, width)
        else:
            y = jax.image.resize(
                y, (y.shape[0], height, width, y.shape[-1]), "bilinear"
            )
        y = jax.nn.leaky_relu(self.conv_hidden(y), 0.2)
        return self.conv_gamma(y), self.conv_beta(y)

    def __call__(self, x, y=None, mod=None):
        if mod is None:
            mod = self.modulation(y, x.shape[1], x.shape[2])
        gamma, beta = mod
        return self.norm_layer(x) * (1.0 + gamma) + beta


class AdaIN(nn.Module):
    """Instance-norm modulated by gamma/beta from a latent vector — the 3D
    ADAIN used by the alternative motion generator (reference
    ``util.py:522-546``).  x: (B, T, H, W, C), z: (B, z_dim)."""

    num_features: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, z):
        mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        var = jnp.var(x, axis=(1, 2, 3), keepdims=True)
        out = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        gb = nn.Dense(self.num_features * 2, dtype=self.dtype)(
            jax.nn.leaky_relu(z, 0.2)
        )
        gamma, beta = jnp.split(gb, 2, axis=-1)
        gamma = gamma[:, None, None, None, :]
        beta = beta[:, None, None, None, :]
        return (1.0 + gamma) * out + beta
