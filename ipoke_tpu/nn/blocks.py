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


class _SmallNConv(nn.Module):
    """Param-compatible drop-in for a stride-1 SAME ``nn.Conv`` whose output
    channel count is TINY (the decoders' final RGB/flow convs: N=2-3 of the
    MXU's 128 lanes).  Emits the identical conv as ONE
    (M, Cin) @ (Cin, k*k*N) dot — k*k times the lane utilization — plus k*k
    shifted adds of cheap (B, H, W, N) planes; fp32 accumulation like the
    conv emitter.  Same param names/shapes/init as ``nn.Conv`` so existing
    checkpoints and the torch-porting paths load unchanged."""

    features: int
    ks: int = 3
    use_bias: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.ks, self.ks, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,)) if self.use_bias else None
        if bias is None:
            x, kernel = nn.dtypes.promote_dtype(x, kernel, dtype=self.dtype)
        else:
            x, kernel, bias = nn.dtypes.promote_dtype(
                x, kernel, bias, dtype=self.dtype)
        k = self.ks
        b, hh, ww, _ = x.shape
        wp = jnp.transpose(kernel, (2, 0, 1, 3)).reshape(
            cin, k * k * self.features)
        u = jax.lax.dot_general(
            x.reshape(b * hh * ww, cin), wp, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(b, hh, ww, k, k, self.features)
        p = (k - 1) // 2
        up = jnp.pad(u, ((0, 0), (p, k - 1 - p), (p, k - 1 - p),
                         (0, 0), (0, 0), (0, 0)))
        acc = None
        for dy in range(k):
            for dx in range(k):
                s = up[:, dy:dy + hh, dx:dx + ww, dy, dx, :]
                acc = s if acc is None else acc + s
        out = acc.astype(x.dtype)
        return out if bias is None else out + bias


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
        # skinny-N stride-1 SAME convs CAN take the MXU-lane-packed emitter
        # (identical math + identical param tree, name pinned to Conv_0) via
        # IPOKE_SMALLN_CONV=1, but it is OFF by default: the r4 shipped-scale
        # TPU A/B (tools/profile_decode.py) measured the packed + phase
        # rewrites at 104.9 ms/step vs 51.2 ms with the plain flax emitters —
        # at 128px spatial maps the 9-tap fp32 intermediate is ~9x the
        # activation HBM traffic, which swamps the lane-utilization win that
        # motivated the emitter at 8x8 latents.
        import os

        smalln = os.environ.get("IPOKE_SMALLN_CONV", "0") in (
            "1", "true", "True")
        if (smalln and not self.snorm and self.st == 1 and self.ks % 2 == 1
                and self.padding == self.ks // 2 and self.out_dim <= 8):
            x = _SmallNConv(self.out_dim, self.ks, use_bias=self.use_bias,
                            dtype=self.dtype, name="Conv_0")(x)
        else:
            conv = nn.Conv(
                self.out_dim, (self.ks, self.ks),
                strides=(self.st, self.st), padding=self.padding,
                use_bias=self.use_bias, dtype=self.dtype,
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


def phase_deconv_enabled() -> bool:
    """Gate for the phase-decomposed 2x transpose conv (exact subpixel
    identity).  A k3-s2 transpose conv lowered as an input-dilated conv
    multiplies 75% zeros; the four phase convs (1x1 + 1x2 + 2x1 + 2x2 taps =
    2.25 MACs/output px vs 9) compute the identical result.  OFF by default:
    the r4 shipped-scale TPU A/B (tools/profile_decode.py, together with the
    packed skinny-N emitter) measured the rewrites at 104.9 vs 51.2 ms/step —
    XLA's own transpose-conv lowering does not pay the dilation zeros this
    targeted, and the 4-phase interleave costs extra HBM passes.  Opt in
    with env ``IPOKE_PHASE_DECONV=1`` to re-measure on other hardware."""
    import os

    return os.environ.get("IPOKE_PHASE_DECONV", "0") in (
        "1", "true", "True")


class _PhaseConvTranspose2x(nn.Module):
    """Param-compatible drop-in for ``nn.ConvTranspose(features, (3, 3),
    strides (2, 2), padding SAME, transpose_kernel=False)`` computing the
    SAME outputs via the subpixel/phase decomposition: output phase
    (y%2, x%2) is a small conv of the un-dilated input with a stride-2
    sub-slice of the kernel, then the four phases interleave.  Identical
    param tree ('kernel' (3,3,Cin,N) + 'bias') so checkpoints cross-load;
    exactness is pinned by tests/test_nn.py against the flax module."""

    features: int
    use_bias: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,)) if self.use_bias else None
        if bias is None:
            x, kernel = nn.dtypes.promote_dtype(x, kernel, dtype=self.dtype)
        else:
            x, kernel, bias = nn.dtypes.promote_dtype(
                x, kernel, bias, dtype=self.dtype)
        dn = ("NHWC", "HWIO", "NHWC")
        conv = lambda w, pad: jax.lax.conv_general_dilated(
            x, w, (1, 1), pad, dimension_numbers=dn)
        # lax.conv_transpose(SAME, transpose_kernel=False) is the flipped
        # adjoint: out[2i] = in[i-1]*k[0] + in[i]*k[2] (pad top/left), and
        # out[2i+1] = in[i]*k[1] — pinned by the impulse response in
        # tests/test_nn.py::test_phase_deconv_matches_flax_conv_transpose
        p00 = conv(kernel[0::2, 0::2], [(1, 0), (1, 0)])
        p01 = conv(kernel[0::2, 1:2], [(1, 0), (0, 0)])
        p10 = conv(kernel[1:2, 0::2], [(0, 0), (1, 0)])
        p11 = conv(kernel[1:2, 1:2], [(0, 0), (0, 0)])
        b, hh, ww, n = p00.shape
        out = jnp.stack([
            jnp.stack([p00, p01], axis=3),
            jnp.stack([p10, p11], axis=3),
        ], axis=2).reshape(b, 2 * hh, 2 * ww, n)
        return out if bias is None else out + bias


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
        if (not self.torch_crop and self.ks == 3 and self.st == 2
                and phase_deconv_enabled()):
            conv = _PhaseConvTranspose2x(
                self.out_dim, dtype=self.dtype, name="ConvTranspose_0")
        else:
            conv = nn.ConvTranspose(
                self.out_dim, (self.ks, self.ks),
                strides=(self.st, self.st),
                padding="VALID" if self.torch_crop else "SAME",
                transpose_kernel=self.torch_crop, dtype=self.dtype,
                name="ConvTranspose_0",
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


def spade_gn_modulate(x, gamma, beta, num_groups: int, eps: float = 1e-5):
    """Parameter-free GroupNorm fused with the SPADE modulation in ONE
    elementwise pass: ``GroupNorm(x) * (1 + gamma) + beta``.

    Math-identical to ``nn.GroupNorm(use_bias=False, use_scale=False)``
    followed by the modulation (fp32 stats via the fast-variance form with
    the same max(0) clamp, normalized output cast to ``x.dtype`` BEFORE the
    modulation, exactly like the flax layer under ``dtype=bf16``), but
    emitted so XLA fuses stats -> normalize -> modulate into two reads of
    ``x`` and one write — the r4 decode attribution measured the layered
    form at 20.2 ms of the 51.1 ms shipped-scale render
    (tools/profile_decode.py gen_only vs gen_nospade).

    ``gamma``/``beta`` may carry a SMALLER leading batch than ``x`` when
    ``x.shape[0]`` is a multiple of it (the batched T-frame render from one
    start frame): they are then broadcast per clip instead of materializing
    T repeated full-resolution maps (reference recomputes them per frame —
    ``util.py:473-500``)."""
    n, h, w, c = x.shape
    g = num_groups
    # single-read Pallas path (TPU inference): the frame stays VMEM-resident
    # so x is read from HBM once instead of the stats + normalize double
    # read.  Gated (ops.fused_spade_enabled) and shape-checked; lowering-time
    # platform dispatch keeps every non-TPU backend on the portable form.
    from .. import ops as _ops
    from ..ops import spade_gn as _spade_gn

    if (_ops.fused_spade_enabled()
            and gamma.shape == beta.shape
            and gamma.shape[1:] == x.shape[1:]
            and _spade_gn.kernel_supported(x.shape, gamma.shape[0], g,
                                           x.dtype)):
        return _spade_gn.spade_gn_fused(x, gamma, beta, g, eps)
    return _spade_gn_portable(x, gamma, beta, g, eps)


def _spade_gn_portable(x, gamma, beta, g: int, eps: float):
    n, h, w, c = x.shape
    x32 = x.astype(jnp.float32)
    # two-stage stats: reduce over (H, W) per channel FIRST (native NHWC
    # lane layout — a direct (..., G, C/G) grouped reduction puts a
    # C/G-wide minor dim on the vector lanes), then group-average the tiny
    # (N, C) row.  Equal element counts per group -> identical math.
    m_c = jnp.mean(x32, axis=(1, 2))                       # (n, c)
    m2_c = jnp.mean(jnp.square(x32), axis=(1, 2))          # (n, c)
    mu_g = jnp.mean(m_c.reshape(n, g, c // g), axis=2)     # (n, g)
    m2_g = jnp.mean(m2_c.reshape(n, g, c // g), axis=2)
    var = jnp.maximum(m2_g - jnp.square(mu_g), 0.0)
    s = jax.lax.rsqrt(var + eps)
    # broadcast per-group scalars back to channels: (n, 1, 1, c)
    mu = jnp.repeat(mu_g, c // g, axis=1)[:, None, None, :]
    sc = jnp.repeat(s, c // g, axis=1)[:, None, None, :]
    normed = ((x32 - mu) * sc).astype(x.dtype)
    bm = gamma.shape[0]
    if bm != n:
        if n % bm != 0:
            raise ValueError(f"mod batch {bm} does not divide x batch {n}")
        t = n // bm
        out = (normed.reshape(bm, t, h, w, c) * (1.0 + gamma[:, None])
               + beta[:, None])
        return out.reshape(n, h, w, c)
    return normed * (1.0 + gamma) + beta


class Spade(nn.Module):
    """SPADE conditioning: parameter-free GroupNorm modulated by gamma/beta
    convs over the (resized) conditioning image (reference ``util.py:473-500``).

    ``modulation(y, h, w)`` exposes the (gamma, beta) branch separately: it
    depends only on the conditioning image, so a caller decoding T frames
    from ONE start frame can compute it once and pass it back via ``mod=``
    (the reference recomputes it every frame — identical math, ~10x the
    conditioning-branch FLOPs).  Submodules carry the explicit names the
    previous ``@nn.compact`` auto-naming produced (``Conv_0..2``) so ported
    checkpoints load unchanged.
    """

    num_features: int
    norm: str = "group"
    hidden: int = 128
    align_corners: bool = False  # torch F.interpolate(align_corners=True)
    dtype: Dtype = None

    def setup(self):
        # the parameter-free GroupNorm half lives in ``spade_gn_modulate``
        # (fused with the modulation); no flax layer needed — GroupNorm_0
        # never held params, so ported checkpoints are unaffected
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
        # fused GN+modulation (identical math to a parameter-free
        # ``nn.GroupNorm`` followed by ``* (1.0 + gamma) + beta``)
        return spade_gn_modulate(
            x, gamma, beta, _num_groups(self.num_features), 1e-5)


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
