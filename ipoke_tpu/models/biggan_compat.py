"""Weight-compatible port of the reference's vendored BigGAN autoencoder
(``models/modules/autoencoders/{big_ae,biggan}.py``) — the FC fork's flow
encoder (``FCAEModel``).  The repo's own ``models/big_ae.py`` is the
TPU-first redesign used for from-scratch training; THIS module reproduces
the reference topology exactly so the fork's released FCAE checkpoints can
be carried over (same contract as the conv-stack ``torch_compat`` ports).

Structure (reference citations):
* ``TorchResnetEncoder`` — torchvision resnet backbone (frozen inference
  BatchNorm) + optional 1x1 in_conv for 2-channel flow + DenseEncoderLayer
  conv head -> 2*z_dim (big_ae.py:130-224; ``norm: bn`` configs).
* ``TorchBigGANDecoder64`` — ClassUp latent->class-embedding MLP
  (big_ae.py:46-63) + VariableDimGenerator64 (biggan.py:249-350): G_linear
  on the first latent split, 4 conditional-BN GBlocks with nearest 2x
  upsampling, final BN+relu+colorize.  ``sa_id == len(GBlock)`` so the
  SelfAttention block never executes at 64px — not ported.
* ``convert_torch_bigae`` — state_dict -> flax variables, collapsing every
  GANalyze ``SpectralNorm`` (weight_bar, u) into a plain weight via the
  module's own one-power-iteration math (biggan.py:23-74: forward updates
  u/v once from the stored vectors, then divides by sigma — deterministic
  given a dumped state, so the collapse is exact).

Parity proven in tests/test_bigae_parity.py against the reference run in
torch (random init + randomized BN stats).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

_BN = dict(use_running_average=True)


# ---------------------------------------------------------------------------
# Encoder: torchvision resnet + conv head
# ---------------------------------------------------------------------------


class _BasicBlock(nn.Module):  # resnet18/34
    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        out = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, name="conv1")(x)
        out = jax.nn.relu(nn.BatchNorm(**_BN, epsilon=1e-5, name="bn1")(out))
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      name="conv2")(out)
        out = nn.BatchNorm(**_BN, epsilon=1e-5, name="bn2")(out)
        residual = x
        if self.downsample:
            residual = nn.Conv(self.planes, (1, 1), strides=self.stride,
                               use_bias=False, name="downsample_conv")(x)
            residual = nn.BatchNorm(**_BN, epsilon=1e-5,
                                    name="downsample_bn")(residual)
        return jax.nn.relu(out + residual)


class _Bottleneck(nn.Module):  # resnet50/101
    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        out = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        out = jax.nn.relu(nn.BatchNorm(**_BN, epsilon=1e-5, name="bn1")(out))
        out = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, name="conv2")(out)
        out = jax.nn.relu(nn.BatchNorm(**_BN, epsilon=1e-5, name="bn2")(out))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      name="conv3")(out)
        out = nn.BatchNorm(**_BN, epsilon=1e-5, name="bn3")(out)
        residual = x
        if self.downsample:
            residual = nn.Conv(self.planes * 4, (1, 1), strides=self.stride,
                               use_bias=False, name="downsample_conv")(x)
            residual = nn.BatchNorm(**_BN, epsilon=1e-5,
                                    name="downsample_bn")(residual)
        return jax.nn.relu(out + residual)


_RESNETS = {  # torchvision stage plans
    "resnet18": (_BasicBlock, (2, 2, 2, 2)),
    "resnet34": (_BasicBlock, (3, 4, 6, 3)),
    "resnet50": (_Bottleneck, (3, 4, 6, 3)),
    "resnet101": (_Bottleneck, (3, 4, 23, 3)),
}


class TorchResnetEncoder(nn.Module):
    """big_ae.py ResnetEncoder: [in_conv ->] resnet features -> global avg
    pool -> 1x1 conv head -> (B, 2*z_dim).  Frozen BN throughout."""

    z_dim: int
    type: str = "resnet101"
    in_channels: int = 2

    @nn.compact
    def __call__(self, x):
        block, plan = _RESNETS[self.type]
        if self.in_channels != 3:
            x = nn.Conv(3, (1, 1), name="in_conv")(x)
        h = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    name="conv1")(x)
        h = jax.nn.relu(nn.BatchNorm(**_BN, epsilon=1e-5, name="bn1")(h))
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        expansion = 4 if block is _Bottleneck else 1
        for i, (planes, n) in enumerate(zip((64, 128, 256, 512), plan)):
            for j in range(n):
                stride = 2 if (i > 0 and j == 0) else 1
                down = j == 0 and (stride != 1
                                   or h.shape[-1] != planes * expansion)
                h = block(planes, stride, down, name=f"layer{i + 1}_{j}")(h)
        h = jnp.mean(h, axis=(1, 2), keepdims=True)  # AdaptiveAvgPool2d(1)
        h = nn.Conv(2 * self.z_dim, (1, 1), name="head")(h)
        return h[:, 0, 0, :]  # (B, 2*z_dim)

    def encode(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """DiagonalGaussianDistribution split (distributions.py:44-48):
        first half mean, second half logvar clamped to [-30, 10]."""
        h = self(x)
        mu, logvar = jnp.split(h, 2, axis=-1)
        return mu, jnp.clip(logvar, -30.0, 10.0)


# ---------------------------------------------------------------------------
# Decoder: ClassUp + VariableDimGenerator64
# ---------------------------------------------------------------------------


class _CBN(nn.Module):
    """ConditionalBatchNorm2d (biggan.py:116-130): affine-free BN with
    running stats; gamma/beta from (SN-collapsed) linears on the condition."""

    features: int
    cond_dim: int

    @nn.compact
    def __call__(self, x, y):
        out = nn.BatchNorm(**_BN, epsilon=1e-4, use_bias=False,
                           use_scale=False, name="bn")(x)
        gamma = nn.Dense(self.features, use_bias=False,
                         name="gamma_embed")(y) + 1.0
        beta = nn.Dense(self.features, use_bias=False, name="beta_embed")(y)
        return gamma[:, None, None, :] * out + beta[:, None, None, :]


class _GBlock(nn.Module):
    """biggan.py GBlock (upsample path, conditional BN)."""

    out_channel: int
    cond_dim: int

    @nn.compact
    def __call__(self, x, cond):
        in_ch = x.shape[-1]
        out = _CBN(in_ch, self.cond_dim, name="HyperBN")(x, cond)
        out = jax.nn.relu(out)
        B, H, W, C = out.shape
        up = jax.image.resize(out, (B, H * 2, W * 2, C), "nearest")
        out = nn.Conv(self.out_channel, (3, 3), padding=1, name="conv0")(up)
        out = _CBN(self.out_channel, self.cond_dim,
                   name="HyperBN_1")(out, cond)
        out = jax.nn.relu(out)
        out = nn.Conv(self.out_channel, (3, 3), padding=1, name="conv1")(out)
        # skip: upsample -> 1x1 (skip_proj always true on the upsample path)
        skip = jax.image.resize(x, (B, H * 2, W * 2, C), "nearest")
        skip = nn.Conv(self.out_channel, (1, 1), name="conv_sc")(skip)
        return out + skip


class TorchBigGANDecoder64(nn.Module):
    """BigGANDecoderWrapper + VariableDimGenerator64 for in_size 64
    (biggan.py:249-350,573-583): z splits into [z_dim-40, 10, 10, 10, 10];
    class embedding = linear(ClassUp(z)); 4 GBlocks 4->8->16->32->64."""

    z_dim: int
    chn: int = 96
    n_channels: int = 2
    n_class: int = 1000

    @nn.compact
    def __call__(self, z):
        # ClassUp(z_dim, depth=2, hidden=2*n_class, out=n_class): 4 linears
        # with LeakyReLU between -> softmax (big_ae.py:46-63,79)
        h = z
        dims = (2 * self.n_class, 2 * self.n_class, 2 * self.n_class,
                self.n_class)
        for i, d in enumerate(dims):
            h = nn.Dense(d, name=f"classup_{i}")(h)
            if i < len(dims) - 1:
                h = jax.nn.leaky_relu(h, 0.01)
        class_probs = jax.nn.softmax(h, axis=1)
        class_emb = nn.Dense(128, use_bias=False,
                             name="linear")(class_probs)

        splits = [self.z_dim - 40] + [10] * 4
        codes = jnp.split(z, np.cumsum(splits)[:-1], axis=1)
        out = nn.Dense(4 * 4 * 16 * self.chn, name="G_linear")(codes[0])
        out = out.reshape(-1, 4, 4, 16 * self.chn)
        widths = (16 * self.chn, 8 * self.chn, 4 * self.chn, self.chn)
        for i, w in enumerate(widths):
            cond = jnp.concatenate([codes[i + 1], class_emb], axis=1)
            out = _GBlock(w, 138, name=f"GBlock_{i}")(out, cond)
        out = nn.BatchNorm(**_BN, epsilon=1e-4,
                           name="ScaledCrossReplicaBN")(out)
        out = jax.nn.relu(out)
        out = nn.Conv(self.n_channels, (3, 3), padding=1,
                      name="colorize")(out)
        return jnp.tanh(out) if self.n_channels == 3 else out


class BigAECompat:
    """The reference FCAE pair with ported weights: encode(x) -> (mu,
    logvar); decode(z) -> flow/image map.  Variables from
    ``convert_torch_bigae``."""

    def __init__(self, z_dim: int, enc_type: str = "resnet101",
                 in_channels: int = 2, chn: int = 96):
        self.z_dim = z_dim
        self.encoder = TorchResnetEncoder(z_dim, enc_type, in_channels)
        self.decoder = TorchBigGANDecoder64(z_dim, chn, in_channels)

    def encode(self, variables, x):
        return self.encoder.apply(variables["encoder"], x,
                                  method=TorchResnetEncoder.encode)

    def decode(self, variables, z):
        return self.decoder.apply(variables["decoder"], z)


# ---------------------------------------------------------------------------
# torch -> flax conversion (spectral-norm collapse)
# ---------------------------------------------------------------------------


def _l2n(v, eps=1e-4):
    return v / (np.linalg.norm(v) + eps)


def collapse_spectral_norm(w_bar: np.ndarray, u: np.ndarray) -> np.ndarray:
    """GANalyze SpectralNorm (biggan.py:23-74): forward runs ONE power
    iteration from the stored u then divides by sigma — reproduce exactly
    so the collapsed weight equals what the oracle's next forward uses."""
    height = w_bar.shape[0]
    w = w_bar.reshape(height, -1)
    v = _l2n(w.T @ u)
    u2 = _l2n(w @ v)
    sigma = float(u2 @ (w @ v))
    return w_bar / sigma


def _cw(w):  # torch conv (out, in, kh, kw) -> flax (kh, kw, in, out)
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _sn_conv(state, prefix):
    return _cw(collapse_spectral_norm(
        np.asarray(state[f"{prefix}.module.weight_bar"]),
        np.asarray(state[f"{prefix}.module.weight_u"])))


def _sn_dense(state, prefix):
    return np.transpose(collapse_spectral_norm(
        np.asarray(state[f"{prefix}.module.weight_bar"]),
        np.asarray(state[f"{prefix}.module.weight_u"])))


def convert_torch_bigae(state: dict, z_dim: int,
                        enc_type: str = "resnet101") -> dict:
    """Reference BigAE state_dict (numpy leaves) -> {'encoder': vars,
    'decoder': vars} for BigAECompat."""
    P, S = {}, {}

    def put(tree, path, leaf):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = jnp.asarray(leaf)

    def bn(dst, src, eps_tree=None):
        put(P, dst + ["scale"], np.asarray(state[f"{src}.weight"]))
        put(P, dst + ["bias"], np.asarray(state[f"{src}.bias"]))
        put(S, dst + ["mean"], np.asarray(state[f"{src}.running_mean"]))
        put(S, dst + ["var"], np.asarray(state[f"{src}.running_var"]))

    # ---- encoder --------------------------------------------------------
    e = "encoder"
    if f"{e}.in_conv.weight" in state:
        put(P, ["in_conv", "kernel"], _cw(state[f"{e}.in_conv.weight"]))
        put(P, ["in_conv", "bias"], np.asarray(state[f"{e}.in_conv.bias"]))
    put(P, ["conv1", "kernel"], _cw(state[f"{e}.model.conv1.weight"]))
    bn(["bn1"], f"{e}.model.bn1")
    block, plan = _RESNETS[enc_type]
    n_convs = 3 if block is _Bottleneck else 2
    for i, n in enumerate(plan):
        for j in range(n):
            t = f"{e}.model.layer{i + 1}.{j}"
            d = [f"layer{i + 1}_{j}"]
            for k in range(1, n_convs + 1):
                put(P, d + [f"conv{k}", "kernel"],
                    _cw(state[f"{t}.conv{k}.weight"]))
                bn(d + [f"bn{k}"], f"{t}.bn{k}")
            if f"{t}.downsample.0.weight" in state:
                put(P, d + ["downsample_conv", "kernel"],
                    _cw(state[f"{t}.downsample.0.weight"]))
                bn(d + ["downsample_bn"], f"{t}.downsample.1")
    put(P, ["head", "kernel"],
        _cw(state[f"{e}.model.fc.sub_layers.0.weight"]))
    put(P, ["head", "bias"],
        np.asarray(state[f"{e}.model.fc.sub_layers.0.bias"]))
    enc_vars = {"params": P, "batch_stats": S}

    # ---- decoder --------------------------------------------------------
    P, S = {}, {}
    d0 = "decoder.map_to_class_embedding.main"
    for i, idx in enumerate((0, 2, 4, 6)):  # ClassUp depth=2 -> 4 linears
        put(P, [f"classup_{i}", "kernel"],
            np.transpose(np.asarray(state[f"{d0}.{idx}.weight"])))
        put(P, [f"classup_{i}", "bias"],
            np.asarray(state[f"{d0}.{idx}.bias"]))
    g = "decoder.decoder"
    put(P, ["linear", "kernel"],
        np.transpose(np.asarray(state[f"{g}.linear.weight"])))
    # G_linear was replaced by update_G_linear with SpectralNorm(Linear)
    # (biggan.py:568-571)
    put(P, ["G_linear", "kernel"], _sn_dense(state, f"{g}.G_linear"))
    put(P, ["G_linear", "bias"],
        np.asarray(state[f"{g}.G_linear.module.bias"]))
    for bi in range(4):
        t = f"{g}.GBlock.{bi}"
        d = [f"GBlock_{bi}"]
        for cname in ("conv0", "conv1", "conv_sc"):
            put(P, d + [cname, "kernel"], _sn_conv(state, f"{t}.{cname}"))
            put(P, d + [cname, "bias"],
                np.asarray(state[f"{t}.{cname}.module.bias"]))
        for hname in ("HyperBN", "HyperBN_1"):
            put(P, d + [hname, "gamma_embed", "kernel"],
                _sn_dense(state, f"{t}.{hname}.gamma_embed"))
            put(P, d + [hname, "beta_embed", "kernel"],
                _sn_dense(state, f"{t}.{hname}.beta_embed"))
            put(S, d + [hname, "bn", "mean"],
                np.asarray(state[f"{t}.{hname}.bn.running_mean"]))
            put(S, d + [hname, "bn", "var"],
                np.asarray(state[f"{t}.{hname}.bn.running_var"]))
    bn(["ScaledCrossReplicaBN"], f"{g}.ScaledCrossReplicaBN")
    put(P, ["colorize", "kernel"], _sn_conv(state, f"{g}.colorize"))
    put(P, ["colorize", "bias"],
        np.asarray(state[f"{g}.colorize.module.bias"]))
    dec_vars = {"params": P, "batch_stats": S}
    return {"encoder": enc_vars, "decoder": dec_vars}


def load_torch_bigae_npz(path: str, z_dim: int,
                         enc_type: str = "resnet101") -> dict:
    """npz of a reference FCAE checkpoint state_dict (strip the Lightning
    ``model.`` prefix when dumping with tools/convert_torch_checkpoint.py)
    -> BigAECompat variables."""
    raw = np.load(path)
    state = {k: raw[k] for k in raw.files}
    return convert_torch_bigae(state, z_dim, enc_type)
