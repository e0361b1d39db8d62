"""Spatial + temporal PatchGAN discriminators and GAN loss helpers.

TPU re-design of reference ``models/modules/discriminators/``:
``NLayerDiscriminator`` (patchgan.py:256-354, spectral-norm k4 convs),
3D-ResNet temporal discriminator (patchgan_3d.py:16-240, returns per-stage
feature maps), and ``disc_utils.py`` losses.  Both discriminators here return
``(logits, fmaps)`` so the generator's feature-matching loss has a uniform
contract.  Gradient penalty is a function of the discriminator apply-fn via
``jax.grad`` w.r.t. the input (replaces torch ``autograd.grad`` with
``retain_graph``; reference patchgan.py:337-346).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import _num_groups


def _sn(module, x, train):
    return nn.SpectralNorm(module)(x, update_stats=train)


class PatchDiscriminator2D(nn.Module):
    """k4/s2 spectral-norm conv PatchGAN; returns (logits_map, fmaps)."""

    ndf: int = 64
    n_layers: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        fmaps = []
        h = _sn(nn.Conv(self.ndf, (4, 4), strides=2, padding=1,
                        dtype=self.dtype), x, train)
        h = jax.nn.leaky_relu(h, 0.2)
        fmaps.append(h)
        nf = self.ndf
        for n in range(1, self.n_layers):
            nf = self.ndf * min(2**n, 8)
            h = _sn(nn.Conv(nf, (4, 4), strides=2, padding=1,
                            dtype=self.dtype), h, train)
            h = nn.GroupNorm(num_groups=_num_groups(nf))(h)
            h = jax.nn.leaky_relu(h, 0.2)
            fmaps.append(h)
        nf = self.ndf * min(2**self.n_layers, 8)
        h = _sn(nn.Conv(nf, (4, 4), strides=1, padding=1,
                        dtype=self.dtype), h, train)
        h = nn.GroupNorm(num_groups=_num_groups(nf))(h)
        h = jax.nn.leaky_relu(h, 0.2)
        fmaps.append(h)
        logits = _sn(nn.Conv(1, (4, 4), strides=1, padding=1,
                             dtype=self.dtype), h, train)
        return logits, fmaps


class _Block3d(nn.Module):
    planes: int
    stride: Tuple[int, int, int] = (1, 1, 1)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        inplanes = x.shape[-1]
        h = _sn(nn.Conv(self.planes, (3, 3, 3), strides=self.stride, padding=1,
                        use_bias=False, dtype=self.dtype), x, train)
        h = jax.nn.relu(nn.GroupNorm(num_groups=_num_groups(self.planes))(h))
        h = _sn(nn.Conv(self.planes, (3, 3, 3), padding=1, use_bias=False,
                        dtype=self.dtype), h, train)
        h = nn.GroupNorm(num_groups=_num_groups(self.planes))(h)
        if self.stride != (1, 1, 1) or inplanes != self.planes:
            res = _sn(nn.Conv(self.planes, (3, 3, 3), strides=self.stride,
                              padding=1, use_bias=False, dtype=self.dtype),
                      x, train)
            res = nn.GroupNorm(num_groups=_num_groups(self.planes))(res)
        else:
            res = x
        return jax.nn.relu(h + res)


class ResNet3DDiscriminator(nn.Module):
    """Temporal discriminator over (B, T, H, W, 3) windows; returns
    (logits (B, num_classes), per-stage fmaps)."""

    layers: Sequence[int] = (2, 2, 2, 2)
    num_classes: int = 1
    patch_temp_disc: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        st = 1 if self.patch_temp_disc else 2
        fmaps = []
        h = _sn(nn.Conv(64, (3, 7, 7), strides=(1, 2, 2),
                        padding=((1, 1), (3, 3), (3, 3)), use_bias=False,
                        dtype=self.dtype), x, train)
        h = jax.nn.relu(nn.GroupNorm(num_groups=16)(h))
        h = nn.max_pool(h, (3, 3, 3), strides=(1, 2, 2), padding=((1, 1),) * 3)
        for n_blocks, planes, (s, s_t) in zip(
            self.layers, (64, 128, 256, 512), ((1, 1), (1, st), (2, st), (2, st))
        ):
            h = _Block3d(planes, (s_t, s, s), dtype=self.dtype)(h, train)
            for _ in range(n_blocks - 1):
                h = _Block3d(planes, dtype=self.dtype)(h, train)
            fmaps.append(h)
        h = jnp.mean(h, axis=(1, 2, 3))
        logits = nn.Dense(self.num_classes, use_bias=False, dtype=self.dtype)(h)
        return logits, fmaps


# ---------------------------------------------------------------------------
# Losses (reference disc_utils.py + patchgan.py:322-354)
# ---------------------------------------------------------------------------

def hinge_d_loss(pred, real: bool):
    if real:
        return jnp.mean(jax.nn.relu(1.0 - pred))
    return jnp.mean(jax.nn.relu(1.0 + pred))


def bce_d_loss(pred, real: bool):
    target = jnp.ones_like(pred) if real else jnp.zeros_like(pred)
    return jnp.mean(
        jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))
    )


def gen_loss(pred_fake, bce: bool = False):
    if bce:
        return bce_d_loss(pred_fake, real=True)
    return -jnp.mean(pred_fake)


def fmap_loss(fmaps_fake, fmaps_real, loss: str = "l1"):
    total = 0.0
    for f, r in zip(fmaps_fake, fmaps_real):
        if loss == "l1":
            total += jnp.mean(jnp.abs(f - r))
        else:
            total += jnp.mean((f - r) ** 2)
    return total / len(fmaps_fake)


def gradient_penalty(disc_apply: Callable, x) -> jnp.ndarray:
    """R1-style penalty: per-sample squared grad norm of sum(pred) w.r.t. x.

    ``disc_apply(x) -> logits``.  Returns (B,) like the reference's ``gp``.
    """
    grad = jax.grad(lambda v: jnp.sum(disc_apply(v)))(x)
    return jnp.sum(grad.reshape(grad.shape[0], -1) ** 2, axis=1)


def adaptive_disc_weight(nll_grad_norm, g_grad_norm, max_w=1e4):
    """Adaptive generator/disc balancing weight
    (reference disc_utils.py:10-22): ||grad(nll)|| / (||grad(g)|| + 1e-4)."""
    w = nll_grad_norm / (g_grad_norm + 1e-4)
    return jnp.clip(w, 0.0, max_w)


class MinibatchDiscrimination(nn.Module):
    """Salimans et al. minibatch features (reference
    ``models/modules/discriminators/disc_utils.py:36-62``; constructed but
    unused in the reference's live training path): per-sample kernel
    similarities to the rest of the batch, concatenated onto the features.

    x (B, A) -> (B, A + out_features)."""

    in_features: int
    out_features: int
    kernel_dims: int
    mean: bool = False

    @nn.compact
    def __call__(self, x):
        x = x.reshape(-1, self.in_features)
        T = self.param(
            "T", lambda k, s: jax.random.normal(k, s),
            (self.in_features, self.out_features, self.kernel_dims))
        m = x @ T.reshape(self.in_features, -1)
        m = m.reshape(-1, self.out_features, self.kernel_dims)
        norm = jnp.sum(jnp.abs(m[None] - m[:, None]), axis=3)  # (B, B, F)
        o_b = jnp.sum(jnp.exp(-norm), axis=0) - 1.0  # subtract self distance
        if self.mean:
            o_b = o_b / (x.shape[0] - 1)
        return jnp.concatenate([x, o_b], axis=1)
