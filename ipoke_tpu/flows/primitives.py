"""Elementwise invertible transforms and small invertible layers.

TPU-native re-design of the reference MaCow toolkit
(``models/modules/INN/macow_utils.py:23-209`` transforms,
``macow2.py:476-540`` ActNorm, ``macow2.py:596-649`` LU 1x1 conv,
``flow_blocks.py:314-326`` Shuffle).  All arrays NHWC.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import Flow


# ---------------------------------------------------------------------------
# Elementwise transforms parameterized by a conditioning net's output.
# Each maps raw net output -> transform params, and applies fwd/bwd with
# per-sample logdet (summed over all non-batch dims).
# ---------------------------------------------------------------------------

def _sum_logdet(t):
    # fp32 accumulation: under bf16 mixed precision the per-coupling sum over
    # H*W*C log-scales would otherwise round away ~3 decimal digits, and the
    # total is itself summed across ~hundreds of couplings
    return jnp.sum(t.reshape(t.shape[0], -1).astype(jnp.float32), axis=1)


class Additive:
    n_params = 1

    @staticmethod
    def calc(raw):
        return (raw,)

    @staticmethod
    def fwd(z, params):
        (mu,) = params
        return z + mu, jnp.zeros(z.shape[0], z.dtype)

    @staticmethod
    def bwd(z, params):
        (mu,) = params
        return z - mu


class Affine:
    """``y = scale*z + mu`` with ``scale = 1 + alpha*tanh(log_scale/2)``
    (reference ``macow_utils.py:42-67``)."""

    n_params = 2

    def __init__(self, alpha: float = 1.0):
        self.alpha = alpha

    def calc(self, raw):
        mu, log_scale = jnp.split(raw, 2, axis=-1)
        scale = jnp.tanh(log_scale * 0.5) * self.alpha + 1.0
        return mu, scale

    @staticmethod
    def fwd(z, params):
        mu, scale = params
        return scale * z + mu, _sum_logdet(jnp.log(scale))

    @staticmethod
    def bwd(z, params):
        mu, scale = params
        return (z - mu) / (scale + 1e-12)


class ReLUTransform:
    """Piecewise scaling active on positive pre-images
    (reference ``macow_utils.py:69-95``)."""

    n_params = 2

    @staticmethod
    def calc(raw):
        mu, log_scale = jnp.split(raw, 2, axis=-1)
        return mu, jnp.tanh(log_scale)

    @staticmethod
    def fwd(z, params):
        mu, scale = params
        s = scale * (z > 0.0).astype(z.dtype) + 1.0
        return s * z + mu, _sum_logdet(jnp.log(s))

    @staticmethod
    def bwd(z, params):
        mu, scale = params
        z = z - mu
        s = scale * (z > 0.0).astype(z.dtype) + 1.0
        return z / (s + 1e-12)


def get_transform(name: str, alpha: float = 1.0):
    if name == "additive":
        return Additive()
    if name == "affine":
        return Affine(alpha)
    if name == "relu":
        return ReLUTransform()
    raise ValueError(f"unknown transform {name!r}")


# ---------------------------------------------------------------------------
# ActNorm (per-channel affine with data-dependent init)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ActNorm(Flow):
    channels: int

    def init(self, rng, x_shape=None):
        return {
            "log_scale": 0.05 * jax.random.normal(rng, (self.channels,)),
            "bias": jnp.zeros((self.channels,)),
        }

    def forward(self, params, x, h=None):
        y = x * jnp.exp(params["log_scale"]) + params["bias"]
        hw = x.shape[1] * x.shape[2] if x.ndim == 4 else 1
        ld = jnp.full((x.shape[0],),
                      jnp.sum(params["log_scale"].astype(jnp.float32)) * hw)
        return y, ld

    def inverse(self, params, y, h=None):
        return (y - params["bias"]) / (jnp.exp(params["log_scale"]) + 1e-8)

    def ddi(self, params, x, h=None):
        # Glow-style data-dependent init from *input* statistics, so the
        # post-init output is exactly normalized (the reference instead uses
        # stats of the randomly-scaled output, macow2.py:522-540, which only
        # approximately normalizes; we keep the exact version).
        flat = x.reshape(-1, x.shape[-1])
        mean = jnp.mean(flat, axis=0)
        std = jnp.std(flat, axis=0, ddof=1)
        inv = 1.0 / (std + 1e-6)
        new = {"log_scale": jnp.log(inv), "bias": -mean * inv}
        y, ld = self.forward(new, x)
        return y, ld, new


# ---------------------------------------------------------------------------
# Channel shuffle (fixed random permutation)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Shuffle(Flow):
    channels: int

    def init(self, rng, x_shape=None):
        perm = jax.random.permutation(rng, self.channels)
        return {
            "buf_perm": perm.astype(jnp.int32),
            "buf_inv_perm": jnp.argsort(perm).astype(jnp.int32),
        }

    def forward(self, params, x, h=None):
        y = jnp.take(x, params["buf_perm"], axis=-1)
        return y, jnp.zeros(x.shape[0], x.dtype)

    def inverse(self, params, y, h=None):
        return jnp.take(y, params["buf_inv_perm"], axis=-1)


# ---------------------------------------------------------------------------
# Invertible 1x1 conv, LU-parameterized (reference macow2.py:596-649)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class InvConvLU(Flow):
    channels: int

    def init(self, rng, x_shape=None):
        c = self.channels
        w = np.asarray(jax.random.normal(rng, (c, c)))
        q, _ = np.linalg.qr(w)
        import scipy.linalg as alg

        p, l, u = alg.lu(q.astype(np.float64))
        s = np.diag(u)
        u = np.triu(u, k=1)
        return {
            "buf_p": jnp.asarray(p, jnp.float32),
            "buf_sign_s": jnp.asarray(np.sign(s), jnp.float32),
            "l": jnp.asarray(l, jnp.float32),
            "u": jnp.asarray(u, jnp.float32),
            "log_s": jnp.asarray(np.log(np.abs(s)), jnp.float32),
        }

    def _weight(self, params):
        c = self.channels
        lmask = jnp.tril(jnp.ones((c, c)), -1)
        wl = params["l"] * lmask + jnp.eye(c)
        wu = params["u"] * lmask.T + jnp.diag(
            params["buf_sign_s"] * jnp.exp(params["log_s"])
        )
        return params["buf_p"] @ wl @ wu  # (out, in)

    def forward(self, params, x, h=None):
        w = self._weight(params)
        y = jnp.einsum("...i,oi->...o", x, w)
        hw = x.shape[1] * x.shape[2] if x.ndim == 4 else 1
        ld = jnp.full((x.shape[0],),
                      jnp.sum(params["log_s"].astype(jnp.float32)) * hw)
        return y, ld

    def inverse(self, params, y, h=None):
        w = self._weight(params)
        w_inv = jnp.linalg.inv(w)
        return jnp.einsum("...i,oi->...o", y, w_inv)


# ---------------------------------------------------------------------------
# Weight-normalized conv (functional; used inside coupling nets)
# ---------------------------------------------------------------------------

def wn_conv_init(rng, kh, kw, cin, cout, zero_init=False):
    v = 0.05 * jax.random.normal(rng, (kh, kw, cin, cout))
    g = jnp.zeros((cout,)) if zero_init else _v_norm(v)
    return {"v": v, "g": g, "b": jnp.zeros((cout,))}


def _v_norm(v):
    return jnp.sqrt(jnp.sum(v**2, axis=(0, 1, 2)) + 1e-12)


def wn_conv_apply(params, x, padding="SAME"):
    w = params["v"] * (params["g"] / _v_norm(params["v"]))
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), padding, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return y + params["b"]


def conv_im2col(w, x):
    """kxk SAME conv as ONE (M, k*k*Cin) @ (k*k*Cin, N) dot over gathered
    patches — identical math to ``plain_conv_apply(..., "SAME")``.

    For convs whose INPUT channel count is far below the MXU's 128-lane
    contraction granule (NICE's w1: in1 ~ 30 -> hidden 2048), the conv
    emitter pads every tap's K to 128 (~4x wasted MACs); gathering the
    k*k taps into one contraction pads once over k*k*Cin instead.  fp32
    accumulation like the conv emitter, cast back to the input dtype."""
    kh, kw, cin, n = w.shape
    b, hh, ww, _ = x.shape
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    xp = jnp.pad(x, ((0, 0), (ph, kh - 1 - ph), (pw, kw - 1 - pw), (0, 0)))
    cols = jnp.concatenate(
        [xp[:, dy:dy + hh, dx:dx + ww, :]
         for dy in range(kh) for dx in range(kw)], axis=-1)
    out = jax.lax.dot_general(
        cols.reshape(b * hh * ww, kh * kw * cin),
        w.reshape(kh * kw * cin, n),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return out.reshape(b, hh, ww, n).astype(x.dtype)


def conv1x1_dot(w, x):
    """1x1 conv as ONE (M, Cin) @ (Cin, N) dot — identical math to the conv
    emitter (fp32 accumulation via ``preferred_element_type``, cast back to
    the input dtype).  Measured 3.9 ms faster than the conv emitter across
    the 215 NICE w2 (2048x2048) applications at the shipped scale (r4 TPU
    A/B, ``tools/profile_inverse.py`` nice_im2col vs nice_packed)."""
    b, hh, ww, cin = x.shape
    o = jax.lax.dot_general(
        x.reshape(b * hh * ww, cin), w[0, 0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return o.reshape(b, hh, ww, -1).astype(x.dtype)


def wn_conv_apply_packed(params, x):
    """3x3 SAME weight-norm conv as ONE (M, Cin) @ (Cin, 9*N) dot plus nine
    shifted adds — identical math to ``wn_conv_apply``.

    Rationale: every NICE coupling ends in a SKINNY conv (Cin ~ 2048 hidden,
    N = out_channels * n_params ~ 4 at the shipped factor-16 scale).  As a
    conv/dot that is K=9*2048 -> N=4, using 4 of the MXU's 128 lanes; packing
    the 9 taps into the N dimension (N=36) keeps the same FLOPs but 9x the
    lane utilization, and the shifted adds are a cheap (B,H,W,N) elementwise
    epilogue.  Accumulation is fp32 (``preferred_element_type``), matching
    the TPU conv emitter, then cast back to the input dtype.
    """
    v, g, b = params["v"], params["g"], params["b"]
    kh, kw, cin, n = v.shape
    w = (v * (g / _v_norm(v))).astype(x.dtype)
    bsz, hh, ww, _ = x.shape
    wp = jnp.transpose(w, (2, 0, 1, 3)).reshape(cin, kh * kw * n)
    u = jax.lax.dot_general(
        x.reshape(bsz * hh * ww, cin), wp, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(bsz, hh, ww, kh, kw, n)
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    up = jnp.pad(u, ((0, 0), (ph, kh - 1 - ph), (pw, kw - 1 - pw),
                     (0, 0), (0, 0), (0, 0)))
    acc = None
    for dy in range(kh):
        for dx in range(kw):
            # the tap that sees input pixel (y+dy-ph, x+dx-pw) contributes to
            # output pixel (y, x): shift the per-tap plane accordingly
            s = up[:, dy:dy + hh, dx:dx + ww, dy, dx, :]
            acc = s if acc is None else acc + s
    return acc.astype(x.dtype) + params["b"]


def wn_conv_ddi(params, x, padding="SAME", init_scale=1.0):
    """Data-dependent re-init of (g, b) so outputs have ~zero mean / unit std
    scaled by ``init_scale`` (reference ``macow_utils.py:231-246``)."""
    out = wn_conv_apply(params, x, padding)
    flat = out.reshape(-1, out.shape[-1])
    mean = jnp.mean(flat, axis=0)
    std = jnp.std(flat, axis=0, ddof=1)
    inv = init_scale / (std + 1e-6)
    new = dict(params)
    new["g"] = params["g"] * inv
    new["b"] = -mean * inv
    return new


# ---------------------------------------------------------------------------
# Shifted ("causal") conv for the masked conv flow (macow_utils.py:446-499)
# Orders: A sees strictly-above rows, B strictly-below, C strictly-left,
# D strictly-right.
# ---------------------------------------------------------------------------

def shifted_conv_apply(w, x, order: str):
    """w: (kH, kW, Cin, Cout) [for orders C/D: (kW, kH, ...) i.e. as stored],
    x: (B, H, W, C).  No bias (reference uses bias=False)."""
    kh, kw = w.shape[0], w.shape[1]
    if order == "A":
        cw = (kw - 1) // 2
        xp = jnp.pad(x, ((0, 0), (kh, 0), (cw, cw), (0, 0)))[:, :-1]
    elif order == "B":
        cw = (kw - 1) // 2
        xp = jnp.pad(x, ((0, 0), (0, kh), (cw, cw), (0, 0)))[:, 1:]
    elif order == "C":
        ch = (kh - 1) // 2
        xp = jnp.pad(x, ((0, 0), (ch, ch), (kw, 0), (0, 0)))[:, :, :-1]
    elif order == "D":
        ch = (kh - 1) // 2
        xp = jnp.pad(x, ((0, 0), (ch, ch), (0, kw), (0, 0)))[:, :, 1:]
    else:
        raise ValueError(order)
    return jax.lax.conv_general_dilated(
        xp, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def plain_conv_apply(w, x, padding="VALID"):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), padding, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


# ---------------------------------------------------------------------------
# Invertible space<->depth reshape (reference flow_blocks.py:665-702
# Reshape/Inverse)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SpaceToDepth(Flow):
    """(B, H, W, C) <-> (B, H/2, W/2, 4C); volume-preserving, logdet 0."""

    inverse_direction: bool = False  # True = depth-to-space forward

    def init(self, rng, x_shape=None):
        return {}

    @staticmethod
    def _down(x):
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)

    @staticmethod
    def _up(x):
        b, h, w, c = x.shape
        x = x.reshape(b, h, w, 2, 2, c // 4)
        return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * 2, w * 2, c // 4)

    def forward(self, params, x, h=None):
        y = self._up(x) if self.inverse_direction else self._down(x)
        return y, jnp.zeros(x.shape[0], x.dtype)

    def inverse(self, params, y, h=None):
        return self._down(y) if self.inverse_direction else self._up(y)
