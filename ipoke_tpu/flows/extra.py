"""Additional INN variants from the reference's flow zoo.

* ``MixCDFCoupling`` — coupling whose elementwise transform is a logistic
  mixture CDF composed with an inverse sigmoid (Flow++-style; reference
  ``UnconditionalMixCDFCouplingBlock`` / ``MultiscaleMixCDF``,
  flow_blocks.py:761-962, macow2.py:731-818).  Forward is closed-form; the
  inverse solves the monotone CDF by bisection (the reference does the same
  iteratively).
* ``HierarchicalCouplingFlow`` — stacked [perm -> actnorm -> NICE x n] blocks
  with channel factoring (reference ``HierarchicalConvCouplingFlow``,
  macow2.py:1186-1268 / ``SupervisedHierarchicalCouplingTransformer``).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from .base import Chain, Flow
from .macow import NICE2d, _conv_init
from .primitives import ActNorm, Shuffle, wn_conv_apply, wn_conv_init


def _log_sigmoid(x):
    return -jax.nn.softplus(-x)


def mixlogcdf(x, logits, means, log_scales):
    """CDF of a K-logistic mixture, elementwise.  x (..., 1-broadcastable) vs
    params (..., K)."""
    w = jax.nn.softmax(logits, axis=-1)
    z = (x[..., None] - means) * jnp.exp(-log_scales)
    return jnp.sum(w * jax.nn.sigmoid(z), axis=-1)


def mixlogpdf_log(x, logits, means, log_scales):
    logw = jax.nn.log_softmax(logits, axis=-1)
    z = (x[..., None] - means) * jnp.exp(-log_scales)
    log_pdf = z - log_scales - 2.0 * jax.nn.softplus(z)
    return jax.nn.logsumexp(logw + log_pdf, axis=-1)


def _inv_mixlogcdf(y, logits, means, log_scales, iters: int = 50):
    """Bisection inverse of the monotone mixture CDF."""
    lo = jnp.min(means - 20.0 * jnp.exp(log_scales), axis=-1)
    hi = jnp.max(means + 20.0 * jnp.exp(log_scales), axis=-1)

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        below = mixlogcdf(mid, logits, means, log_scales) < y
        return jnp.where(below, mid, lo), jnp.where(below, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return 0.5 * (lo + hi)


@dataclasses.dataclass(frozen=True)
class MixCDFCoupling(Flow):
    """Channel-split coupling: x2' = logit(MixLogCDF(x2; net(x1))) * exp(a) + b.

    NHWC; params net is a small conv stack on x1 emitting (3K + 2) values per
    transformed channel.
    """

    in_channels: int
    hidden_channels: int = 64
    components: int = 4

    @property
    def _c1(self):
        return self.in_channels // 2 + self.in_channels % 2

    @property
    def _c2(self):
        return self.in_channels // 2

    def init(self, rng, x_shape=None):
        k1, k2 = jax.random.split(rng)
        out_c = self._c2 * (3 * self.components + 2)
        return {
            "w1": _conv_init(k1, 3, 3, self._c1, self.hidden_channels),
            "out": wn_conv_init(k2, 3, 3, self.hidden_channels, out_c,
                                zero_init=True),
        }

    def _params(self, params, x1):
        h = jax.nn.elu(jax.lax.conv_general_dilated(
            x1, params["w1"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")))
        raw = wn_conv_apply(params["out"], h, "SAME")
        K = self.components
        raw = raw.reshape(*raw.shape[:-1], self._c2, 3 * K + 2)
        logits = raw[..., :K]
        means = raw[..., K : 2 * K]
        log_scales = jnp.clip(raw[..., 2 * K : 3 * K], -7.0, 7.0)
        a = jnp.tanh(raw[..., 3 * K])
        b = raw[..., 3 * K + 1]
        return logits, means, log_scales, a, b

    def forward(self, params, x, h=None):
        x1, x2 = x[..., : self._c1], x[..., self._c1 :]
        logits, means, log_scales, a, b = self._params(params, x1)
        eps = 1e-5
        cdf = jnp.clip(mixlogcdf(x2, logits, means, log_scales), eps, 1 - eps)
        y2 = (jnp.log(cdf) - jnp.log1p(-cdf)) * jnp.exp(a) + b
        # logdet: log pdf + log d(logit)/d(cdf) + a
        ld_el = (mixlogpdf_log(x2, logits, means, log_scales)
                 - jnp.log(cdf) - jnp.log1p(-cdf) + a)
        ld = jnp.sum(ld_el.reshape(x.shape[0], -1), axis=1)
        return jnp.concatenate([x1, y2], axis=-1), ld

    def inverse(self, params, y, h=None):
        x1, y2 = y[..., : self._c1], y[..., self._c1 :]
        logits, means, log_scales, a, b = self._params(params, x1)
        cdf = jax.nn.sigmoid((y2 - b) * jnp.exp(-a))
        x2 = _inv_mixlogcdf(cdf, logits, means, log_scales)
        return jnp.concatenate([x1, x2], axis=-1)


def make_mixcdf_block(in_channels, hidden_channels=64, components=4) -> Chain:
    return Chain((
        ActNorm(in_channels),
        Shuffle(in_channels),
        MixCDFCoupling(in_channels, hidden_channels, components),
    ))


def build_mixcdf_flow(in_channels, n_blocks=4, hidden_channels=64,
                      components=4) -> Chain:
    """Reference ``UnsupervisedHierarchicalMixCDFTransformer`` core (compact:
    a uniform stack rather than the reference's multiscale variant)."""
    return Chain(tuple(
        make_mixcdf_block(in_channels, hidden_channels, components)
        for _ in range(n_blocks)
    ))


@dataclasses.dataclass(frozen=True)
class HierarchicalCouplingFlow(Flow):
    """[Shuffle -> ActNorm -> n x NICE(cond)] blocks with channel factoring
    (reference HierarchicalConvCouplingFlow, macow2.py:1186-1268)."""

    num_steps: Tuple[int, ...]
    in_channels: int
    hidden_channels: int
    h_channels: int = 0
    factor: int = 4
    n_blocks: int = 2

    def _levels(self):
        levels = []
        c = self.in_channels
        step = self.in_channels // self.factor
        for n in self.num_steps:
            parts = [Shuffle(c), ActNorm(c)]
            for _ in range(n * self.n_blocks):
                parts.append(NICE2d(
                    c, hidden_channels=self.hidden_channels,
                    h_channels=self.h_channels, split_type="continuous",
                    order="up",
                ))
            levels.append((Chain(tuple(parts)), c - step))
            c -= step
        return levels, c

    def init(self, rng, x_shape=None):
        out = []
        for chain, _ in self._levels()[0]:
            rng, k = jax.random.split(rng)
            out.append(chain.init(k, x_shape))
        return out

    def forward(self, params, x, h=None):
        ld = jnp.zeros(x.shape[0], jnp.float32)
        out = x
        splits = []
        for (chain, keep), p in zip(self._levels()[0], params):
            out, l = chain.forward(p, out, h)
            ld = ld + l
            splits.append(out[..., keep:])
            out = out[..., :keep]
        splits.append(out)
        return jnp.concatenate(splits[::-1], axis=-1), ld

    def inverse(self, params, y, h=None):
        levels, _ = self._levels()
        out = y
        splits = []
        for _, keep in levels:
            splits.append(out[..., keep:])
            out = out[..., :keep]
        for (chain, _), p, z2 in zip(reversed(levels), reversed(params),
                                     reversed(splits)):
            out = jnp.concatenate([out, z2], axis=-1)
            out = chain.inverse(p, out, h)
        return out


# ---------------------------------------------------------------------------
# MADE — masked autoregressive MLP (reference ARFullyConnectedNet,
# modules.py:502-597; dormant in the reference's live experiments)
# ---------------------------------------------------------------------------

def made_masks(nin: int, hidden_sizes, nout: int, seed: int = 0,
               natural_ordering: bool = True):
    """Connectivity masks per layer (Germain et al. 2015; exactly the
    reference's ``update_masks`` construction)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    m = {-1: (np.arange(nin) if natural_ordering
              else rng.permutation(nin))}
    for l, h in enumerate(hidden_sizes):
        m[l] = rng.randint(m[l - 1].min(), nin - 1, size=h)
    L = len(hidden_sizes)
    masks = [m[l - 1][:, None] <= m[l][None, :] for l in range(L)]
    masks.append(m[L - 1][:, None] < m[-1][None, :])
    if nout > nin:
        k = nout // nin
        masks[-1] = np.concatenate([masks[-1]] * k, axis=1)
    return [jnp.asarray(mk.astype(np.float32)) for mk in masks]


@dataclasses.dataclass(frozen=True)
class MADE:
    """Autoregressive MLP: output chunk j depends only on inputs < j (under
    the ordering).  Optional conditioning net added layerwise like the
    reference's ``condnet`` (modules.py:583-589)."""

    nin: int
    hidden_sizes: Tuple[int, ...]
    nout: int
    ncond: int = 0
    natural_ordering: bool = True
    seed: int = 0

    def __post_init__(self):
        assert self.nout % self.nin == 0

    def _masks(self):
        return made_masks(self.nin, list(self.hidden_sizes), self.nout,
                          self.seed, self.natural_ordering)

    def init(self, rng):
        dims = [self.nin] + list(self.hidden_sizes) + [self.nout]
        ws = []
        for i, (d0, d1) in enumerate(zip(dims, dims[1:])):
            rng, k = jax.random.split(rng)
            scale = 1.0 / jnp.sqrt(d0)
            ws.append({"w": scale * jax.random.normal(k, (d0, d1)),
                       "b": jnp.zeros((d1,))})
        params = {"net": ws}
        if self.ncond > 0:
            cdims = [self.ncond] + list(self.hidden_sizes) + [self.nout]
            cs = []
            for d0, d1 in zip(cdims, cdims[1:]):
                rng, k = jax.random.split(rng)
                cs.append({"w": jax.random.normal(k, (d0, d1))
                           / jnp.sqrt(d0), "b": jnp.zeros((d1,))})
            params["cond"] = cs
        return params

    def apply(self, params, x, y=None):
        masks = self._masks()
        h, hc = x, y
        for i, (lyr, mk) in enumerate(zip(params["net"], masks)):
            if i > 0:
                h = jax.nn.relu(h)
                if hc is not None:
                    hc = jax.nn.relu(hc)
            out = h @ (lyr["w"] * mk) + lyr["b"]
            if self.ncond > 0:
                c = params["cond"][i]
                hc_out = hc @ c["w"] + c["b"]
                out = out + hc_out
                hc = hc_out
            h = out
        return h


# ---------------------------------------------------------------------------
# Gated conv / gated attention (reference GatedConv2d /
# GatedAttentionLayer, modules.py:814-910; building blocks of the dormant
# attention-flow variants) — NHWC
# ---------------------------------------------------------------------------

def concat_elu(x):
    """ConcatELU (doubles channels)."""
    return jnp.concatenate([jax.nn.elu(x), jax.nn.elu(-x)], axis=-1)


def _gate(x):
    a, b = jnp.split(x, 2, axis=-1)
    return a * jax.nn.sigmoid(b)


@dataclasses.dataclass(frozen=True)
class GatedConv2d:
    """x + gate(conv(concat_elu(conv(concat_elu(x)) [+ cond])))."""

    dim: int
    dim_cond: int = 0
    dim_out: int = 0  # 0 -> same as dim

    @property
    def _out(self):
        return self.dim_out or self.dim

    def init(self, rng):
        ks = jax.random.split(rng, 4)

        def cv(k, kh, kw, cin, cout):
            return {"w": _conv_init(k, kh, kw, cin, cout),
                    "b": jnp.zeros((cout,))}

        p = {
            "conv1": cv(ks[0], 3, 3, 2 * self.dim, self.dim),
            "conv2": cv(ks[1], 3, 3, 2 * self.dim, 2 * self._out),
        }
        if self.dim_cond:
            p["cond_conv"] = cv(ks[2], 3, 3, 2 * self.dim_cond, self.dim)
        if self.dim_out:
            p["conv_sc"] = cv(ks[3], 1, 1, self.dim, self._out)
        return p

    def apply(self, params, x, xc=None):
        def conv(p, a):
            return jax.lax.conv_general_dilated(
                a, p["w"], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b"]

        c1 = conv(params["conv1"], concat_elu(x))
        sc = conv(params["conv_sc"], x) if self.dim_out else x
        if self.dim_cond:
            c1 = c1 + conv(params["cond_conv"], concat_elu(xc))
        c2 = conv(params["conv2"], concat_elu(c1))
        return sc + _gate(c2)


@dataclasses.dataclass(frozen=True)
class GatedAttention:
    """x + gate(proj2(MHSA(x + pos_emb))) over the H*W token grid (one
    batched matmul pair on the MXU)."""

    channels: int
    heads: int

    def __post_init__(self):
        assert self.channels % self.heads == 0

    def init(self, rng, spatial: Tuple[int, int]):
        k1, k2, k3 = jax.random.split(rng, 3)
        c = self.channels
        return {
            "proj1": {"w": jax.random.normal(k1, (c, 3 * c)) / jnp.sqrt(c),
                      "b": jnp.zeros((3 * c,))},
            "proj2": {"w": jax.random.normal(k2, (c, 2 * c)) / jnp.sqrt(c),
                      "b": jnp.zeros((2 * c,))},
            "pos_emb": 0.02 * jax.random.normal(k3, (*spatial, c)),
        }

    def apply(self, params, x):
        B, H, W, C = x.shape
        d = C // self.heads
        t = H * W
        h = (x + params["pos_emb"]).reshape(B, t, C)
        qkv = h @ params["proj1"]["w"] + params["proj1"]["b"]
        qkv = qkv.reshape(B, t, 3, self.heads, d).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        w = jax.nn.softmax(q @ k.transpose(0, 1, 3, 2) / jnp.sqrt(float(d)),
                           axis=-1)
        a = (w @ v).transpose(0, 2, 1, 3).reshape(B, t, C)
        out = a @ params["proj2"]["w"] + params["proj2"]["b"]
        return x + _gate(out.reshape(B, H, W, 2 * C))
