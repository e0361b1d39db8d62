"""Fully-connected (vector-latent) coupling flows.

Rebuild of the reference's flat flows used by the FC/third-stage stack
(``models/modules/INN/flow_blocks.py``): ``ConditionalFlow:10-66`` (the
``SupervisedTransformer`` core, alternating cond-only / concat-conditioned
double couplings), ``UnconditionalFlow2:432-465`` (the
``UnsupervisedTransformer3`` core), with ActNorm, invertible leaky-relu and
channel shuffles.  Arrays are (B, D) vectors; conditioning (B, Dc).

Note: the reference's ``InvLeakyRelu`` reports logdet 0 (flow_blocks.py:377);
here the true per-sample logdet is accumulated by default.  The correction
term is DATA-DEPENDENT (log(alpha) x the count of negative activations), so
absolute NLL/bits-per-dim are not numerically comparable with the reference
(gradients are unchanged almost everywhere — the term is piecewise constant
in x).  Set ``InvLeakyRelu(reference_logdet=True)`` (plumbed via the flow
builders' ``reference_logdet`` arch key) to reproduce the reference's
logdet-0 bookkeeping for metric parity.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .base import Chain, Flow
from .primitives import ActNorm, Shuffle


def _mlp_init(rng, dims):
    params = []
    for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
        rng, k = jax.random.split(rng)
        lim = (6.0 / (din + dout)) ** 0.5
        params.append({
            "w": jax.random.uniform(k, (din, dout), minval=-lim, maxval=lim),
            "b": jnp.zeros((dout,)),
        })
    return params


def _mlp_apply(params, x, use_tanh):
    h = x
    for i, layer in enumerate(params):
        h = h @ layer["w"] + layer["b"]
        if i < len(params) - 1:
            h = jax.nn.leaky_relu(h, 0.01)
    return jnp.tanh(h) if use_tanh else h


@dataclasses.dataclass(frozen=True)
class InvLeakyRelu(Flow):
    """See module docstring: true data-dependent logdet by default;
    ``reference_logdet=True`` reports 0 like the reference
    (flow_blocks.py:372-394)."""

    alpha: float = 0.9
    reference_logdet: bool = False

    def init(self, rng, x_shape=None):
        return {}

    def _scale(self, x):
        return jnp.where(x >= 0, 1.0, self.alpha)

    def forward(self, params, x, h=None):
        s = self._scale(x)
        if self.reference_logdet:
            ld = jnp.zeros((x.shape[0],), x.dtype)
        else:
            ld = jnp.sum(jnp.log(s).reshape(x.shape[0], -1), axis=1)
        return x * s, ld

    def inverse(self, params, y, h=None):
        return y / self._scale(y)


@dataclasses.dataclass(frozen=True)
class VectorCoupling(Flow):
    """Double affine coupling over vector halves with alternating swap
    (reference ``ConditionalDoubleVectorCouplingBlock[_cond]`` /
    ``DoubleVectorCouplingBlock2``).

    cond_mode: 'none' (unconditional), 'concat' (s/t see [x_half, h]),
    'cond_only' (s/t see h alone).
    """

    in_channels: int
    hidden_dim: int
    depth: int = 2
    cond_channels: int = 0
    cond_mode: str = "none"

    def __post_init__(self):
        assert self.cond_mode in ("none", "concat", "cond_only")
        if self.cond_mode != "none":
            assert self.cond_channels > 0

    @property
    def _d1(self):
        return self.in_channels // 2 + self.in_channels % 2

    @property
    def _d2(self):
        return self.in_channels // 2

    def _net_in_dim(self):
        if self.cond_mode == "cond_only":
            return self.cond_channels
        return self._d1 + (self.cond_channels if self.cond_mode == "concat"
                           else 0)

    def init(self, rng, x_shape=None):
        dims = [self._net_in_dim()] + [self.hidden_dim] * (self.depth + 1) + [
            self._d2
        ]
        ks = jax.random.split(rng, 4)
        return {
            "s": [_mlp_init(ks[0], dims), _mlp_init(ks[1], dims)],
            "t": [_mlp_init(ks[2], dims), _mlp_init(ks[3], dims)],
        }

    def _cond_in(self, xa, h):
        if self.cond_mode == "cond_only":
            return h
        if self.cond_mode == "concat":
            return jnp.concatenate([xa, h], axis=-1)
        return xa

    def forward(self, params, x, h=None):
        ld = jnp.zeros(x.shape[0], x.dtype)
        for i in range(2):
            if i % 2 != 0:
                x = jnp.concatenate([x[:, self._d1 :], x[:, : self._d1]],
                                    axis=-1)
            xa, xb = x[:, : self._d1], x[:, self._d1 :]
            ci = self._cond_in(xa, h)
            scale = _mlp_apply(params["s"][i], ci, use_tanh=True)
            xb = xb * jnp.exp(scale) + _mlp_apply(params["t"][i], ci, False)
            x = jnp.concatenate([xa, xb], axis=-1)
            ld = ld + jnp.sum(scale, axis=-1)
        return x, ld

    def inverse(self, params, y, h=None):
        x = y
        for i in reversed(range(2)):
            xa, xb = x[:, : self._d1], x[:, self._d1 :]
            ci = self._cond_in(xa, h)
            scale = _mlp_apply(params["s"][i], ci, use_tanh=True)
            xb = (xb - _mlp_apply(params["t"][i], ci, False)) * jnp.exp(-scale)
            x = jnp.concatenate([xa, xb], axis=-1)
            if i % 2 != 0:
                # undo the pre-coupling half swap of forward step i
                x = jnp.concatenate([x[:, self._d2 :], x[:, : self._d2]],
                                    axis=-1)
        return x


@dataclasses.dataclass(frozen=True)
class FlatCouplingBlock(Flow):
    """actnorm -> [inv-lrelu] -> coupling -> shuffle (reference
    ``ConditionalFlatDoubleCouplingFlowBlock`` / ``...FlowBlock2``)."""

    in_channels: int
    hidden_dim: int
    depth: int = 2
    cond_channels: int = 0
    cond_mode: str = "none"
    activation: str = "none"  # 'lrelu' or 'none'
    reference_logdet: bool = False

    @property
    def _parts(self):
        parts = [ActNorm(self.in_channels)]
        if self.activation == "lrelu":
            parts.append(InvLeakyRelu(
                reference_logdet=self.reference_logdet))
        parts.append(VectorCoupling(
            self.in_channels, self.hidden_dim, self.depth,
            self.cond_channels, self.cond_mode,
        ))
        parts.append(Shuffle(self.in_channels))
        return parts

    def init(self, rng, x_shape=None):
        ks = jax.random.split(rng, len(self._parts))
        return [p.init(k, x_shape) for p, k in zip(self._parts, ks)]

    def forward(self, params, x, h=None):
        ld = jnp.zeros(x.shape[0], x.dtype)
        for part, p in zip(self._parts, params):
            x, l = part.forward(p, x, h)
            ld = ld + l
        return x, ld

    def inverse(self, params, y, h=None):
        for part, p in zip(reversed(self._parts), reversed(params)):
            y = part.inverse(p, y, h)
        return y

    def ddi(self, params, x, h=None):
        ld = jnp.zeros(x.shape[0], x.dtype)
        new = []
        for part, p in zip(self._parts, params):
            x, l, p2 = part.ddi(p, x, h)
            new.append(p2)
            ld = ld + l
        return x, ld, new


@dataclasses.dataclass(frozen=True)
class ConditionalFlatFlow(Flow):
    """n_flows conditioned blocks; even blocks cond-only, odd blocks concat
    (reference ``ConditionalFlow``, flow_blocks.py:10-66).

    Executed as ONE ``lax.scan`` over stacked (cond_only, concat) block pairs
    (same TPU-native pattern as the conv cINN's ScannedSteps), with one
    leftover block when n_flows is odd."""

    in_channels: int
    cond_channels: int
    hidden_dim: int
    depth: int
    n_flows: int
    activation: str = "lrelu"
    reference_logdet: bool = False

    def _block(self, mode):
        return FlatCouplingBlock(
            self.in_channels, self.hidden_dim, self.depth,
            self.cond_channels, cond_mode=mode, activation=self.activation,
            reference_logdet=self.reference_logdet,
        )

    def _structure(self):
        from .macow import ScannedSteps

        pair = Chain((self._block("cond_only"), self._block("concat")))
        scanned = ScannedSteps(pair, self.n_flows // 2) \
            if self.n_flows >= 2 else None
        leftover = self._block("cond_only") if self.n_flows % 2 else None
        return scanned, leftover

    def init(self, rng, x_shape=None):
        scanned, leftover = self._structure()
        k1, k2 = jax.random.split(rng)
        params = {}
        if scanned:
            params["pairs"] = scanned.init(k1, x_shape)
        if leftover:
            params["last"] = leftover.init(k2, x_shape)
        return params

    def forward(self, params, x, h=None):
        scanned, leftover = self._structure()
        ld = jnp.zeros(x.shape[0], x.dtype)
        if scanned:
            x, l = scanned.forward(params["pairs"], x, h)
            ld = ld + l
        if leftover:
            x, l = leftover.forward(params["last"], x, h)
            ld = ld + l
        return x, ld

    def inverse(self, params, y, h=None):
        scanned, leftover = self._structure()
        if leftover:
            y = leftover.inverse(params["last"], y, h)
        if scanned:
            y = scanned.inverse(params["pairs"], y, h)
        return y

    def ddi(self, params, x, h=None):
        scanned, leftover = self._structure()
        ld = jnp.zeros(x.shape[0], x.dtype)
        new = dict(params)
        if scanned:
            x, l, new["pairs"] = scanned.ddi(params["pairs"], x, h)
            ld = ld + l
        if leftover:
            x, l, new["last"] = leftover.ddi(params["last"], x, h)
            ld = ld + l
        return x, ld, new


@dataclasses.dataclass(frozen=True)
class UnconditionalFlatFlow(Flow):
    """n_flows unconditional blocks (reference ``UnconditionalFlow2``),
    executed as one ``lax.scan`` over stacked block params."""

    in_channels: int
    hidden_dim: int
    depth: int
    n_flows: int

    def _scanned(self):
        from .macow import ScannedSteps

        block = FlatCouplingBlock(self.in_channels, self.hidden_dim,
                                  self.depth, activation="none")
        return ScannedSteps(block, self.n_flows)

    def init(self, rng, x_shape=None):
        return self._scanned().init(rng, x_shape)

    def forward(self, params, x, h=None):
        return self._scanned().forward(params, x, h)

    def inverse(self, params, y, h=None):
        return self._scanned().inverse(params, y, h)

    def ddi(self, params, x, h=None):
        return self._scanned().ddi(params, x, h)


def build_supervised_transformer(arch) -> ConditionalFlatFlow:
    """Reference ``SupervisedTransformer`` (INN.py:19-88)."""
    get = arch.get if hasattr(arch, "get") else lambda k, d=None: getattr(arch, k, d)
    return ConditionalFlatFlow(
        in_channels=get("flow_in_channels"),
        cond_channels=get("h_channels"),
        hidden_dim=get("flow_mid_channels"),
        depth=get("flow_hidden_depth", 2),
        n_flows=get("n_flows", 20),
        activation=get("flow_activation", "lrelu"),
        reference_logdet=bool(get("reference_logdet", False)),
    )


def build_unsupervised_transformer3(arch) -> UnconditionalFlatFlow:
    """Reference ``UnsupervisedTransformer3`` (INN.py:250-297)."""
    get = arch.get if hasattr(arch, "get") else lambda k, d=None: getattr(arch, k, d)
    return UnconditionalFlatFlow(
        in_channels=get("flow_in_channels"),
        hidden_dim=get("flow_mid_channels"),
        depth=get("flow_hidden_depth", 2),
        n_flows=get("n_flows", 20),
    )
