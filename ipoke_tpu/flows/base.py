"""Functional invertible-flow protocol.

Every flow op is a small static-config object (dataclass-like) with:

  * ``init(rng, x_shape) -> params``      params is a pytree of jnp arrays
  * ``forward(params, x, h=None) -> (y, logdet)``   logdet shape ``(B,)``
  * ``inverse(params, y, h=None) -> x``
  * ``ddi(params, x, h=None) -> (y, logdet, params')``  data-dependent init

This replaces the reference's ``nn.Module`` flows with ``initialized`` buffers
(reference ``models/modules/INN/macow2.py``, ``macow_utils.py:211-251``): here
data-dependent init is an explicit functional pass over the first batch that
returns re-initialized params, so the jitted train step never branches.

Convention: arrays are **NHWC** (channels last — TPU friendly), channel ops act
on axis ``-1``.  Non-trainable leaves (shuffle permutations, LU masks, ...) are
stored in the params tree under keys prefixed ``buf_``; use
:func:`trainable_mask` to exclude them from optimizers.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Any


@dataclasses.dataclass(frozen=True)
class Flow:
    """Base class; subclasses are frozen dataclasses (hashable static config)."""

    def init(self, rng, x_shape: Sequence[int]) -> Params:
        raise NotImplementedError

    def forward(self, params, x, h=None):
        raise NotImplementedError

    def inverse(self, params, y, h=None):
        raise NotImplementedError

    # default: DDI is forward with unchanged params
    def ddi(self, params, x, h=None):
        y, ld = self.forward(params, x, h)
        return y, ld, params

    def output_shape(self, x_shape: Sequence[int]) -> Tuple[int, ...]:
        """Shape of forward(x) given x_shape (no batch dim).  Identity for
        most flows; reshaping stacks override (base samples for the inverse
        must be drawn at THIS shape — reference make_flow_input,
        second_stage_video.py:300-311)."""
        return tuple(x_shape)


@dataclasses.dataclass(frozen=True)
class Chain(Flow):
    """Sequential composition of heterogeneous flows."""

    flows: Tuple[Flow, ...]

    def init(self, rng, x_shape):
        keys = jax.random.split(rng, len(self.flows))
        return [f.init(k, x_shape) for f, k in zip(self.flows, keys)]

    def forward(self, params, x, h=None):
        ld = jnp.zeros(x.shape[0], dtype=jnp.float32)
        for f, p in zip(self.flows, params):
            x, l = f.forward(p, x, h)
            ld = ld + l
        return x, ld

    def inverse(self, params, y, h=None):
        for f, p in zip(reversed(self.flows), reversed(params)):
            y = f.inverse(p, y, h)
        return y

    def ddi(self, params, x, h=None):
        ld = jnp.zeros(x.shape[0], dtype=jnp.float32)
        new_params = []
        for f, p in zip(self.flows, params):
            x, l, p2 = f.ddi(p, x, h)
            new_params.append(p2)
            ld = ld + l
        return x, ld, new_params


def trainable_mask(params) -> Any:
    """Pytree of bools: True for trainable leaves, False for ``buf_*`` buffers."""

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if isinstance(v, (dict, list, tuple)):
                    out[k] = walk(v)
                else:
                    out[k] = not k.startswith("buf_")
            return out
        if isinstance(node, (list, tuple)):
            t = [walk(v) for v in node]
            return tuple(t) if isinstance(node, tuple) else t
        return True

    return walk(params)


def count_params(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
