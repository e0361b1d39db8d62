"""Convolutional GRU (reference ``models/modules/motion_models/rnn.py``).

The reference rolls the multi-layer ConvGRU out with a Python loop over T
frames; here the cell stack is a flax module applied once per step and the
T-step rollout is a ``jax.lax.scan`` in the model (`models/first_stage.py`),
so XLA compiles one step body.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class ConvGRUCell(nn.Module):
    hidden_size: int
    kernel_size: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x, h):
        """x: (B, H, W, Cin), h: (B, H, W, hidden) -> new hidden."""
        pad = self.kernel_size // 2
        conv = lambda name: nn.Conv(
            self.hidden_size, (self.kernel_size, self.kernel_size),
            padding=pad, name=name, dtype=self.dtype,
            kernel_init=nn.initializers.orthogonal(),
        )
        xh = jnp.concatenate([x, h], axis=-1)
        update = jax.nn.sigmoid(conv("update_gate")(xh))
        reset = jax.nn.sigmoid(conv("reset_gate")(xh))
        out = jnp.tanh(conv("out_gate")(jnp.concatenate([x, h * reset], axis=-1)))
        return h * (1.0 - update) + out * update


class ConvGRU(nn.Module):
    """n_layers stacked cells; hidden is a tuple of per-layer states."""

    hidden_size: int
    n_layers: int
    kernel_size: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x, hidden: Tuple):
        new_hidden = []
        inp = x
        for i in range(self.n_layers):
            h = ConvGRUCell(
                self.hidden_size, self.kernel_size, dtype=self.dtype,
                name=f"cell_{i}",
            )(inp, hidden[i])
            new_hidden.append(h)
            inp = h
        return tuple(new_hidden)
