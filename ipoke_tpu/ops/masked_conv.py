"""Pallas TPU kernel for the masked-conv flow inverse.

The MaCow inverse reconstructs rows sequentially (reference
``macow2.py:174-288``); the portable implementation in ``flows/macow.py`` is
a ``lax.fori_loop`` whose body dispatches a small conv per row.  This kernel
runs the WHOLE row recurrence inside one ``pallas_call``: the activation
buffer and both weight matrices stay pinned in VMEM across rows, each row is
a pair of small MXU matmuls, and no per-row HLO loop/DMA overhead remains.

Supports the shipped configuration: affine transform, ELU activation, orders
A/B natively (C/D via an H<->W transpose in the caller).  Conditioning rows
are concatenated before the 1x1 projection exactly like ``MCFBlock``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _inverse_kernel(y_ref, h_ref, w_shift_ref, w_out_ref, b_out_ref, x_ref,
                    buf_ref, *, kh: int, kw: int, reverse: bool, alpha: float,
                    h_channels: int):
    """One batch-block inverse. Shapes (all VMEM):
    y: (B, H, W, C); h: (B, H, W, Ch) (dummy (B,H,W,1) when unused);
    w_shift: (kh, kw, C, hid); w_out: (hid + Ch, 2C); b_out: (2C,);
    x (out): (B, H, W, C); buf scratch: (B, H + kh, W + 2*cw, C).
    """
    B, H, W, C = y_ref.shape
    hid = w_shift_ref.shape[-1]
    cw = (kw - 1) // 2

    buf_ref[...] = jnp.zeros_like(buf_ref)

    def body(i, _):
        row = (H - 1 - i) if reverse else i
        start = row + 1 if reverse else row
        # hidden activations for this row: sum over the kh x kw taps
        acc = jnp.zeros((B, W, hid), jnp.float32)
        for dy in range(kh):
            win_row = buf_ref[:, pl.ds(start + dy, 1)][:, 0]  # (B, W+2cw, C)
            for dx in range(kw):
                tap = win_row[:, dx : dx + W, :]
                acc = acc + jax.lax.dot_general(
                    tap, w_shift_ref[dy, dx],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        if h_channels:
            h_row = h_ref[:, pl.ds(row, 1)][:, 0]
            acc = jnp.concatenate([acc, h_row], axis=-1)
        # ELU via exp (expm1 has no Pallas TPU lowering)
        acc = jnp.where(acc > 0, acc, jnp.exp(jnp.minimum(acc, 0.0)) - 1.0)
        raw = jax.lax.dot_general(
            acc, w_out_ref[...],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_out_ref[...]
        mu, log_scale = raw[..., :C], raw[..., C:]
        scale = jnp.tanh(log_scale * 0.5) * alpha + 1.0
        y_row = y_ref[:, pl.ds(row, 1)][:, 0]
        x_row = (y_row - mu) / (scale + 1e-12)
        write_at = row if reverse else row + kh
        buf_ref[:, pl.ds(write_at, 1), cw : cw + W, :] = x_row[:, None]
        return 0

    jax.lax.fori_loop(0, H, body, 0)
    if reverse:
        x_ref[...] = buf_ref[:, :H, cw : cw + W, :]
    else:
        x_ref[...] = buf_ref[:, kh:, cw : cw + W, :]


def masked_conv_inverse_pallas(
    y: jnp.ndarray,
    h: Optional[jnp.ndarray],
    w_shift: jnp.ndarray,
    w_out: jnp.ndarray,
    b_out: jnp.ndarray,
    order: str,
    alpha: float = 1.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Inverse of the affine masked-conv flow.

    y (B,H,W,C); h (B,H,W,Ch) or None; w_shift (kh,kw,C,hid) — for orders C/D
    pass the kernel as stored (axes already swapped per the reference);
    w_out (hid+Ch, 2C) ALREADY weight-normalized; b_out (2C,).
    """
    if order in ("C", "D"):
        yt = jnp.swapaxes(y, 1, 2)
        ht = None if h is None else jnp.swapaxes(h, 1, 2)
        xt = masked_conv_inverse_pallas(
            yt, ht, jnp.swapaxes(w_shift, 0, 1), w_out, b_out,
            "A" if order == "C" else "B", alpha, interpret,
        )
        return jnp.swapaxes(xt, 1, 2)

    B, H, W, C = y.shape
    kh, kw = w_shift.shape[0], w_shift.shape[1]
    cw = (kw - 1) // 2
    h_channels = 0 if h is None else h.shape[-1]
    h_in = h if h is not None else jnp.zeros((B, H, W, 1), y.dtype)

    kernel = functools.partial(
        _inverse_kernel, kh=kh, kw=kw, reverse=(order == "B"), alpha=alpha,
        h_channels=h_channels,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(y.shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(5)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((B, H + kh, W + 2 * cw, C), jnp.float32),
        ],
        interpret=interpret,
    )(y.astype(jnp.float32), h_in.astype(jnp.float32),
      w_shift.astype(jnp.float32), w_out.astype(jnp.float32),
      b_out.astype(jnp.float32))
