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


# ---------------------------------------------------------------------------
# Fused MaCowUnit inverse: the ENTIRE unit (MCF-A, MCF-B, ActNorm, MCF-C,
# MCF-D, ActNorm — reference ``macow2.py:925-995``) inverted inside ONE
# pallas_call.  At the shipped 8x8 latents the XLA row-scan inverse is
# latency-bound on thousands of tiny sequential HLOs (50 steps x 16 MCFs x 8
# rows x ~10 ops); here the four row/column recurrences run back-to-back in
# VMEM with ONE im2row matmul + ONE 1x1 matmul per row and no inter-op
# overhead.  Orders C/D run in H<->W-transposed space (square latents).
# ---------------------------------------------------------------------------


def _elu(a):
    # expm1 has no Pallas TPU lowering
    return jnp.where(a > 0, a, jnp.exp(jnp.minimum(a, 0.0)) - 1.0)


def _unit_kernel(y_ref, w_shift_ref, w_hid_ref, hc_ref,
                 an_bias_ref, an_inv_ref, x_ref, buf_ref, cur_ref, *,
                 kh: int, kw: int, alpha: float):
    """Shapes (all VMEM): y (B,H,W,C) [H==W];
    w_shift (4, kh, kw, C, hid) — per MCF A/B/C/D, C/D pre-swapped into scan
    space; w_hid (4, hid, 2C) — the hidden half of the weight-normalized 1x1
    output conv; hc (4, B, H, W, 2C) — precomputed ``elu(h) @ w_h + b`` per
    MCF (the conditioning half of the output conv + bias; zero-input elu
    baseline when unconditional), C/D entries pre-transposed;
    an_bias/an_inv (2, C) — [AN1, AN2], inv = 1/(exp(log_scale)+1e-8);
    x (out) (B,H,W,C); scratches: buf (B, H+kh, W+2cw, C), cur (B,H,W,C)
    holding each recurrence's y-side input.

    Mosaic constraints shape this kernel: no dynamic slicing of VALUES
    (row-indexed reads go through refs via ``pl.ds``) and no lane-dim
    concatenation at non-native offsets (the im2row concat and the
    [conv_out, h] concat are replaced by per-tap dot accumulation and the
    precomputed ``hc`` term — ``dot(concat(a, b), [Wa; Wb]) ==
    dot(a, Wa) + dot(b, Wb)``)."""
    B, H, W, C = y_ref.shape
    cw = (kw - 1) // 2

    def rowscan(idx: int, reverse: bool):
        """One masked-conv recurrence: consumes cur_ref, returns x (value)."""
        buf_ref[...] = jnp.zeros_like(buf_ref)
        w_hid = w_hid_ref[idx]

        def body(i, _):
            row = (H - 1 - i) if reverse else i
            start = row + 1 if reverse else row
            window = buf_ref[:, pl.ds(start, kh)]  # (B, kh, W+2cw, C)
            acc = jnp.zeros((B, W, w_hid.shape[0]), jnp.float32)
            for dy in range(kh):
                for dx in range(kw):
                    acc = acc + jax.lax.dot_general(
                        window[:, dy, dx : dx + W, :],
                        w_shift_ref[idx, dy, dx],
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            hc_row = hc_ref[idx, :, pl.ds(row, 1)][:, 0]  # (B, W, 2C)
            raw = jax.lax.dot_general(
                _elu(acc), w_hid, dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + hc_row
            mu, log_scale = raw[..., :C], raw[..., C:]
            scale = jnp.tanh(log_scale * 0.5) * alpha + 1.0
            y_row = cur_ref[:, pl.ds(row, 1)][:, 0]
            x_row = (y_row - mu) / (scale + 1e-12)
            write_at = row if reverse else row + kh
            buf_ref[:, pl.ds(write_at, 1), cw : cw + W, :] = x_row[:, None]
            return 0

        jax.lax.fori_loop(0, H, body, 0)
        if reverse:
            return buf_ref[:, :H, cw : cw + W, :]
        return buf_ref[:, kh:, cw : cw + W, :]

    # inverse of Chain(A, B, AN1, C, D, AN2)
    x = (y_ref[...] - an_bias_ref[1]) * an_inv_ref[1]
    cur_ref[...] = jnp.swapaxes(x, 1, 2)      # -> transposed space for D, C
    xt = rowscan(3, reverse=True)    # D
    cur_ref[...] = xt
    xt = rowscan(2, reverse=False)   # C
    x = jnp.swapaxes(xt, 1, 2)
    cur_ref[...] = (x - an_bias_ref[0]) * an_inv_ref[0]
    x = rowscan(1, reverse=True)     # B
    cur_ref[...] = x
    x = rowscan(0, reverse=False)    # A
    x_ref[...] = x


def macow_unit_inverse_pallas(
    y: jnp.ndarray,
    h: Optional[jnp.ndarray],
    mcf_params,  # [A, B, C, D] MaskedConvFlow param dicts
    an_params,  # [AN1, AN2] ActNorm param dicts
    kernel_size: Tuple[int, int],
    alpha: float = 1.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Inverse of one MaCowUnit (affine transform, ELU, square latents).

    ``mcf_params``: A/B store w_shift (kh,kw,C,hid); C/D store it with the
    kernel dims already swapped (kw,kh,C,hid) exactly like the reference —
    swapping them back here puts C/D in transposed-scan space."""
    B, H, W, C = y.shape
    assert H == W, "fused unit kernel assumes square latents"
    kh, kw = kernel_size
    cw = (kw - 1) // 2
    h_channels = 0 if h is None else h.shape[-1]

    def shift_kernel(p, swap):
        w = p["w_shift"]
        return jnp.swapaxes(w, 0, 1) if swap else w

    def norm_out(p):
        out = p["out"]
        norm = jnp.sqrt(jnp.sum(out["v"] ** 2, axis=(0, 1, 2)) + 1e-12)
        return (out["v"] * (out["g"] / norm))[0, 0], out["b"]  # (hid+Ch, 2C)

    w_shift = jnp.stack([
        shift_kernel(mcf_params[0], False), shift_kernel(mcf_params[1], False),
        shift_kernel(mcf_params[2], True), shift_kernel(mcf_params[3], True),
    ])  # (4, kh, kw, C, hid)
    hid = w_shift.shape[-1]
    hcs, w_hids = [], []
    h32 = None if h is None else h.astype(jnp.float32)
    for i, p in enumerate(mcf_params):
        w_out, b_out = norm_out(p)
        w_hids.append(w_out[:hid])
        # conditioning half of the 1x1 out conv + bias, precomputed per pixel
        # (elu is elementwise over the [conv, h] concat, so the h half
        # separates exactly); zero h contributes elu(0) @ w_h == 0
        hc = jnp.zeros((B, H, W, w_out.shape[-1]), jnp.float32) + b_out
        if h_channels:
            hc = hc + jnp.einsum(
                "bhwc,cd->bhwd", jax.nn.elu(h32), w_out[hid:].astype(
                    jnp.float32))
        if i >= 2:  # C/D run in H<->W-transposed scan space
            hc = jnp.swapaxes(hc, 1, 2)
        hcs.append(hc)
    w_hid = jnp.stack(w_hids)
    hc = jnp.stack(hcs)
    an_bias = jnp.stack([p["bias"] for p in an_params])
    an_inv = jnp.stack(
        [1.0 / (jnp.exp(p["log_scale"]) + 1e-8) for p in an_params])

    kernel = functools.partial(_unit_kernel, kh=kh, kw=kw, alpha=alpha)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(y.shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(6)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((B, H + kh, W + 2 * cw, C), jnp.float32),
            pltpu.VMEM((B, H, W, C), jnp.float32),
        ],
        interpret=interpret,
    )(y.astype(jnp.float32), w_shift.astype(jnp.float32),
      w_hid.astype(jnp.float32), hc,
      an_bias.astype(jnp.float32), an_inv.astype(jnp.float32))
