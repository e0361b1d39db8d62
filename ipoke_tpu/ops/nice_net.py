"""Pallas TPU kernel for the NICE coupling network (fused 3-dot chain).

The shipped 1054M cINN is ~215 NICE couplings (reference NICE nets:
``macow_utils.py:253-337``); each evaluates w1(3x3 conv) -> ELU -> w2(1x1,
hidden x hidden) -> ELU -> out(3x3, skinny).  At the shipped scale the two
hidden activations are (B*64, 2048) tensors: XLA materializes each to HBM
between its dot kernels, ~42 MB of round-trips per coupling that dwarf the
~16 MB of weight streaming this memory-bound chain actually requires.  This
kernel runs all three contractions back-to-back over batch tiles so the
hidden tensors never leave VMEM:

    zcol (Bt, HW, 9*C1) --dot--> ELU --dot(w2)--> ELU --dot(packed out)-->
    u (Bt, HW, 9*Cout)

The out conv uses the tap-packed form (``primitives.wn_conv_apply_packed``):
the contraction emits all 9 taps' outputs at once (N = 9*Cout keeps the MXU
lanes filled for the skinny head) and the cheap shifted-add epilogue — plus
the h-conditioning half of the out conv and its bias — runs in XLA outside
the kernel.  Identical math to ``flows.macow.NICE2d._raw``.

bf16-only on device (an fp32 w2 alone would overflow the ~16 MB VMEM);
fp32 accumulation on every dot via ``preferred_element_type``, with each
activation cast back to the input dtype before ELU exactly like the
portable emitters.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 14 * 1024 * 1024  # leave headroom under the ~16 MB/core VMEM


def _elu_f32(a):
    # ``a`` is the fp32 dot accumulator.  Mosaic on v5e rejects bf16 vector
    # compares ("Target does not support this comparison") and has no expm1
    # lowering, so BOTH the sign test and the value path run in fp32; the
    # caller casts the result to the compute dtype once afterwards (sub-ulp
    # difference vs the portable emitters' ELU-on-bf16).
    return jnp.where(a > 0.0, a, jnp.exp(jnp.minimum(a, 0.0)) - 1.0)


def _nice_net_kernel(zcol_ref, w1_ref, w2_ref, wp_ref, u_ref):
    """One batch-tile of the fused chain.  Shapes (all VMEM):
    zcol (Bt, HW, K1); w1 (K1, Hid); w2 (Hid, Hid); wp (Hid, 9*Cout);
    u (out) (Bt, HW, 9*Cout) fp32."""
    dt = zcol_ref.dtype
    a = jax.lax.dot_general(
        zcol_ref[...], w1_ref[...],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    a = _elu_f32(a).astype(dt)
    b = jax.lax.dot_general(
        a, w2_ref[...],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    b = _elu_f32(b).astype(dt)
    u_ref[...] = jax.lax.dot_general(
        b, wp_ref[...],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _pick_block_b(batch: int, hw: int, k1: int, hid: int, nine_cout: int,
                  itemsize: int) -> Optional[int]:
    """Largest divisor of ``batch`` whose tile fits the VMEM budget: resident
    weights + double-buffered zcol/u blocks + two live hidden activations
    per item.  Env ``IPOKE_NICE_BLOCK_B`` overrides (0 disables)."""
    env = os.environ.get("IPOKE_NICE_BLOCK_B")
    if env is not None:
        bb = int(env)
        if bb <= 0:
            return None
        return bb if batch % bb == 0 else None
    fixed = (k1 * hid + hid * hid + hid * nine_cout) * itemsize
    per_b = hw * (2 * (k1 + nine_cout * 2) * itemsize  # io blocks, 2x buffered
                  + 2 * hid * itemsize    # the two live hidden activations
                  + hid * 4)              # one fp32 dot accumulator
    for bb in (16, 10, 8, 5, 4, 2, 1):
        if batch % bb == 0 and fixed + bb * per_b <= _VMEM_BUDGET:
            return bb
    return None


def nice_net_fits(params, z, h) -> bool:
    """Static (shape/dtype-only, tracer-safe) check that the kernel's shape
    family applies — the exact gates ``nice_net_raw_pallas`` enforces."""
    w1, v = params["w1"], params["out"]["v"]
    kh, kw, c1, hid = w1.shape
    cout = v.shape[-1]
    batch, hh, ww, _ = z.shape
    hw = hh * ww
    if (kh, kw) != (3, 3) or v.shape[:2] != (3, 3) \
            or params["w2"].shape[:2] != (1, 1):
        return False
    if hid % 128 != 0 or hw > 512:
        return False
    if v.shape[2] > hid and h is None:
        return False
    return _pick_block_b(batch, hw, 9 * c1, hid, 9 * cout,
                         jnp.dtype(z.dtype).itemsize) is not None


def nice_net_raw_pallas(
    params,
    z: jnp.ndarray,
    h: Optional[jnp.ndarray],
    interpret: bool = False,
) -> Optional[jnp.ndarray]:
    """Fused ``NICE2d._raw``: returns the pre-transform net output
    (B, H, W, Cout), or None when the shape family doesn't fit the kernel
    (caller falls back to the portable emitters).

    ``params``: the NICE2d param dict — w1 (3,3,C1,Hid), w2 (1,1,Hid,Hid),
    out {v (3,3,Hid+Ch,Cout), g, b} (weight-norm, collapsed here).
    ``h``: conditioning (B,H,W,Ch) or None; its half of the out conv —
    ``conv3x3(elu(h)) @ w_out[Hid:]`` — separates exactly from the hidden
    half (elu is elementwise over the concat) and runs in XLA.
    """
    from ..flows.primitives import _v_norm, conv_im2col

    w1 = params["w1"]
    w2 = params["w2"]
    v, g, b_out = params["out"]["v"], params["out"]["g"], params["out"]["b"]
    kh, kw, c1, hid = w1.shape
    cout = v.shape[-1]
    batch, hh, ww, _ = z.shape
    hw = hh * ww
    if (kh, kw) != (3, 3) or v.shape[:2] != (3, 3) or w2.shape[:2] != (1, 1):
        return None
    if hid % 128 != 0 or hw > 512:
        return None
    if v.shape[2] > hid and h is None:
        # built with h-conditioning rows but no h given: the portable path
        # fails loudly (dot-shape error) — keep that behavior
        return None
    block_b = _pick_block_b(batch, hw, 9 * c1, hid, 9 * cout,
                            jnp.dtype(z.dtype).itemsize)
    if block_b is None:
        return None

    dt = z.dtype
    w_eff = (v * (g / _v_norm(v))).astype(dt)  # (3,3,Hid+Ch,Cout)
    w_hid_part = w_eff[:, :, :hid, :]
    # im2col patches in w1's tap order (dy-major, channels contiguous per
    # tap) — identical to primitives.conv_im2col
    zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)))
    zcol = jnp.concatenate(
        [zp[:, dy:dy + hh, dx:dx + ww, :]
         for dy in range(3) for dx in range(3)], axis=-1)
    zcol = zcol.reshape(batch, hw, 9 * c1)
    wp = jnp.transpose(w_hid_part, (2, 0, 1, 3)).reshape(hid, 9 * cout)

    grid = (batch // block_b,)
    u = pl.pallas_call(
        _nice_net_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, hw, 9 * c1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * c1, hid), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hid, hid), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hid, 9 * cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, hw, 9 * cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, hw, 9 * cout), jnp.float32),
        interpret=interpret,
    )(zcol, w1.reshape(9 * c1, hid).astype(dt), w2[0, 0].astype(dt), wp)

    # shifted-add epilogue, identical to wn_conv_apply_packed: the tap that
    # sees input pixel (y+dy-1, x+dx-1) contributes to output pixel (y, x)
    up = jnp.pad(u.reshape(batch, hh, ww, 3, 3, cout),
                 ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            s = up[:, dy:dy + hh, dx:dx + ww, dy, dx, :]
            acc = s if acc is None else acc + s
    raw = acc.astype(dt) + b_out
    if h is not None and w_eff.shape[2] > hid:
        # XLA side: use jax.nn.elu (expm1 form) exactly like the portable
        # emitters — the exp-based _elu is a Mosaic-only workaround
        raw = raw + conv_im2col(w_eff[:, :, hid:, :],
                                jax.nn.elu(h.astype(dt)))
    return raw
