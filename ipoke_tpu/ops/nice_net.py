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
                  itemsize: int, train: bool = False) -> Optional[int]:
    """Largest divisor of ``batch`` whose tile fits the VMEM budget: resident
    weights + double-buffered zcol/u blocks + two live hidden activations
    per item (the train variant also double-buffers the two residual output
    blocks).  Env ``IPOKE_NICE_BLOCK_B`` overrides (0 disables) — the
    override is still validated against the variant-aware VMEM budget (the
    train kernel needs more VMEM per item than inference, so a block tuned
    on the inference kernel could otherwise overflow; advisor r4)."""
    fixed = (k1 * hid + hid * hid + hid * nine_cout) * itemsize
    per_b = hw * (2 * (k1 + nine_cout * 2) * itemsize  # io blocks, 2x buffered
                  + 2 * hid * itemsize    # the two live hidden activations
                  + hid * 4)              # one fp32 dot accumulator
    if train:
        per_b += hw * 4 * hid * itemsize  # a/b residual out blocks, 2x buffered
    env = os.environ.get("IPOKE_NICE_BLOCK_B")
    if env is not None:
        bb = int(env)
        if bb <= 0 or batch % bb != 0:
            return None
        if fixed + bb * per_b > _VMEM_BUDGET:
            import warnings

            warnings.warn(
                f"IPOKE_NICE_BLOCK_B={bb} exceeds the "
                f"{'train' if train else 'inference'} VMEM budget "
                f"({fixed + bb * per_b} > {_VMEM_BUDGET} bytes); "
                "falling back to the portable emitters for this shape")
            return None
        return bb
    for bb in (16, 10, 8, 5, 4, 2, 1):
        if batch % bb == 0 and fixed + bb * per_b <= _VMEM_BUDGET:
            return bb
    return None


def nice_net_fits(params, z, h, train: bool = False) -> bool:
    """Static (shape/dtype-only, tracer-safe) check that the kernel's shape
    family applies — the exact gates ``nice_net_raw_pallas`` (and, with
    ``train=True``, ``nice_net_raw_train``) enforce."""
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
                         jnp.dtype(z.dtype).itemsize, train=train) is not None


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


# ---------------------------------------------------------------------------
# Differentiable (training-forward) fused path
# ---------------------------------------------------------------------------
#
# The density-direction ``NICE2d.forward`` of the NLL train step evaluates
# the SAME coupling nets as sampling.  ``nice_net_raw_train`` runs the fused
# 3-dot kernel there too, under ``jax.custom_vjp``:
#
# - primal call (no differentiation — e.g. the outer pass of
#   ``jax.checkpoint``): the plain inference kernel, NO residual writes;
# - fwd rule (under ``jax.grad`` / the remat recompute): a kernel variant
#   that also writes the two post-ELU hidden activations to HBM — exactly
#   the residuals XLA's own autodiff of the portable chain would save;
# - bwd rule: hand-written.  The three big contractions' adjoints are
#   explicit fp32-accumulated dots over the stored residuals; the cheap,
#   fiddly ends of the chain — the weight-norm out conv (+h branch, bias)
#   and the im2col patch gather — go through ``jax.vjp`` of the exact
#   portable primitives, so their math cannot drift from ``NICE2d._raw``.
#
# ELU' is reconstructed from the POST-activation residual:
# elu'(x) = 1 for x>0, exp(x) = elu(x)+1 for x<=0, so
# deriv = where(post > 0, 1, post + 1) with no pre-activation stored.


def _nice_net_train_kernel(zcol_ref, w1_ref, w2_ref, wp_ref,
                           u_ref, a_ref, b_ref):
    """The fused chain, additionally emitting the post-ELU hiddens."""
    dt = zcol_ref.dtype
    a = jax.lax.dot_general(
        zcol_ref[...], w1_ref[...],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    a = _elu_f32(a).astype(dt)
    a_ref[...] = a
    b = jax.lax.dot_general(
        a, w2_ref[...],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    b = _elu_f32(b).astype(dt)
    b_ref[...] = b
    u_ref[...] = jax.lax.dot_general(
        b, wp_ref[...],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _zcol3(z):
    """SAME 3x3 im2col patch gather, tap order identical to
    ``primitives.conv_im2col`` (dy-major, channels contiguous per tap)."""
    batch, hh, ww, c1 = z.shape
    zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = jnp.concatenate(
        [zp[:, dy:dy + hh, dx:dx + ww, :]
         for dy in range(3) for dx in range(3)], axis=-1)
    return cols.reshape(batch, hh * ww, 9 * c1)


def _elu_bwd(post, g):
    """Cotangent through ELU given the POST-activation value."""
    one = jnp.ones((), post.dtype)
    return g * jnp.where(post > 0, one, post + one)


def _train_impl(params, z, h, interpret):
    """Fused forward emitting residuals: (raw, a_post, b_post)."""
    from ..flows.primitives import _v_norm, conv_im2col

    w1, w2 = params["w1"], params["w2"]
    v, g, b_out = params["out"]["v"], params["out"]["g"], params["out"]["b"]
    _, _, c1, hid = w1.shape
    cout = v.shape[-1]
    batch, hh, ww, _ = z.shape
    hw = hh * ww
    block_b = _pick_block_b(batch, hw, 9 * c1, hid, 9 * cout,
                            jnp.dtype(z.dtype).itemsize, train=True)
    assert block_b is not None, "caller must gate on nice_net_fits(train=True)"

    dt = z.dtype
    w_eff = (v * (g / _v_norm(v))).astype(dt)
    wp = jnp.transpose(w_eff[:, :, :hid, :], (2, 0, 1, 3)).reshape(
        hid, 9 * cout)
    zcol = _zcol3(z)

    grid = (batch // block_b,)
    u, a, b = pl.pallas_call(
        _nice_net_train_kernel,
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
        out_specs=(
            pl.BlockSpec((block_b, hw, 9 * cout), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, hw, hid), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, hw, hid), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, hw, 9 * cout), jnp.float32),
            jax.ShapeDtypeStruct((batch, hw, hid), dt),
            jax.ShapeDtypeStruct((batch, hw, hid), dt),
        ),
        interpret=interpret,
    )(zcol, w1.reshape(9 * c1, hid).astype(dt), w2[0, 0].astype(dt), wp)

    up = jnp.pad(u.reshape(batch, hh, ww, 3, 3, cout),
                 ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            s = up[:, dy:dy + hh, dx:dx + ww, dy, dx, :]
            acc = s if acc is None else acc + s
    raw = acc.astype(dt) + b_out
    if h is not None and w_eff.shape[2] > hid:
        raw = raw + conv_im2col(w_eff[:, :, hid:, :],
                                jax.nn.elu(h.astype(dt)))
    return raw, a, b


def _tail(out_params, h, b4d):
    """The exact portable tail of ``NICE2d._raw``: weight-norm packed out
    conv over concat([post-ELU hidden, elu(h)]).  Used (via ``jax.vjp``) for
    the out-conv/bias/h-branch adjoints so their math cannot drift."""
    from ..flows.primitives import wn_conv_apply_packed

    x = b4d if h is None else jnp.concatenate(
        [b4d, jax.nn.elu(h.astype(b4d.dtype))], axis=-1)
    return wn_conv_apply_packed(out_params, x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def nice_net_raw_train(interpret: bool, params, z, h):
    """Differentiable fused ``NICE2d._raw`` for the density-direction
    forward of training.  Primal (undifferentiated) calls run the plain
    inference kernel — no residual traffic — so the outer pass of
    ``jax.checkpoint`` stays as cheap as sampling; under differentiation the
    fwd/bwd rules below take over."""
    out = nice_net_raw_pallas(params, z, h, interpret=interpret)
    assert out is not None, "caller must gate on nice_net_fits"
    return out


def _nice_train_fwd(interpret, params, z, h):
    raw, a, b = _train_impl(params, z, h, interpret)
    return raw, (params, z, h, a, b)


def _nice_train_bwd(interpret, res, grad):
    params, z, h, a, b = res
    dt = z.dtype
    hid = params["w1"].shape[-1]
    batch, hh, ww, _ = z.shape
    hw = hh * ww
    f32 = jnp.float32

    # out conv (+ bias + h branch) through the portable tail's own vjp
    b4d = b.reshape(batch, hh, ww, hid)
    if h is None:
        _, tail_vjp = jax.vjp(lambda op, bb: _tail(op, None, bb),
                              params["out"], b4d)
        d_out, db4d = tail_vjp(grad)
        dh = None
    else:
        _, tail_vjp = jax.vjp(_tail, params["out"], h, b4d)
        d_out, dh, db4d = tail_vjp(grad)

    # w2 (1x1, hid x hid): db_pre = dL/d(pre-ELU of b)
    w2p = params["w2"]
    db_pre = _elu_bwd(b, db4d.reshape(batch, hw, hid))
    dW2 = jax.lax.dot_general(
        a.reshape(batch * hw, hid), db_pre.reshape(batch * hw, hid),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32)
    da_post = jax.lax.dot_general(
        db_pre, w2p[0, 0].astype(dt),
        dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=f32).astype(dt)

    # w1 (3x3 via im2col): da_pre over the patch matrix
    zcol = _zcol3(z)
    da_pre = _elu_bwd(a, da_post)
    k1 = zcol.shape[-1]
    dW1 = jax.lax.dot_general(
        zcol.reshape(batch * hw, k1), da_pre.reshape(batch * hw, hid),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32)
    dzcol = jax.lax.dot_general(
        da_pre, params["w1"].reshape(k1, hid).astype(dt),
        dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=f32).astype(dt)
    _, zcol_vjp = jax.vjp(_zcol3, z)
    dz, = zcol_vjp(dzcol)

    dparams = {
        "w1": dW1.reshape(params["w1"].shape).astype(params["w1"].dtype),
        "w2": dW2[None, None].astype(w2p.dtype),
        "out": d_out,
    }
    return dparams, dz, dh


nice_net_raw_train.defvjp(_nice_train_fwd, _nice_train_bwd)
