"""Timing-only NICE-net stubs for per-shape attribution, shared by the
measurement tools (mirrors the r4 variants inline in profile_inverse.py —
numerics change, the remaining program structure doesn't).

``apply(name)`` monkeypatches ``NICE2d._raw`` at class level and returns a
restore callable.  Every stub keeps a cheap data dependency on the skipped
weights so XLA cannot DCE them, and all are differentiable (jnp ops only)
so they attribute the TRAIN step too: component train cost (fwd + its VJP)
= full fwdbwd - stubbed fwdbwd.

Stubs:
  no_w1       skip the (M, 9*in1)@(9*in1, hid) w1 conv (rank-1 broadcast
              keeps the z dependency and hidden shape)
  no_w2       skip the fat (M, hid)@(hid, hid) w2 dot (FLOP-dominant)
  out_center  out conv reduced to its center tap (costs the 3x3 gather)
  noact       identity activation (ELU share on the (M, hid) hidden)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ipoke_tpu.flows import macow as M
from ipoke_tpu.flows.primitives import _v_norm, conv_im2col


def conv_as_dots(w, x):
    """kxk SAME conv as k*k accumulated (B*H*W, C)@(C, N) matmuls —
    identical math to conv_general_dilated, different emitter."""
    kh, kw = w.shape[0], w.shape[1]
    b, hh, ww, c = x.shape
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    xp = jnp.pad(x, ((0, 0), (ph, kh - 1 - ph), (pw, kw - 1 - pw), (0, 0)))
    acc = None
    for dy in range(kh):
        for dx in range(kw):
            xi = xp[:, dy:dy + hh, dx:dx + ww, :].reshape(b * hh * ww, c)
            o = jax.lax.dot_general(
                xi, w[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = o if acc is None else acc + o
    return acc.reshape(b, hh, ww, -1).astype(x.dtype)


def conv_tap_packed(w, x):
    """kxk SAME conv via ONE (M,C)@(C, k*k*N) dot + k*k shifted adds."""
    kh, kw = w.shape[0], w.shape[1]
    cin, n = w.shape[2], w.shape[3]
    b, hh, ww, _ = x.shape
    wp = jnp.transpose(w, (2, 0, 1, 3)).reshape(cin, kh * kw * n)
    u = jax.lax.dot_general(
        x.reshape(b * hh * ww, cin), wp, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(b, hh, ww, kh, kw, n)
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    up = jnp.pad(u, ((0, 0), (ph, kh - 1 - ph), (pw, kw - 1 - pw),
                     (0, 0), (0, 0), (0, 0)))
    acc = None
    for dy in range(kh):
        for dx in range(kw):
            s = up[:, dy:dy + hh, dx:dx + ww, dy, dx, :]
            acc = s if acc is None else acc + s
    return acc.astype(x.dtype)


def _rest_after_w1(self, params, c, h, act_fn, w2_fn):
    c = act_fn(c)
    c = w2_fn(params["w2"], c)
    if self.h_channels:
        c = jnp.concatenate([c, h], axis=-1)
    c = act_fn(c)
    out = params["out"]
    w_out = out["v"] * (out["g"] / _v_norm(out["v"]))
    return conv_tap_packed(w_out, c) + out["b"]


def _raw_no_w1(self, params, z, h):
    act_fn = M._act(self.activation)
    hid = params["w2"].shape[2]
    c = jnp.mean(z, axis=-1, keepdims=True) * jnp.ones((1, 1, 1, hid),
                                                       z.dtype)
    return _rest_after_w1(self, params, c, h, act_fn, conv_as_dots)


def _raw_no_w2(self, params, z, h):
    act_fn = M._act(self.activation)
    c = conv_im2col(params["w1"], z)
    c = act_fn(c)
    c = c + jnp.mean(params["w2"]).astype(c.dtype)  # keep w2 alive
    if self.h_channels:
        c = jnp.concatenate([c, h], axis=-1)
    c = act_fn(c)
    out = params["out"]
    w_out = out["v"] * (out["g"] / _v_norm(out["v"]))
    return conv_tap_packed(w_out, c) + out["b"]


def _raw_out_center(self, params, z, h):
    act_fn = M._act(self.activation)
    c = conv_im2col(params["w1"], z)
    c = act_fn(c)
    c = conv_as_dots(params["w2"], c)
    if self.h_channels:
        c = jnp.concatenate([c, h], axis=-1)
    c = act_fn(c)
    out = params["out"]
    w_out = out["v"] * (out["g"] / _v_norm(out["v"]))
    kh, kw = w_out.shape[0], w_out.shape[1]
    wc = w_out[kh // 2, kw // 2]
    b, hh, ww, cc = c.shape
    o = jax.lax.dot_general(
        c.reshape(b * hh * ww, cc), wc, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return o.reshape(b, hh, ww, -1).astype(c.dtype) + out["b"]


def _raw_noact(self, params, z, h):
    c = conv_im2col(params["w1"], z)
    return _rest_after_w1(self, params, c, h, lambda t: t,
                          conv_as_dots)


STUBS = {
    "no_w1": _raw_no_w1,
    "no_w2": _raw_no_w2,
    "out_center": _raw_out_center,
    "noact": _raw_noact,
}


def apply(name: str):
    """Patch NICE2d._raw with the named stub; returns a restore callable.
    Also forces the portable (non-fused) NICE path so the patch actually
    takes effect under the kernel gates."""
    from ipoke_tpu import ops
    from ipoke_tpu.flows.macow import NICE2d

    fn = STUBS[name]
    orig = NICE2d._raw
    ops.set_fused_nice(False)
    NICE2d._raw = fn

    def restore():
        NICE2d._raw = orig
        ops.set_fused_nice(None)

    return restore
