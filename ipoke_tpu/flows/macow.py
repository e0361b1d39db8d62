"""MaCow-style conditional invertible flow, TPU-first.

Re-designs the reference cINN core (``models/modules/INN/macow2.py``:
``MaskedConvFlow:25-288``, ``NICE2d:291-474``, ``MaCowUnit:925-995``,
``MaCowStep:999-1117``, ``MultiScalePrior:543-593``,
``MultiScaleInternal:821-920``) as functional JAX flows:

* NHWC layout, fp32 (logdet accuracy), conv-heavy nets hit the MXU via XLA.
* Homogeneous step stacks within a multi-scale level run as a single
  ``lax.scan`` over stacked params (one compiled step body per level instead
  of ~50 unrolled modules).
* The masked-conv inverse — the reference's per-row Python loop
  (``macow2.py:174-288``) — is a ``lax.fori_loop`` over rows with a small
  VALID conv per row, compiled once; orders C/D reuse the height-scan via
  an H<->W transpose.
* Data-dependent init (ActNorm / weight-norm convs) is an explicit ``ddi``
  pass returning fresh params (see ``flows.base``), not an in-graph branch.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .base import Chain, Flow
from .primitives import (
    ActNorm,
    InvConvLU,
    Shuffle,
    SpaceToDepth,
    conv1x1_dot,
    conv_im2col,
    get_transform,
    plain_conv_apply,
    shifted_conv_apply,
    wn_conv_apply,
    wn_conv_apply_packed,
    wn_conv_ddi,
    wn_conv_init,
)


def _act(name: str):
    return {"relu": jax.nn.relu, "elu": jax.nn.elu,
            "leaky_relu": lambda x: jax.nn.leaky_relu(x, 0.1)}[name]


def _conv_init(rng, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    return jax.random.normal(rng, (kh, kw, cin, cout)) * (fan_in**-0.5)


def default_mcf_hidden(in_channels: int) -> int:
    # reference macow2.py:36-40
    if in_channels <= 96:
        return 4 * in_channels
    return min(2 * in_channels, 512)


# ---------------------------------------------------------------------------
# Masked convolutional flow
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MaskedConvFlow(Flow):
    """Autoregressive masked-conv flow (one of orders A/B/C/D).

    ``kernel_size`` is stored exactly as the reference stores it: orders C/D
    are constructed with the kernel dims already swapped, e.g. config kernel
    (2,3) -> A/B use (2,3), C/D use (3,2) (``macow2.py:941-961``).
    """

    in_channels: int
    kernel_size: Tuple[int, int]
    order: str = "A"
    hidden_channels: Optional[int] = None
    h_channels: int = 0
    transform: str = "affine"
    alpha: float = 1.0
    activation: str = "elu"

    @property
    def _hidden(self):
        return self.hidden_channels or default_mcf_hidden(self.in_channels)

    @property
    def _tr(self):
        return get_transform(self.transform, self.alpha)

    def init(self, rng, x_shape=None):
        kh, kw = self.kernel_size
        k1, k2 = jax.random.split(rng)
        out_c = self.in_channels * self._tr.n_params
        return {
            "w_shift": _conv_init(k1, kh, kw, self.in_channels, self._hidden),
            "out": wn_conv_init(
                k2, 1, 1, self._hidden + self.h_channels, out_c, zero_init=True
            ),
        }

    # -- conditioning net -------------------------------------------------
    def _net(self, params, x, h):
        c = shifted_conv_apply(params["w_shift"], x, self.order)
        if self.h_channels:
            if h is None:
                raise ValueError(
                    f"MaskedConvFlow built with h_channels={self.h_channels} "
                    "requires conditioning input h"
                )
            c = jnp.concatenate([c, h], axis=-1)
        c = _act(self.activation)(c)
        return wn_conv_apply(params["out"], c, padding="SAME")

    # -- directions --------------------------------------------------------
    def forward(self, params, x, h=None):
        raw = self._net(params, x, h)
        return self._tr.fwd(x, self._tr.calc(raw))

    def ddi(self, params, x, h=None):
        c = shifted_conv_apply(params["w_shift"], x, self.order)
        if self.h_channels:
            c = jnp.concatenate([c, h], axis=-1)
        c = _act(self.activation)(c)
        new = dict(params)
        new["out"] = wn_conv_ddi(params["out"], c, init_scale=0.0)
        y, ld = self.forward(new, x, h)
        return y, ld, new

    def inverse(self, params, y, h=None):
        from ..ops import pallas_enabled

        if self.transform == "affine" and pallas_enabled():
            # dispatch at LOWERING time: the Pallas kernel only exists for
            # real TPU; a CPU-lowered program (jax.default_device(cpu) while
            # the TPU backend is registered) takes the portable row scan
            def fused():
                from ..ops.masked_conv import masked_conv_inverse_pallas
                from .primitives import _v_norm

                out = params["out"]
                w_out = (out["v"] * (out["g"] / _v_norm(out["v"])))[0, 0]
                return masked_conv_inverse_pallas(
                    y, h if self.h_channels else None, params["w_shift"],
                    w_out, out["b"], self.order, self.alpha,
                )

            return jax.lax.platform_dependent(
                tpu=fused,
                default=lambda: self._inverse_portable(params, y, h),
            )
        return self._inverse_portable(params, y, h)

    def _inverse_portable(self, params, y, h=None):
        if self.order in ("A", "B"):
            return self._inverse_height(params, y, h, reverse=(self.order == "B"))
        # C/D: transpose H<->W, kernel axes, run the height scan
        yt = jnp.swapaxes(y, 1, 2)
        ht = None if h is None else jnp.swapaxes(h, 1, 2)
        pt = dict(params)
        pt["w_shift"] = jnp.swapaxes(params["w_shift"], 0, 1)
        xt = self._inverse_height(pt, yt, ht, reverse=(self.order == "D"))
        return jnp.swapaxes(xt, 1, 2)

    def _inverse_height(self, params, y, h, reverse: bool):
        """Sequential row reconstruction (reference macow2.py:174-231).

        The loop body is kept op-lean — at the shipped 8x8 latents the
        inverse is latency-bound on thousands of tiny sequential HLOs, not
        on FLOPs: the weight-norm normalization of the 1x1 output conv is
        hoisted OUT of the row loop (it is row-invariant), the row write
        lands at its column offset directly instead of pad+update, and the
        1x1 conv is a single dot_general per row."""
        b, height, width, c = y.shape
        kh, kw = params["w_shift"].shape[0], params["w_shift"].shape[1]
        cw = (kw - 1) // 2
        buf = jnp.zeros((b, height + kh, width + 2 * cw, c), y.dtype)
        tr = self._tr
        act = _act(self.activation)
        out = params["out"]
        from .primitives import _v_norm

        w_out = (out["v"] * (out["g"] / _v_norm(out["v"])))[0, 0]  # (hid+hch, oc)
        b_out = out["b"]
        use_h = h is not None and self.h_channels

        def body(i, buf):
            row = (height - 1 - i) if reverse else i
            # rows visible to this output row in the buffer
            start = row + 1 if reverse else row
            window = jax.lax.dynamic_slice(
                buf, (0, start, 0, 0), (b, kh, width + 2 * cw, c)
            )
            hid = plain_conv_apply(params["w_shift"], window,
                                   padding="VALID")[:, 0]  # (b, W, hid)
            if use_h:
                h_row = jax.lax.dynamic_slice(
                    h, (0, row, 0, 0), (b, 1, h.shape[2], h.shape[3])
                )[:, 0]
                hid = jnp.concatenate([hid, h_row], axis=-1)
            raw = jax.lax.dot_general(
                act(hid), w_out, dimension_numbers=(((2,), (0,)), ((), ()))
            ) + b_out
            x_row = tr.bwd(y[:, row], tr.calc(raw))
            write_at = row if reverse else row + kh
            return jax.lax.dynamic_update_slice(
                buf, x_row[:, None], (0, write_at, cw, 0))

        buf = jax.lax.fori_loop(0, height, body, buf)
        if reverse:
            return buf[:, :height, cw : cw + width]
        return buf[:, kh:, cw : cw + width]


# ---------------------------------------------------------------------------
# NICE coupling over channel splits
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class NICE2d(Flow):
    in_channels: int
    hidden_channels: Optional[int] = None
    h_channels: int = 0
    split_type: str = "continuous"  # or "skip"
    order: str = "up"  # or "down"
    factor: int = 2
    transform: str = "affine"
    alpha: float = 1.0
    activation: str = "elu"

    def __post_init__(self):
        st = self.split_type
        if st == "skip" and self.in_channels % self.factor == 1:
            object.__setattr__(self, "split_type", "continuous")

    @property
    def _out_channels(self):
        return self.in_channels // self.factor

    @property
    def _in1(self):
        return self.in_channels - self._out_channels

    @property
    def z1_channels(self):
        return self._in1 if self.order == "up" else self._out_channels

    @property
    def _hidden(self):
        return self.hidden_channels or min(8 * self.in_channels, 512)

    @property
    def _tr(self):
        return get_transform(self.transform, self.alpha)

    def init(self, rng, x_shape=None):
        k1, k2, k3 = jax.random.split(rng, 3)
        hid = self._hidden
        out_c = self._out_channels * self._tr.n_params
        return {
            "w1": _conv_init(k1, 3, 3, self._in1, hid),
            "w2": _conv_init(k2, 1, 1, hid, hid),
            "out": wn_conv_init(
                k3, 3, 3, hid + self.h_channels, out_c, zero_init=True
            ),
        }

    def _split(self, z):
        if self.split_type == "continuous":
            return z[..., : self.z1_channels], z[..., self.z1_channels :]
        return z[..., 0::2], z[..., 1::2]

    def _unsplit(self, z1, z2):
        if self.split_type == "continuous":
            return jnp.concatenate([z1, z2], axis=-1)
        return jnp.stack([z1, z2], axis=-1).reshape(*z1.shape[:-1], -1)

    def _net_hidden(self, params, z, h):
        act = _act(self.activation)
        # Emitter choices settled by the r4 TPU A/B at shipped scale
        # (tools/profile_inverse.py, inverse_emitters stage): w1 as a plain
        # conv BEATS the im2col dot by ~6.5 ms/step (XLA's conv emitter
        # handles the skinny-K 30->2048 contraction better than the padded
        # gather), while the 1x1 w2 as an explicit dot beats the conv
        # emitter by ~4 ms/step.  Identical math either way; env switches
        # restore the losers for re-measurement on other hardware.
        if os.environ.get("IPOKE_NICE_W1") == "im2col":
            c = conv_im2col(params["w1"], z)
        else:
            c = plain_conv_apply(params["w1"], z, padding="SAME")
        c = act(c)
        if os.environ.get("IPOKE_NICE_W2") == "conv":
            c = plain_conv_apply(params["w2"], c, padding="SAME")
        else:
            c = conv1x1_dot(params["w2"], c)
        if self.h_channels:
            c = jnp.concatenate([c, h], axis=-1)
        return act(c)

    def _raw(self, params, z, h):
        # the out conv is SKINNY (N = out_channels*n_params, e.g. 4 at the
        # shipped factor-16 scale, vs Cin ~ 2048): tap-packed form keeps the
        # MXU lanes filled (identical math — see wn_conv_apply_packed)
        return wn_conv_apply_packed(
            params["out"], self._net_hidden(params, z, h))

    def _zp_z(self, z1, z2):
        return (z1, z2) if self.order == "up" else (z2, z1)

    def forward(self, params, x, h=None):
        z1, z2 = self._split(x)
        z, zp = self._zp_z(z1, z2)
        p = self._tr.calc(self._raw_train(params, z, h))
        zp, ld = self._tr.fwd(zp, p)
        z1, z2 = (z, zp) if self.order == "up" else (zp, z)
        return self._unsplit(z1, z2), ld

    def _raw_train(self, params, z, h):
        """``_raw`` with the DIFFERENTIABLE fused Pallas path
        (``ops/nice_net.nice_net_raw_train``: fused 3-dot forward +
        hand-written backward over kernel-emitted residuals).  Off by
        default pending a shipped-scale TPU A/B
        (``IPOKE_TPU_FUSED_NICE_TRAIN=1`` / ``set_fused_nice_train``);
        bf16-only, so it targets the master-weights mixed-precision
        recipe (``training.mixed_prec_master``)."""
        from ..ops import fused_nice_train_enabled

        hh = h if self.h_channels else None
        # gate on PARAM dtype too, not just the activation: with fp32 params
        # + bf16 activations (fused_nice_train without mixed_prec_master) the
        # fused epilogue's `acc.astype(bf16) + b_out(f32)` promotes to f32
        # while the portable branch stays bf16 — the two platform_dependent
        # branches would disagree on output aval at trace time (advisor r4)
        if (fused_nice_train_enabled() and self.activation == "elu"
                and z.dtype == jnp.bfloat16
                and params["out"]["b"].dtype == jnp.bfloat16
                and (self.h_channels == 0 or h is not None)):
            from ..ops.nice_net import nice_net_fits, nice_net_raw_train

            if nice_net_fits(params, z, hh, train=True):
                return jax.lax.platform_dependent(
                    tpu=lambda: nice_net_raw_train(False, params, z, hh),
                    default=lambda: self._raw(params, z, h))
        return self._raw(params, z, h)

    def inverse(self, params, y, h=None):
        z1, z2 = self._split(y)
        z, zp = self._zp_z(z1, z2)
        p = self._tr.calc(self._raw_inference(params, z, h))
        zp = self._tr.bwd(zp, p)
        z1, z2 = (z, zp) if self.order == "up" else (zp, z)
        return self._unsplit(z1, z2)

    def _raw_inference(self, params, z, h):
        """``_raw`` with the inference-only fused Pallas path: the 3-dot NICE
        net runs in one kernel so the (M, hidden) activations stay in VMEM
        (``ops/nice_net.py``).  Sampling only — Pallas has no autodiff;
        training's ``forward`` keeps the portable emitters."""
        from ..ops import fused_nice_enabled

        hh = h if self.h_channels else None
        if (fused_nice_enabled() and self.activation == "elu"
                and z.dtype == jnp.bfloat16
                and (self.h_channels == 0 or h is not None)):
            from ..ops.nice_net import nice_net_fits, nice_net_raw_pallas

            if nice_net_fits(params, z, hh):  # static shape-family gate
                return jax.lax.platform_dependent(
                    tpu=lambda: nice_net_raw_pallas(params, z, hh),
                    default=lambda: self._raw(params, z, h))
        return self._raw(params, z, h)

    def ddi(self, params, x, h=None):
        z1, z2 = self._split(x)
        z, _ = self._zp_z(z1, z2)
        hidden = self._net_hidden(params, z, h)
        new = dict(params)
        new["out"] = wn_conv_ddi(params["out"], hidden, init_scale=0.0)
        y, ld = self.forward(new, x, h)
        return y, ld, new


# ---------------------------------------------------------------------------
# Units / steps / multi-scale
# ---------------------------------------------------------------------------

def _permutation(use_1x1: bool, channels: int) -> Flow:
    return InvConvLU(channels) if use_1x1 else Shuffle(channels)


@dataclasses.dataclass(frozen=True)
class MaCowUnitChain(Chain):
    """A MaCowUnit chain whose inverse can run as ONE fused Pallas kernel.

    Params/forward/ddi are plain ``Chain`` semantics (identical tree, so
    checkpoints are unaffected); ``inverse`` dispatches the whole unit —
    4 masked-conv row/column recurrences + 2 ActNorms — to
    ``ops.masked_conv.macow_unit_inverse_pallas`` when the fused path is
    enabled and applicable (affine transform, ELU, square latents).  At the
    shipped 8x8 latents the XLA per-row scan is latency-bound on thousands
    of tiny sequential HLOs; the fused kernel keeps the recurrences in VMEM
    back-to-back (see PERFORMANCE.md)."""

    def inverse(self, params, y, h=None):
        from ..ops import fused_unit_enabled

        mcf = self.flows[0]
        if (fused_unit_enabled() and isinstance(mcf, MaskedConvFlow)
                and mcf.transform == "affine" and mcf.activation == "elu"
                and y.shape[1] == y.shape[2]
                # a unit built with h-conditioning rows MUST receive h: the
                # fused kernel would silently drop the conditioning half of
                # the 1x1 out conv, where the portable path fails loudly
                and (mcf.h_channels == 0 or h is not None)):
            # lowering-time dispatch: the fused kernel is TPU-only; a program
            # lowered for CPU (e.g. jax.default_device(cpu) while the remote
            # TPU backend is registered) takes the portable chain instead
            def fused():
                from ..ops.masked_conv import macow_unit_inverse_pallas

                x = macow_unit_inverse_pallas(
                    y, h if mcf.h_channels else None,
                    [params[0], params[1], params[3], params[4]],
                    [params[2], params[5]], mcf.kernel_size, mcf.alpha,
                )
                return x.astype(y.dtype)

            return jax.lax.platform_dependent(
                tpu=fused,
                default=lambda: Chain.inverse(self, params, y, h),
            )
        return super().inverse(params, y, h)


def make_macow_unit(
    in_channels, kernel_size, h_channels=0, transform="affine", alpha=1.0,
    activation="elu",
) -> Chain:
    """MCF(A) -> MCF(B) -> ActNorm -> MCF(C) -> MCF(D) -> ActNorm
    (reference ``MaCowUnit``, macow2.py:925-995)."""
    kh, kw = kernel_size
    mk = lambda order, ks: MaskedConvFlow(
        in_channels, ks, order=order, h_channels=h_channels,
        transform=transform, alpha=alpha, activation=activation,
    )
    return MaCowUnitChain((
        mk("A", (kh, kw)),
        mk("B", (kh, kw)),
        ActNorm(in_channels),
        mk("C", (kw, kh)),
        mk("D", (kw, kh)),
        ActNorm(in_channels),
    ))


def make_macow_step(
    in_channels, kernel_size, hidden_channels, h_channels=0,
    transform="affine", alpha=1.0, activation="elu", condition_nice=False,
) -> Chain:
    """ActNorm -> Shuffle -> 2x unit -> NICE(up) -> NICE(dn) -> ActNorm ->
    2x unit -> NICE(skip,up) -> NICE(skip,dn) (reference MaCowStep)."""
    nice_h = h_channels if condition_nice else 0
    unit = lambda: make_macow_unit(
        in_channels, kernel_size, h_channels, transform, alpha, activation
    )
    nice = lambda split, order: NICE2d(
        in_channels, hidden_channels=hidden_channels, h_channels=nice_h,
        split_type=split, order=order, transform=transform, alpha=alpha,
        activation=activation,
    )
    return Chain((
        ActNorm(in_channels),
        Shuffle(in_channels),
        unit(), unit(),
        nice("continuous", "up"), nice("continuous", "down"),
        ActNorm(in_channels),
        unit(), unit(),
        nice("skip", "up"), nice("skip", "down"),
    ))


@dataclasses.dataclass(frozen=True)
class MultiScalePrior(Flow):
    """perm -> NICE(continuous, up) -> ActNorm on the factored-out half
    (reference macow2.py:543-593)."""

    in_channels: int
    hidden_channels: int
    h_channels: int = 0
    factor: int = 2
    transform: str = "affine"
    alpha: float = 1.0
    activation: str = "elu"
    use_1x1: bool = False
    condition_nice: bool = False

    @property
    def _perm(self):
        return _permutation(self.use_1x1, self.in_channels)

    @property
    def _coupling(self):
        return NICE2d(
            self.in_channels, hidden_channels=self.hidden_channels,
            h_channels=self.h_channels if self.condition_nice else 0,
            split_type="continuous", order="up", factor=self.factor,
            transform=self.transform, alpha=self.alpha,
            activation=self.activation,
        )

    @property
    def z1_channels(self):
        return self._coupling.z1_channels

    @property
    def _actnorm(self):
        # acts on the factored-out part: in_channels // factor channels
        return ActNorm(self.in_channels // self.factor)

    def init(self, rng, x_shape=None):
        k1, k2, k3 = jax.random.split(rng, 3)
        return {
            "perm": self._perm.init(k1),
            "coupling": self._coupling.init(k2),
            "actnorm": self._actnorm.init(k3),
        }

    def forward(self, params, x, h=None):
        out, ld = self._perm.forward(params["perm"], x)
        out, l2 = self._coupling.forward(params["coupling"], out, h)
        z1, z2 = out[..., : self.z1_channels], out[..., self.z1_channels :]
        z2, l3 = self._actnorm.forward(params["actnorm"], z2)
        return jnp.concatenate([z1, z2], axis=-1), ld + l2 + l3

    def inverse(self, params, y, h=None):
        z1, z2 = y[..., : self.z1_channels], y[..., self.z1_channels :]
        z2 = self._actnorm.inverse(params["actnorm"], z2)
        out = jnp.concatenate([z1, z2], axis=-1)
        out = self._coupling.inverse(params["coupling"], out, h)
        return self._perm.inverse(params["perm"], out)

    def ddi(self, params, x, h=None):
        out, ld = self._perm.forward(params["perm"], x)
        out, l2, new_coupling = self._coupling.ddi(params["coupling"], out, h)
        z1, z2 = out[..., : self.z1_channels], out[..., self.z1_channels :]
        z2, l3, new_an = self._actnorm.ddi(params["actnorm"], z2)
        new = {"perm": params["perm"], "coupling": new_coupling, "actnorm": new_an}
        return jnp.concatenate([z1, z2], axis=-1), ld + l2 + l3, new


@dataclasses.dataclass(frozen=True)
class ScannedSteps(Flow):
    """N structurally-identical steps executed as one ``lax.scan`` over
    stacked params — the TPU-native replacement for the reference's
    ``nn.ModuleList`` of 1-15 MaCowSteps per level.

    ``remat`` wraps the scanned step in ``jax.checkpoint`` so training stores
    only per-step boundaries instead of every coupling activation — at the
    shipped scale (~1B params, 2048-wide hidden convs) this is what keeps the
    backward pass inside HBM (SURVEY.md §7 / scaling-book remat recipe).
    """

    step: Flow
    n: int
    remat: bool = True

    def init(self, rng, x_shape=None):
        keys = jax.random.split(rng, self.n)
        per = [self.step.init(k, x_shape) for k in keys]
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per)

    def forward(self, params, x, h=None):
        fwd = self.step.forward
        if self.remat:
            fwd = jax.checkpoint(fwd)

        def body(carry, p):
            x, ld = carry
            y, l = fwd(p, x, h)
            return (y, ld + l), None

        (y, ld), _ = jax.lax.scan(
            body, (x, jnp.zeros(x.shape[0], jnp.float32)), params
        )
        return y, ld

    def inverse(self, params, y, h=None):
        def body(x, p):
            return self.step.inverse(p, x, h), None

        x, _ = jax.lax.scan(body, y, params, reverse=True)
        return x

    def ddi(self, params, x, h=None):
        def body(carry, p):
            x, ld = carry
            y, l, p2 = self.step.ddi(p, x, h)
            return (y, ld + l), p2

        (y, ld), new_params = jax.lax.scan(
            body, (x, jnp.zeros(x.shape[0], jnp.float32)), params
        )
        return y, ld, new_params


@dataclasses.dataclass(frozen=True)
class MultiScaleInternal(Flow):
    """Multi-scale MaCow stack with channel factoring per level
    (reference ``MultiScaleInternal``, macow2.py:821-920).

    Per level i: ``num_steps[i]`` MaCowSteps (scanned), a MultiScalePrior,
    a permutation, then the last ``channel_step`` channels are factored out.
    Forward output concatenates [final, split_{L-1}, ..., split_0] on the
    channel axis exactly like the reference's reversed ``unsplit2d``.
    """

    num_steps: Tuple[int, ...]
    in_channels: int
    hidden_channels: int
    h_channels: int = 0
    factor: int = 16
    transform: str = "affine"
    prior_transform: str = "affine"
    alpha: float = 1.0
    kernel_size: Tuple[int, int] = (2, 3)
    activation: str = "elu"
    use_1x1: bool = False
    condition_nice: bool = False

    def __post_init__(self):
        assert len(self.num_steps) < self.factor, "need num_layers < factor"

    def _levels(self):
        """Static per-level structure: (steps, prior, perm, z1_channels)."""
        levels = []
        c = self.in_channels
        channel_step = self.in_channels // self.factor
        factor = self.factor
        for n in self.num_steps:
            step = make_macow_step(
                c, self.kernel_size, self.hidden_channels, self.h_channels,
                self.transform, self.alpha, self.activation,
                self.condition_nice,
            )
            prior = MultiScalePrior(
                c, self.hidden_channels, self.h_channels, factor,
                self.prior_transform, self.alpha, self.activation,
                self.use_1x1, self.condition_nice,
            )
            perm = _permutation(self.use_1x1, c)
            levels.append((ScannedSteps(step, n), prior, perm, prior.z1_channels))
            c = c - channel_step
            assert c == prior.z1_channels
            factor -= 1
        return levels, c

    @property
    def z_channels(self):
        return self._levels()[1]

    def init(self, rng, x_shape=None):
        levels, _ = self._levels()
        out = []
        for steps, prior, perm, _ in levels:
            rng, k1, k2, k3 = jax.random.split(rng, 4)
            out.append({
                "steps": steps.init(k1, x_shape),
                "prior": prior.init(k2, x_shape),
                "perm": perm.init(k3, x_shape),
            })
        return out

    def forward(self, params, x, h=None):
        levels, _ = self._levels()
        ld = jnp.zeros(x.shape[0], jnp.float32)
        out = x
        splits = []
        for (steps, prior, perm, z1c), p in zip(levels, params):
            out, l = steps.forward(p["steps"], out, h)
            ld = ld + l
            out, l = prior.forward(p["prior"], out, h)
            ld = ld + l
            out, l = perm.forward(p["perm"], out)
            ld = ld + l
            splits.append(out[..., z1c:])
            out = out[..., :z1c]
        splits.append(out)
        return jnp.concatenate(splits[::-1], axis=-1), ld

    def inverse(self, params, y, h=None):
        levels, _ = self._levels()
        # peel the per-level splits off the packed z
        out = y
        splits = []
        for _, prior, _, z1c in levels:
            splits.append(out[..., z1c:])
            out = out[..., :z1c]
        for (steps, prior, perm, _), p, z2 in zip(
            reversed(levels), reversed(params), reversed(splits)
        ):
            out = jnp.concatenate([out, z2], axis=-1)
            out = perm.inverse(p["perm"], out)
            out = prior.inverse(p["prior"], out, h)
            out = steps.inverse(p["steps"], out, h)
        return out

    def ddi(self, params, x, h=None):
        levels, _ = self._levels()
        ld = jnp.zeros(x.shape[0], jnp.float32)
        out = x
        splits = []
        new_params = []
        for (steps, prior, perm, z1c), p in zip(levels, params):
            out, l1, new_steps = steps.ddi(p["steps"], out, h)
            out, l2, new_prior = prior.ddi(p["prior"], out, h)
            out, l3 = perm.forward(p["perm"], out)
            ld = ld + l1 + l2 + l3
            new_params.append(
                {"steps": new_steps, "prior": new_prior, "perm": p["perm"]}
            )
            splits.append(out[..., z1c:])
            out = out[..., :z1c]
        splits.append(out)
        return jnp.concatenate(splits[::-1], axis=-1), ld, new_params


@dataclasses.dataclass(frozen=True)
class MultiscaleStack(Flow):
    """Stack of MultiScaleInternal blocks with an optional invertible
    space<->depth reshape at the midpoint and per-block conditioning
    transforms (reference ``MultiscaleStack``, macow2.py:652-729; selected by
    ``architecture.multistack``).

    levels: per-block num_steps lists; factors: per-block factor.  With
    reshape='down', blocks after the midpoint see (H/2, W/2, 4C); the
    conditioning is strided-conv downsampled to match (the reference uses a
    learned Conv2dBlock — here a strided conv in the params tree).
    """

    levels: Tuple[Tuple[int, ...], ...]
    factors: Tuple[int, ...]
    in_channels: int
    mid_channels_factor: int = 8
    h_channels: int = 0
    reshape: str = "none"  # none | down | up
    transform: str = "affine"
    prior_transform: str = "affine"
    kernel_size: Tuple[int, int] = (2, 3)
    activation: str = "elu"
    use_1x1: bool = False
    condition_nice: bool = False

    def __post_init__(self):
        assert len(self.levels) == len(self.factors)
        assert self.reshape in ("none", "down", "up")

    @property
    def _reshape_step(self):
        return len(self.levels) // 2 if self.reshape != "none" else None

    def _blocks(self):
        blocks = []
        c = self.in_channels
        for i, (steps, f) in enumerate(zip(self.levels, self.factors)):
            if self._reshape_step is not None and i == self._reshape_step:
                c = c * 4 if self.reshape == "down" else c // 4
            blocks.append(MultiScaleInternal(
                num_steps=tuple(steps), in_channels=c,
                hidden_channels=self.mid_channels_factor * c,
                h_channels=self.h_channels, factor=f,
                transform=self.transform,
                prior_transform=self.prior_transform,
                kernel_size=self.kernel_size, activation=self.activation,
                use_1x1=self.use_1x1, condition_nice=self.condition_nice,
            ))
        return blocks

    @property
    def _reshaper(self):
        return SpaceToDepth(inverse_direction=(self.reshape == "up"))

    def init(self, rng, x_shape=None):
        params = {"blocks": []}
        for b in self._blocks():
            rng, k = jax.random.split(rng)
            params["blocks"].append(b.init(k, x_shape))
        if self.h_channels and self._reshape_step is not None:
            # per-post-reshape-block cond resampling convs
            n = len(self.levels) - self._reshape_step
            params["h_transforms"] = []
            for _ in range(n):
                rng, k = jax.random.split(rng)
                params["h_transforms"].append(
                    _conv_init(k, 3, 3, self.h_channels, self.h_channels))
        return params

    def _cond_for(self, params, i, h):
        if h is None or self._reshape_step is None or i < self._reshape_step:
            return h
        w = params["h_transforms"][i - self._reshape_step]
        stride = (2, 2) if self.reshape == "down" else (1, 1)
        hc = jax.lax.conv_general_dilated(
            h, w, stride, "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.reshape == "up":
            hc = jax.image.resize(
                hc, (hc.shape[0], hc.shape[1] * 2, hc.shape[2] * 2,
                     hc.shape[3]), "nearest")
        return hc

    def forward(self, params, x, h=None):
        ld = jnp.zeros(x.shape[0], jnp.float32)
        out = x
        for i, (b, p) in enumerate(zip(self._blocks(), params["blocks"])):
            if self._reshape_step is not None and i == self._reshape_step:
                out, _ = self._reshaper.forward({}, out)
            out, l = b.forward(p, out, self._cond_for(params, i, h))
            ld = ld + l
        return out, ld

    def inverse(self, params, y, h=None):
        blocks = self._blocks()
        out = y
        for i in reversed(range(len(blocks))):
            out = blocks[i].inverse(params["blocks"][i], out,
                                    self._cond_for(params, i, h))
            if self._reshape_step is not None and i == self._reshape_step:
                out = self._reshaper.inverse({}, out)
        return out

    def ddi(self, params, x, h=None):
        """Data-dependent init through every block (the base-class default
        would silently skip the per-block ActNorm/wn-conv init)."""
        ld = jnp.zeros(x.shape[0], jnp.float32)
        out = x
        new_blocks = []
        for i, (b, p) in enumerate(zip(self._blocks(), params["blocks"])):
            if self._reshape_step is not None and i == self._reshape_step:
                out, _ = self._reshaper.forward({}, out)
            out, l, p2 = b.ddi(p, out, self._cond_for(params, i, h))
            new_blocks.append(p2)
            ld = ld + l
        new = dict(params)
        new["blocks"] = new_blocks
        return out, ld, new

    def output_shape(self, x_shape):
        """With reshape 'down' the forward output lives at (H/2, W/2, 4C)
        (reference make_flow_input samples the reshaped shape,
        second_stage_video.py:300-307); 'up' the opposite."""
        h, w, c = x_shape
        if self.reshape == "down":
            return (h // 2, w // 2, c * 4)
        if self.reshape == "up":
            return (h * 2, w * 2, c // 4)
        return tuple(x_shape)
