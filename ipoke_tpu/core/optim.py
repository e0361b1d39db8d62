"""Optimizer factories.

The reference uses torch ``Adam(lr, betas=(0.5, 0.9), weight_decay)`` for the
GAN stages (``first_stage_motion_model.py:538-543``) and Adam/AdaBelief with
amsgrad for the cINN (``second_stage_video.py:643-673``), plus linear warmup /
linear decay schedules (``:249-264``).  Here everything is optax; flow params
contain non-trainable ``buf_*`` leaves that must be masked out.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..flows.base import trainable_mask


def gan_adam(lr, weight_decay: float = 1e-5, b1: float = 0.5, b2: float = 0.9):
    """Adam with torch-style additive L2 (not decoupled), matching the
    reference's GAN optimizers."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=b1, b2=b2),
        optax.scale_by_learning_rate(lr),
    )


class ScaleByTorchAmsgradState(NamedTuple):
    count: Any
    mu: Any
    nu: Any
    nu_max: Any


def scale_by_torch_amsgrad(b1: float = 0.9, b2: float = 0.999,
                           eps: float = 1e-8):
    """torch ``Adam(amsgrad=True)``'s exact update (reference cINN optimizer,
    ``second_stage_video.py:662-663``): the running max is taken over the
    RAW second moment and bias-corrected with the CURRENT step's factor —
    ``step = mhat / (sqrt(max(nu))/sqrt(bc2) + eps)``.  (optax's
    ``scale_by_amsgrad`` instead maxes the bias-CORRECTED ``nu_hat``, which
    locks in the early steps' inflated estimates — measurably different
    trajectories; see tests/test_train_trajectory_parity.py.)"""

    def init_fn(params):
        z = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        return ScaleByTorchAmsgradState(
            count=jnp.zeros([], jnp.int32), mu=z(), nu=z(), nu_max=z())

    def update_fn(updates, state, params=None):
        del params
        t = state.count + 1
        mu = jax.tree_util.tree_map(
            lambda g, m: b1 * m + (1 - b1) * g, updates, state.mu)
        nu = jax.tree_util.tree_map(
            lambda g, v: b2 * v + (1 - b2) * g * g, updates, state.nu)
        nu_max = jax.tree_util.tree_map(jnp.maximum, state.nu_max, nu)
        bc1 = 1 - b1 ** t.astype(jnp.float32)
        bc2 = 1 - b2 ** t.astype(jnp.float32)
        upd = jax.tree_util.tree_map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v) / jnp.sqrt(bc2) + eps),
            mu, nu_max)
        return upd, ScaleByTorchAmsgradState(count=t, mu=mu, nu=nu,
                                             nu_max=nu_max)

    return optax.GradientTransformation(init_fn, update_fn)


def flow_adam(lr_schedule, weight_decay: float = 1e-5, params=None,
              clip_grad_norm: float = 0.0, use_adabelief: bool = False,
              use_adafactor: bool = False, use_amsgrad: bool = True):
    """Adam / AdaBelief (reference ``training.use_adabelief``) / Adafactor
    for flow params; masks out ``buf_*`` buffer leaves entirely.

    The default Adam branch is torch-exact AMSGrad — the reference builds
    the cINN optimizer as ``Adam(..., amsgrad=True)``
    (``second_stage_video.py:662-663``); ``use_amsgrad=False`` restores
    plain Adam.  ``use_adafactor`` swaps in factored second moments — at the
    shipped 1054M-param cINN scale, Adam's fp32 m/v states (8.4 GB) plus
    grads do not fit one v5e's 16 GB HBM; Adafactor's ~O(sqrt) state does."""
    chain = []
    if clip_grad_norm and clip_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(clip_grad_norm))
    chain.append(optax.add_decayed_weights(weight_decay))
    if use_adafactor:
        chain.append(optax.scale_by_factored_rms())
    elif use_adabelief:
        chain.append(optax.scale_by_belief())
    elif use_amsgrad:
        chain.append(scale_by_torch_amsgrad(b1=0.9, b2=0.999))
    else:
        chain.append(optax.scale_by_adam(b1=0.9, b2=0.999))
    chain.append(optax.scale_by_learning_rate(lr_schedule))
    tx = optax.chain(*chain)
    if params is None:
        return tx
    mask = trainable_mask(params)
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()},
        jax.tree_util.tree_map(lambda m: "train" if m else "freeze", mask),
    )


class MasterWeightsState(NamedTuple):
    master: Any  # fp32 authoritative copy of every float param leaf
    inner: Any   # inner transform state, built over the master copy


def cast_floats(tree, dtype):
    """Cast every float leaf to ``dtype`` (int/bool buffer leaves pass
    through untouched)."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x, tree)


def master_weights(tx) -> optax.GradientTransformation:
    """Standard TPU mixed-precision recipe (round-3 verdict task 3): params
    stay RESIDENT in bf16 (compute reads half the HBM bytes per step — no
    per-step full-param cast, which round 2 measured as a net loss), while
    the inner transform (Adafactor/Adam) sees an fp32 master copy so tiny
    updates are never rounded away by bf16's 8-bit mantissa.

    ``update`` returns the delta that moves the bf16 params to the new
    master's bf16 image: grads are upcast to fp32, the inner update is
    applied to the master, and the emitted update is
    ``cast(master_new) - params`` (so ``optax.apply_updates`` keeps params
    == bf16(master) to 1 ulp; the master is authoritative, deviations do
    not accumulate)."""

    def init(params):
        master = cast_floats(params, jnp.float32)
        return MasterWeightsState(master=master, inner=tx.init(master))

    def update(grads, state, params=None):
        assert params is not None, "master_weights needs params"
        g32 = cast_floats(grads, jnp.float32)
        upd32, inner = tx.update(g32, state.inner, state.master)
        master = optax.apply_updates(state.master, upd32)

        def delta(m, p):
            if hasattr(p, "dtype") and jnp.issubdtype(p.dtype, jnp.floating):
                return (m.astype(p.dtype).astype(jnp.float32)
                        - p.astype(jnp.float32)).astype(p.dtype)
            return jax.tree_util.tree_map(jnp.zeros_like, p)

        return (jax.tree_util.tree_map(delta, master, params),
                MasterWeightsState(master=master, inner=inner))

    return optax.GradientTransformation(init, update)


def gated_update(tx, gate, grads, opt_state, params):
    """``tx.update`` + apply, but params AND optimizer moments stay untouched
    when the traced ``gate`` is 0.

    Multiplying the *loss* by a 0/1 gate is not enough: ``gan_adam`` chains
    ``add_decayed_weights`` before ``scale_by_adam``, so decay-only gradients
    become ~lr-magnitude sign-like steps that shrink the gated net toward zero
    (the reference skips the optimizer step entirely during ``pretrain`` /
    disc-has-won phases)."""
    upd, new_opt = tx.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, upd)
    sel = lambda n, o: jnp.where(gate > 0, n, o)
    return (
        jax.tree_util.tree_map(sel, new_params, params),
        jax.tree_util.tree_map(sel, new_opt, opt_state),
    )


def with_grad_accumulation(tx, config, batch_size: int):
    """Wrap ``tx`` in ``optax.MultiSteps`` so k microbatches accumulate into
    one update, with ``k = ceil(min_acc_batch_size / batch_size)`` (reference
    ``experiments/experiment.py:81-82``). Returns ``(tx, k)``."""
    import math

    min_acc = int(config.get("training", {}).get("min_acc_batch_size", 0) or 0)
    bs = max(1, int(batch_size))
    if min_acc <= bs:
        return tx, 1
    k = math.ceil(min_acc / bs)
    return optax.MultiSteps(tx, every_k_schedule=k), k


def zero_buffer_grads(grads, params):
    """Replace grads of ``buf_*`` leaves with zeros (they may come back as
    float0 from jax.grad on int leaves)."""
    mask = trainable_mask(params)
    return jax.tree_util.tree_map(
        lambda g, p, m: g if m else jnp.zeros_like(p), grads, params, mask
    )


def warmup_linear_decay(lr: float, warmup_steps: int, total_steps: int):
    """Linear 0->lr over ``warmup_steps`` then linear decay to 0 at
    ``total_steps`` (reference second_stage_video.py:249-264, 328-334)."""
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, lr, warmup_steps),
            optax.linear_schedule(lr, 0.0, max(1, total_steps - warmup_steps)),
        ],
        [warmup_steps],
    )


def exp_decay_per_epoch(lr: float, gamma: float, steps_per_epoch: int):
    """torch ExponentialLR stepped once per epoch."""
    return optax.exponential_decay(
        lr, transition_steps=max(1, steps_per_epoch), decay_rate=gamma,
        staircase=True,
    )
