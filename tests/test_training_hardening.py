"""Training-loop hardening: gated optimizer updates (disc pretrain), DDI
resume safety, gradient accumulation, and the NaN guard.

Covers reference behaviors: skipped disc optimizer steps during pretrain
(first_stage_motion_model.py:156-224 runs disc opts only when enabled),
``accumulate_grad_batches`` (experiments/experiment.py:81-82), and
``terminate_on_nan`` (experiments/first_stage_video.py:45).
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ipoke_tpu.core.config import Config
from ipoke_tpu.core.optim import (
    gan_adam,
    gated_update,
    with_grad_accumulation,
)


def test_gated_update_zero_gate_is_noop():
    """gate=0 must leave params AND moments untouched — loss*0 alone still
    produces decay-driven sign-steps through add_decayed_weights+adam."""
    tx = gan_adam(1e-3, weight_decay=1e-2)
    params = {"w": jnp.ones((4, 4)), "b": jnp.full((4,), 2.0)}
    opt = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.zeros_like, params)  # gated loss -> 0

    new_params, new_opt = gated_update(tx, 0.0, grads, opt, params)
    assert jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: jnp.array_equal(a, b), new_params, params))
    assert jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: jnp.array_equal(a, b), new_opt, opt))

    # ungated (decay-only) update WOULD have moved the params — the bug the
    # gate exists to prevent
    import optax

    upd, _ = tx.update(grads, opt, params)
    moved = optax.apply_updates(params, upd)
    assert not bool(jnp.array_equal(moved["w"], params["w"]))


def test_gated_update_open_gate_matches_plain_update():
    import optax

    tx = gan_adam(1e-3, weight_decay=1e-2)
    params = {"w": jnp.ones((3,))}
    opt = tx.init(params)
    grads = {"w": jnp.full((3,), 0.5)}
    new_params, new_opt = gated_update(tx, 1.0, grads, opt, params)
    upd, ref_opt = tx.update(grads, opt, params)
    ref_params = optax.apply_updates(params, upd)
    np.testing.assert_allclose(new_params["w"], ref_params["w"])
    leaves_a = jax.tree_util.tree_leaves(new_opt)
    leaves_b = jax.tree_util.tree_leaves(ref_opt)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(a, b)


def test_grad_accumulation_matches_full_batch():
    """k accumulated microbatches == one update with the mean gradient."""
    import optax

    cfg = Config({"training": {"min_acc_batch_size": 8}, "data": {}})
    base = optax.sgd(0.1)
    tx, k = with_grad_accumulation(base, cfg, batch_size=2)
    assert k == 4

    params = {"w": jnp.zeros((3,))}
    opt = tx.init(params)
    rng = np.random.default_rng(0)
    micro_grads = [
        {"w": jnp.asarray(rng.normal(size=3), jnp.float32)} for _ in range(k)
    ]
    p = params
    for g in micro_grads:
        upd, opt = tx.update(g, opt, p)
        p = optax.apply_updates(p, upd)
    # microbatches 1..k-1 must be no-ops
    mean_g = jnp.mean(jnp.stack([g["w"] for g in micro_grads]), axis=0)
    upd_ref, _ = base.update({"w": mean_g}, base.init(params), params)
    ref = optax.apply_updates(params, upd_ref)
    np.testing.assert_allclose(np.asarray(p["w"]), np.asarray(ref["w"]),
                               rtol=1e-6)


def test_grad_accumulation_disabled_when_batch_big_enough():
    cfg = Config({"training": {"min_acc_batch_size": 4}, "data": {}})
    import optax

    tx, k = with_grad_accumulation(optax.sgd(0.1), cfg, batch_size=8)
    assert k == 1


def test_nan_guard_raises():
    from ipoke_tpu.cli.experiments import Experiment

    exp = Experiment.__new__(Experiment)  # no __init__: guard is stateless
    exp.check_finite({"loss": jnp.float32(1.0)}, 0, 1)  # ok
    with pytest.raises(FloatingPointError, match="non-finite"):
        exp.check_finite({"loss": jnp.float32(np.nan)}, 0, 1)
    with pytest.raises(FloatingPointError):
        exp.check_finite({"loss": jnp.float32(np.inf)}, 0, 1)


class _DDIProbe:
    """Stub model whose ddi() records calls."""

    def __init__(self):
        self.calls = 0

    def ddi(self, params, frozen, batch, rng):
        self.calls += 1
        return params


def _fake_second_stage(step_value):
    """A SecondStageExperiment shell exercising only train_step's DDI gate."""
    from flax import struct

    from ipoke_tpu.cli.experiments import SecondStageExperiment
    from ipoke_tpu.models.second_stage import FlowTrainState

    exp = SecondStageExperiment.__new__(SecondStageExperiment)
    exp.model = _DDIProbe()
    exp.frozen = {}
    exp._ddi_done = False
    exp.rng = jax.random.PRNGKey(0)
    exp.state = FlowTrainState(
        params={"flow": jnp.zeros(3)}, opt=None,
        step=jnp.asarray(step_value, jnp.int32))
    exp._step = lambda state, frozen, batch, rng: (state, {"loss": 0.0})
    return exp


def test_ddi_skipped_on_resumed_state():
    """Resuming (restored step > 0) must NOT re-run DDI — it would zero the
    trained wn-conv g/b and overwrite good checkpoints (ADVICE r1, high)."""
    exp = _fake_second_stage(step_value=123)
    exp.train_step({"images": jnp.zeros((1,))}, epoch=0)
    assert exp.model.calls == 0
    assert exp._ddi_done


def test_ddi_runs_on_fresh_state():
    exp = _fake_second_stage(step_value=0)
    exp.train_step({"images": jnp.zeros((1,))}, epoch=0)
    assert exp.model.calls == 1
    exp.train_step({"images": jnp.zeros((1,))}, epoch=0)
    assert exp.model.calls == 1  # once only
