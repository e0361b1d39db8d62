"""Master-weights mixed precision (round-3 verdict task 3): bf16-resident
params with fp32 optimizer master copies (``core.optim.master_weights``), and
the fp32 reduction guards that keep the NLL objective honest under bf16."""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ipoke_tpu.core.config import Config
from ipoke_tpu.core.optim import cast_floats, master_weights

K = jax.random.PRNGKey


def test_master_weights_matches_inner_on_fp32():
    """With fp32 params the wrapper is exactly the inner transform."""
    tx_plain = optax.adam(1e-2)
    tx_mw = master_weights(optax.adam(1e-2))
    params = {"w": jnp.linspace(-1, 1, 8), "b": jnp.ones((3,))}
    s_plain, s_mw = tx_plain.init(params), tx_mw.init(params)
    p_plain = p_mw = params
    for i in range(5):
        grads = jax.tree_util.tree_map(
            lambda p: jnp.cos(p) * (i + 1), p_plain)
        u, s_plain = tx_plain.update(grads, s_plain, p_plain)
        p_plain = optax.apply_updates(p_plain, u)
        u, s_mw = tx_mw.update(grads, s_mw, p_mw)
        p_mw = optax.apply_updates(p_mw, u)
    for a, b in zip(jax.tree_util.tree_leaves(p_plain),
                    jax.tree_util.tree_leaves(p_mw)):
        np.testing.assert_allclose(a, b, rtol=1e-6)


def test_master_weights_accumulates_below_bf16_resolution():
    """The recipe's raison d'etre: updates smaller than one bf16 ulp of the
    param must still accumulate.  Pure bf16 SGD stalls (1.0 + 1e-4 rounds
    back to 1.0); the fp32 master keeps every step."""
    lr, n_steps = 1e-4, 100
    grads = {"w": jnp.ones((4,), jnp.bfloat16)}

    p_naive = {"w": jnp.ones((4,), jnp.bfloat16)}
    tx_naive = optax.sgd(lr)
    s = tx_naive.init(p_naive)
    for _ in range(n_steps):
        u, s = tx_naive.update(grads, s, p_naive)
        p_naive = optax.apply_updates(p_naive, u)
    assert float(p_naive["w"][0]) == 1.0  # stalled: the failure mode

    p_mw = {"w": jnp.ones((4,), jnp.bfloat16)}
    tx_mw = master_weights(optax.sgd(lr))
    s = tx_mw.init(p_mw)
    for _ in range(n_steps):
        u, s = tx_mw.update(grads, s, p_mw)
        p_mw = optax.apply_updates(p_mw, u)
    # master accumulated all 100 * 1e-4 = 0.01 exactly (fp32)
    np.testing.assert_allclose(np.asarray(s.master["w"]), 0.99, rtol=1e-5)
    # bf16 params track the master's bf16 image
    np.testing.assert_array_equal(
        np.asarray(p_mw["w"]),
        np.asarray(s.master["w"].astype(jnp.bfloat16)))
    assert p_mw["w"].dtype == jnp.bfloat16


def test_master_weights_passes_int_buffers_through():
    params = {"w": jnp.ones((2,), jnp.bfloat16),
              "buf_perm": jnp.arange(4, dtype=jnp.int32)}
    tx = master_weights(optax.sgd(1e-2))
    s = tx.init(params)
    assert s.master["buf_perm"].dtype == jnp.int32
    grads = {"w": jnp.ones((2,), jnp.bfloat16),
             "buf_perm": jnp.zeros((4,), jnp.int32)}
    u, s = tx.update(grads, s, params)
    new = optax.apply_updates(params, u)
    np.testing.assert_array_equal(np.asarray(new["buf_perm"]),
                                  np.arange(4))


def test_second_stage_mixed_master_nll_parity_and_progress():
    """bf16-resident training step: NLL within tolerance of the fp32 step on
    identical state, losses finite over several steps, params stay bf16,
    master stays fp32."""
    from ipoke_tpu.core.optim import flow_adam, warmup_linear_decay
    from ipoke_tpu.data.synthetic import make_batch
    from ipoke_tpu.models.second_stage import (
        SecondStageModel,
        create_second_stage_state,
        make_second_stage_train_step,
    )
    from tests.test_second_stage import SS_CFG, _make_frozen

    fs_model, cond, poke, frozen = _make_frozen()
    rng = np.random.default_rng(0)
    batch = {k: jnp.asarray(v) for k, v in make_batch(
        rng, batch_size=2, n_frames=3, spatial_size=32).items()}

    cfg_mixed = Config(copy.deepcopy(SS_CFG.to_dict() if hasattr(
        SS_CFG, "to_dict") else dict(SS_CFG)))
    cfg_mixed["training"]["mixed_prec_master"] = True

    # fp32 reference leg
    model32 = SecondStageModel(SS_CFG, fs_model, cond, poke)
    state32 = create_second_stage_state(K(10), model32, flow_adam(1e-3))
    params_ddi = model32.ddi(state32.params, frozen, batch, K(11))
    tx32 = flow_adam(warmup_linear_decay(1e-3, 5, 50), params=params_ddi)
    state32 = state32.replace(params=params_ddi, opt=tx32.init(params_ddi))
    step32 = jax.jit(make_second_stage_train_step(model32, tx32))
    _, log32 = step32(state32, frozen, batch, K(20))

    # bf16 master-weights leg from the SAME post-ddi params
    model16 = SecondStageModel(cfg_mixed, fs_model, cond, poke)
    params16 = cast_floats(params_ddi, jnp.bfloat16)
    frozen16 = cast_floats(frozen, jnp.bfloat16)
    tx16 = master_weights(
        flow_adam(warmup_linear_decay(1e-3, 5, 50), params=params16))
    state16 = create_second_stage_state(K(10), model16, flow_adam(1e-3))
    state16 = state16.replace(params=params16, opt=tx16.init(params16))
    step16 = jax.jit(make_second_stage_train_step(model16, tx16))

    losses = []
    for i in range(3):
        state16, log16 = step16(state16, frozen16, batch, K(20 + i))
        losses.append(float(log16["flow_loss"]))
    assert all(np.isfinite(l) for l in losses), losses

    # NLL parity on the first step (identical params, bf16 forward)
    l32, l16 = float(log32["flow_loss"]), losses[0]
    assert abs(l16 - l32) / max(1.0, abs(l32)) < 0.05, (l16, l32)

    # dtypes: params bf16-resident, master fp32, loss logged fp32
    float_leaves = [x for x in jax.tree_util.tree_leaves(state16.params)
                    if jnp.issubdtype(x.dtype, jnp.floating)]
    assert all(x.dtype == jnp.bfloat16 for x in float_leaves)
    masters = [x for x in jax.tree_util.tree_leaves(state16.opt.master)
               if jnp.issubdtype(x.dtype, jnp.floating)]
    assert masters and all(x.dtype == jnp.float32 for x in masters)


def test_experiment_wires_mixed_prec_master(tmp_path, monkeypatch):
    """SecondStageExperiment with training.mixed_prec_master: DDI runs in
    fp32, then params go bf16-resident (frozen nets too) and training
    proceeds with finite losses."""
    import os

    from ipoke_tpu.cli.experiments import SecondStageExperiment
    from ipoke_tpu.data.prep import make_synthetic_dataset
    from tests.test_second_stage import SS_CFG, _make_frozen

    root = str(tmp_path / "ds")
    make_synthetic_dataset(root, n_videos=3, n_frames=10, spatial_size=32,
                           flow_delta=4)
    cfg = Config(copy.deepcopy(SS_CFG.to_dict() if hasattr(
        SS_CFG, "to_dict") else dict(SS_CFG)))
    cfg["general"] = {"experiment": "second_stage", "seed": 1, "debug": True,
                      "model_name": "tiny_mixed"}
    cfg["data"].update(dataset="PlantDataset", poke_size=3, n_pokes=1,
                       yield_videos=True)
    cfg["training"]["mixed_prec_master"] = True
    dirs = {}
    for k in ("ckpt", "config", "generated", "log"):
        dirs[k] = str(tmp_path / k)
        os.makedirs(dirs[k], exist_ok=True)

    fs_model, cond, poke, frozen = _make_frozen()
    monkeypatch.setattr(SecondStageExperiment, "_load_frozen",
                        lambda self, **kw: (fs_model, cond, poke, frozen))
    exp = SecondStageExperiment(cfg, dirs, data_root=root)
    exp.build()
    batch = next(iter(exp.datamodule.train_loader(epoch=0, n_batches=1)))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    for i in range(2):
        state, log = exp.train_step(batch, epoch=0)
        exp.state = state
        assert np.isfinite(float(log["flow_loss"]))
    float_leaves = [x for x in jax.tree_util.tree_leaves(exp.state.params)
                    if jnp.issubdtype(x.dtype, jnp.floating)]
    assert float_leaves and all(
        x.dtype == jnp.bfloat16 for x in float_leaves)
    frozen_leaves = [x for x in jax.tree_util.tree_leaves(exp.frozen)
                     if jnp.issubdtype(x.dtype, jnp.floating)]
    assert all(x.dtype == jnp.bfloat16 for x in frozen_leaves)


def test_experiment_wires_fused_nice_train(tmp_path, monkeypatch):
    """training.fused_nice_train (under mixed_prec_master) scopes the ops
    gate to each step call — set during the step (where the jit trace
    happens), restored after, so nothing later in the process inherits it
    (advisor r4).  On CPU the platform dispatch keeps the portable branch,
    so training still runs with finite losses."""
    import os

    from ipoke_tpu import ops
    from ipoke_tpu.cli.experiments import SecondStageExperiment
    from ipoke_tpu.data.prep import make_synthetic_dataset
    from tests.test_second_stage import SS_CFG, _make_frozen

    root = str(tmp_path / "ds")
    make_synthetic_dataset(root, n_videos=3, n_frames=10, spatial_size=32,
                           flow_delta=4)
    cfg = Config(copy.deepcopy(SS_CFG.to_dict() if hasattr(
        SS_CFG, "to_dict") else dict(SS_CFG)))
    cfg["general"] = {"experiment": "second_stage", "seed": 1, "debug": True,
                      "model_name": "tiny_fused_train"}
    cfg["data"].update(dataset="PlantDataset", poke_size=3, n_pokes=1,
                       yield_videos=True)
    cfg["training"]["mixed_prec_master"] = True
    cfg["training"]["fused_nice_train"] = True
    dirs = {}
    for k in ("ckpt", "config", "generated", "log"):
        dirs[k] = str(tmp_path / k)
        os.makedirs(dirs[k], exist_ok=True)

    fs_model, cond, poke, frozen = _make_frozen()
    monkeypatch.setattr(SecondStageExperiment, "_load_frozen",
                        lambda self, **kw: (fs_model, cond, poke, frozen))
    try:
        exp = SecondStageExperiment(cfg, dirs, data_root=root)
        exp.build()
        from ipoke_tpu.ops import fused_nice_train_enabled
        # the gate must NOT leak at build time (it is scoped to step calls)
        assert not fused_nice_train_enabled()

        seen = {}
        jitted = exp._step.__closure__  # the wrapper closes over the jit

        def probe_step(*args):
            seen["during"] = fused_nice_train_enabled()
            return _orig(*args)

        # intercept the inner jitted fn to observe the gate mid-call
        _orig = None
        for cell in (jitted or ()):
            if callable(cell.cell_contents) and hasattr(
                    cell.cell_contents, "lower"):
                _orig = cell.cell_contents
                cell.cell_contents = probe_step
        assert _orig is not None, "fused-gate step wrapper not installed"

        batch = next(iter(exp.datamodule.train_loader(epoch=0, n_batches=1)))
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        state, log = exp.train_step(batch, epoch=0)
        assert np.isfinite(float(log["flow_loss"]))
        # gate was ON while the step (and hence any trace) ran, OFF after
        assert seen["during"] is True
        assert not fused_nice_train_enabled()
    finally:
        ops.set_fused_nice_train(None)


def test_shipped_second_stage_config_defaults_fused_train():
    """The r5 shipped-scale A/B (238.3 vs 298.4 ms/step, -20.1%,
    PERFORMANCE.md) made the mixed-master + fused-NICE recipe the shipped
    training default; keep the yaml honest about it."""
    import os

    import yaml

    cfg_path = os.path.join(os.path.dirname(__file__), "..", "config",
                            "second_stage.yaml")
    with open(cfg_path) as f:
        cfg = yaml.safe_load(f)
    assert cfg["training"]["mixed_prec_master"] is True
    assert cfg["training"]["fused_nice_train"] is True


def test_experiment_mixed_master_casts_batch(tmp_path, monkeypatch):
    """Regression (r5 demo crash): under mixed_prec_master the experiment
    must cast incoming fp32 batches to bf16 — with num_steps >= 2 the MCF
    shifted conv is reached with strict lax.conv dtypes, and an uncast
    batch fails at trace time (fp32 activations vs bf16 weights)."""
    import copy
    import os

    from ipoke_tpu.cli.experiments import SecondStageExperiment
    from ipoke_tpu.data.prep import make_synthetic_dataset
    from tests.test_second_stage import SS_CFG, _make_frozen

    root = str(tmp_path / "ds")
    make_synthetic_dataset(root, n_videos=3, n_frames=10, spatial_size=32,
                           flow_delta=4)
    cfg = Config(copy.deepcopy(SS_CFG.to_dict() if hasattr(
        SS_CFG, "to_dict") else dict(SS_CFG)))
    cfg["general"] = {"experiment": "second_stage", "seed": 1, "debug": True,
                      "model_name": "tiny_cast"}
    cfg["data"].update(dataset="PlantDataset", poke_size=3, n_pokes=1,
                       yield_videos=True)
    cfg["architecture"].update(num_steps=[2, 2])  # reaches the shifted conv
    cfg["training"]["mixed_prec_master"] = True
    cfg["training"]["fused_nice_train"] = True  # portable branch on CPU
    dirs = {}
    for k in ("ckpt", "config", "generated", "log"):
        dirs[k] = str(tmp_path / k)
        os.makedirs(dirs[k], exist_ok=True)

    fs_model, cond, poke, frozen = _make_frozen()
    monkeypatch.setattr(SecondStageExperiment, "_load_frozen",
                        lambda self, **kw: (fs_model, cond, poke, frozen))
    exp = SecondStageExperiment(cfg, dirs, data_root=root)
    exp.build()
    batch = next(iter(exp.datamodule.train_loader(epoch=0, n_batches=1)))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}  # fp32 floats
    assert batch["images"].dtype == jnp.float32
    state, log = exp.train_step(batch, epoch=0)
    exp.state = state
    assert np.isfinite(float(log["flow_loss"]))


def test_experiment_mixed_master_resume_roundtrip(tmp_path, monkeypatch):
    """Resume under mixed_prec_master: the restored state must come back
    bf16-resident with the fp32 Adafactor/Adam masters restored from the
    checkpointed opt state (NOT re-derived from bf16 params), DDI must not
    re-run (step > 0), and training must continue with finite losses."""
    import copy
    import os

    from ipoke_tpu.cli.experiments import SecondStageExperiment
    from ipoke_tpu.data.prep import make_synthetic_dataset
    from tests.test_second_stage import SS_CFG, _make_frozen

    root = str(tmp_path / "ds")
    make_synthetic_dataset(root, n_videos=3, n_frames=10, spatial_size=32,
                           flow_delta=4)

    def mkcfg():
        cfg = Config(copy.deepcopy(SS_CFG.to_dict() if hasattr(
            SS_CFG, "to_dict") else dict(SS_CFG)))
        cfg["general"] = {"experiment": "second_stage", "seed": 1,
                          "debug": True, "model_name": "tiny_resume"}
        cfg["data"].update(dataset="PlantDataset", poke_size=3, n_pokes=1,
                           yield_videos=True)
        cfg["training"]["mixed_prec_master"] = True
        return cfg

    dirs = {}
    for k in ("ckpt", "config", "generated", "log"):
        dirs[k] = str(tmp_path / k)
        os.makedirs(dirs[k], exist_ok=True)

    fs_model, cond, poke, frozen = _make_frozen()
    monkeypatch.setattr(SecondStageExperiment, "_load_frozen",
                        lambda self, **kw: (fs_model, cond, poke, frozen))
    exp = SecondStageExperiment(mkcfg(), dirs, data_root=root)
    exp.build()
    batch = next(iter(exp.datamodule.train_loader(epoch=0, n_batches=1)))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    for _ in range(2):
        state, log = exp.train_step(batch, epoch=0)
        exp.state = state
    exp.store.save(exp.state, step=int(exp.state.step), metric=1.0)
    saved_params = jax.device_get(exp.state.params)
    saved_opt_leaves = jax.tree_util.tree_leaves(jax.device_get(exp.state.opt))

    exp2 = SecondStageExperiment(mkcfg(), dirs, data_root=root)
    exp2.resume = True
    exp2.build()
    # restore from the first run's version dir (the train-loop resume path
    # resolves the same "last" name within one version), through the same
    # dtype-aligned template hook _train_loop uses
    exp2.state = exp2.store.restore(exp2._resume_template(exp2.state),
                                    exp.store._path("last"))
    # params restored bf16-resident, bit-identical to the save
    for a, b in zip(jax.tree_util.tree_leaves(saved_params),
                    jax.tree_util.tree_leaves(
                        jax.device_get(exp2.state.params))):
        assert a.dtype == b.dtype, (a.dtype, b.dtype)
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))
    # the fp32 masters inside the opt state round-trip exactly too
    for a, b in zip(saved_opt_leaves,
                    jax.tree_util.tree_leaves(
                        jax.device_get(exp2.state.opt))):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))
    assert int(exp2.state.step) == 2
    # continue training: DDI must be skipped (step > 0) and loss finite
    state, log = exp2.train_step(batch, epoch=0)
    assert np.isfinite(float(log["flow_loss"]))
