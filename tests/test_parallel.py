"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ipoke_tpu.core.config import Config
from ipoke_tpu.core.optim import flow_adam
from ipoke_tpu.flows import build_macow_transformer, flow_loss
from ipoke_tpu.parallel import (
    flow_param_specs,
    make_mesh,
    replicate,
    shard_batch,
    shard_params,
)

K = jax.random.PRNGKey


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8, "conftest should provide 8 CPU devices"
    return make_mesh(8, model_parallel=2)


def test_mesh_axes(mesh8):
    assert mesh8.shape == {"data": 4, "model": 2}


def test_data_parallel_flow_training_step(mesh8):
    arch = {"flow_in_channels": 8, "flow_mid_channels_factor": 4,
            "h_channels": 16, "factor": 4, "num_steps": [1, 1]}
    flow = build_macow_transformer(arch)
    x = jax.random.normal(K(0), (8, 8, 8, 8))
    h = jax.random.normal(K(1), (8, 8, 8, 16))
    params = flow.init(K(2), x.shape)

    # dp over 'data', tp of hidden conv channels over 'model'
    params_sharded = shard_params(params, mesh8)
    xs = shard_batch({"x": x, "h": h}, mesh8)

    tx = flow_adam(1e-3, params=params)
    opt = replicate(tx.init(params), mesh8)

    from ipoke_tpu.core.optim import zero_buffer_grads

    @jax.jit
    def step(params, opt, x, h):
        def loss_fn(p):
            z, ld = flow.forward(p, x, h)
            loss, _ = flow_loss(z, ld)
            return loss

        loss, grads = jax.value_and_grad(loss_fn, allow_int=True)(params)
        grads = zero_buffer_grads(grads, params)
        upd, opt = tx.update(grads, opt, params)
        import optax

        return optax.apply_updates(params, upd), opt, loss

    p1, opt1, loss1 = step(params_sharded, opt, xs["x"], xs["h"])
    assert bool(jnp.isfinite(loss1))

    # must match the unsharded single-device result
    p_ref, _, loss_ref = step(params, tx.init(params), x, h)
    np.testing.assert_allclose(float(loss1), float(loss_ref), rtol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_flow_param_specs_shard_hidden_only():
    arch = {"flow_in_channels": 8, "flow_mid_channels_factor": 4,
            "h_channels": 0, "factor": 4, "num_steps": [1]}
    flow = build_macow_transformer(arch)
    params = flow.init(K(0), (1, 8, 8, 8))
    specs = flow_param_specs(params)
    leaves = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda s: isinstance(s, jax.sharding.PartitionSpec)
    )
    n_model = sum(1 for s in leaves if "model" in s)
    assert n_model > 0
    # actnorm / shuffle / small leaves stay replicated
    assert any(all(a is None for a in s) for s in leaves)


def test_hybrid_multislice_mesh_step():
    """2 slices x 2 dp x 2 tp over the virtual 8-device mesh: the hybrid
    (DCN) layout must reproduce the single-device step exactly — the same
    program a real multi-slice deployment runs (slice axis on DCN)."""
    from ipoke_tpu.parallel import (
        make_hybrid_mesh,
        shard_batch_hybrid,
    )

    mesh = make_hybrid_mesh(n_slices=2, model_parallel=2)
    assert mesh.shape == {"slice": 2, "data": 2, "model": 2}

    arch = {"flow_in_channels": 8, "flow_mid_channels_factor": 4,
            "h_channels": 16, "factor": 4, "num_steps": [1, 1]}
    flow = build_macow_transformer(arch)
    x = jax.random.normal(K(0), (8, 8, 8, 8))
    h = jax.random.normal(K(1), (8, 8, 8, 16))
    params = flow.init(K(2), x.shape)

    params_sharded = shard_params(params, mesh)
    xs = shard_batch_hybrid({"x": x, "h": h}, mesh)

    tx = flow_adam(1e-3, params=params)
    opt = replicate(tx.init(params), mesh)

    from ipoke_tpu.core.optim import zero_buffer_grads

    @jax.jit
    def step(params, opt, x, h):
        def loss_fn(p):
            z, ld = flow.forward(p, x, h)
            loss, _ = flow_loss(z, ld)
            return loss

        loss, grads = jax.value_and_grad(loss_fn, allow_int=True)(params)
        grads = zero_buffer_grads(grads, params)
        upd, opt = tx.update(grads, opt, params)
        import optax

        return optax.apply_updates(params, upd), opt, loss

    p1, _, loss1 = step(params_sharded, opt, xs["x"], xs["h"])
    p_ref, _, loss_ref = step(params, tx.init(params), x, h)
    np.testing.assert_allclose(float(loss1), float(loss_ref), rtol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
