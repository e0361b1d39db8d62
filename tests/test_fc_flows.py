"""FC (vector) flow property tests: invertibility + logdet vs autodiff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ipoke_tpu.flows.fc import (
    ConditionalFlatFlow,
    FlatCouplingBlock,
    InvLeakyRelu,
    UnconditionalFlatFlow,
    VectorCoupling,
    build_supervised_transformer,
    build_unsupervised_transformer3,
)

K = jax.random.PRNGKey
B, D, DC = 4, 10, 6


def _autodiff_logdet(fn, x, h=None):
    out = []
    for b in range(x.shape[0]):
        hb = None if h is None else h[b : b + 1]
        J = jax.jacfwd(lambda v: fn(v[None], hb)[0])(x[b])
        sign, ld = np.linalg.slogdet(np.asarray(J, np.float64))
        out.append(ld)
    return np.asarray(out)


def _check(flow, d=D, dc=0, key=0, atol=1e-4):
    x = jax.random.normal(K(key), (B, d))
    h = jax.random.normal(K(key + 1), (B, dc)) if dc else None
    params = flow.init(K(key + 2), x.shape)
    y, ld = flow.forward(params, x, h)
    x_rec = flow.inverse(params, y, h)
    assert float(jnp.max(jnp.abs(x - x_rec))) < atol
    ld_ref = _autodiff_logdet(
        lambda v, hb: flow.forward(params, v, hb)[0], x, h
    )
    np.testing.assert_allclose(np.asarray(ld), ld_ref, atol=1e-3)
    return y, ld


def test_inv_leaky_relu():
    _check(InvLeakyRelu())


@pytest.mark.parametrize("d", [D, D + 1])  # even and odd dims
@pytest.mark.parametrize("mode,dc", [("none", 0), ("concat", DC),
                                     ("cond_only", DC)])
def test_vector_coupling(d, mode, dc):
    _check(VectorCoupling(d, hidden_dim=32, cond_channels=dc, cond_mode=mode),
           d=d, dc=dc)


def test_flat_block_with_lrelu():
    _check(FlatCouplingBlock(D, 32, cond_channels=DC, cond_mode="concat",
                             activation="lrelu"), dc=DC)


def test_conditional_flat_flow():
    flow = ConditionalFlatFlow(D, DC, hidden_dim=32, depth=2, n_flows=4)
    y, ld = _check(flow, dc=DC, key=5)
    # conditioning matters
    x = jax.random.normal(K(5), (B, D))
    h = jax.random.normal(K(6), (B, DC))
    params = flow.init(K(7), x.shape)
    y1, _ = flow.forward(params, x, h)
    y2, _ = flow.forward(params, x, h * 3)
    assert float(jnp.max(jnp.abs(y1 - y2))) > 1e-6


def test_unconditional_flat_flow_and_ddi():
    flow = UnconditionalFlatFlow(D, hidden_dim=32, depth=2, n_flows=4)
    x = jax.random.normal(K(0), (B, D)) * 3 + 1
    params = flow.init(K(1), x.shape)
    y, ld, new_params = flow.ddi(params, x)
    y2, _ = flow.forward(new_params, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-5)
    x_rec = flow.inverse(new_params, y)
    assert float(jnp.max(jnp.abs(x - x_rec))) < 1e-3


def test_builders():
    arch = {"flow_in_channels": D, "h_channels": DC, "flow_mid_channels": 32,
            "flow_hidden_depth": 2, "n_flows": 3}
    _check(build_supervised_transformer(arch), dc=DC, key=9)
    _check(build_unsupervised_transformer3(arch), key=10)
