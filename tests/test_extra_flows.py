"""MixCDF coupling + hierarchical coupling flow property tests."""

import jax
import jax.numpy as jnp
import numpy as np

from ipoke_tpu.flows.extra import (
    HierarchicalCouplingFlow,
    MixCDFCoupling,
    build_mixcdf_flow,
)

K = jax.random.PRNGKey
B, H, W, C = 2, 8, 8, 8


def test_mixcdf_coupling_invertible_and_logdet():
    flow = MixCDFCoupling(C, hidden_channels=16, components=3)
    x = jax.random.normal(K(0), (B, H, W, C))
    params = flow.init(K(1), x.shape)
    # perturb from zero-init so the transform is nontrivial
    params["out"]["g"] = 0.2 * jax.random.normal(K(2),
                                                 params["out"]["g"].shape)
    y, ld = flow.forward(params, x)
    x_rec = flow.inverse(params, y)
    assert float(jnp.max(jnp.abs(x - x_rec))) < 2e-3  # bisection tolerance
    # logdet vs autodiff on one sample
    J = jax.jacfwd(lambda v: flow.forward(
        params, v.reshape(1, H, W, C))[0].ravel())(x[0].ravel())
    _, ld_ref = np.linalg.slogdet(np.asarray(J, np.float64))
    np.testing.assert_allclose(float(ld[0]), ld_ref, atol=5e-2)


def test_mixcdf_stack():
    flow = build_mixcdf_flow(C, n_blocks=2, hidden_channels=16)
    x = jax.random.normal(K(3), (B, H, W, C))
    params = flow.init(K(4), x.shape)
    y, ld = flow.forward(params, x)
    x_rec = flow.inverse(params, y)
    assert float(jnp.max(jnp.abs(x - x_rec))) < 5e-3


def test_hierarchical_coupling_flow():
    flow = HierarchicalCouplingFlow(
        num_steps=(1, 1), in_channels=C, hidden_channels=16, h_channels=6,
        factor=4, n_blocks=1)
    x = jax.random.normal(K(5), (B, H, W, C))
    h = jax.random.normal(K(6), (B, H, W, 6))
    params = flow.init(K(7), x.shape)
    y, ld = flow.forward(params, x, h)
    assert y.shape == x.shape
    x_rec = flow.inverse(params, y, h)
    assert float(jnp.max(jnp.abs(x - x_rec))) < 1e-3
