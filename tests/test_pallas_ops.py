"""Pallas masked-conv inverse kernel vs the portable lax implementation
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ipoke_tpu.flows.macow import MaskedConvFlow
from ipoke_tpu.flows.primitives import _v_norm
from ipoke_tpu.ops.masked_conv import masked_conv_inverse_pallas

K = jax.random.PRNGKey
B, H, W, C, HC = 2, 8, 8, 8, 6


def _flow_and_params(order, ks, h_channels=0, key=0):
    flow = MaskedConvFlow(C, ks, order=order, h_channels=h_channels)
    x = jax.random.normal(K(key), (B, H, W, C))
    h = jax.random.normal(K(key + 1), (B, H, W, h_channels)) \
        if h_channels else None
    params = flow.init(K(key + 2), x.shape)
    params["out"]["g"] = 0.3 * jax.random.normal(K(key + 3),
                                                 params["out"]["g"].shape)
    params["out"]["b"] = 0.1 * jax.random.normal(K(key + 4),
                                                 params["out"]["b"].shape)
    return flow, params, x, h


@pytest.mark.parametrize("order,ks", [("A", (2, 3)), ("B", (2, 3)),
                                      ("C", (3, 2)), ("D", (3, 2))])
def test_pallas_inverse_matches_lax(order, ks):
    flow, params, x, h = _flow_and_params(order, ks)
    y, _ = flow.forward(params, x, h)
    x_lax = flow.inverse(params, y, h)

    out = params["out"]
    w_out = (out["v"] * (out["g"] / _v_norm(out["v"])))[0, 0]
    x_pl = masked_conv_inverse_pallas(
        y, None, params["w_shift"], w_out, out["b"], order, flow.alpha,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x_lax), atol=1e-4)
    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x), atol=1e-4)


def test_pallas_inverse_conditional():
    flow, params, x, h = _flow_and_params("A", (2, 3), h_channels=HC, key=10)
    y, _ = flow.forward(params, x, h)
    out = params["out"]
    w_out = (out["v"] * (out["g"] / _v_norm(out["v"])))[0, 0]
    x_pl = masked_conv_inverse_pallas(
        y, h, params["w_shift"], w_out, out["b"], "A", flow.alpha,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x), atol=1e-4)


@pytest.mark.parametrize("h_channels", [0, HC])
def test_fused_unit_inverse(h_channels):
    """The fused whole-unit kernel inverts MaCowUnit's forward exactly like
    the portable Chain inverse."""
    from ipoke_tpu.flows.macow import make_macow_unit
    from ipoke_tpu.ops.masked_conv import macow_unit_inverse_pallas

    unit = make_macow_unit(C, (2, 3), h_channels=h_channels)
    x = jax.random.normal(K(20), (B, H, W, C))
    h = jax.random.normal(K(21), (B, H, W, h_channels)) \
        if h_channels else None
    params = unit.init(K(22), x.shape)
    # randomize the zero-init wn-convs and actnorms so the test is non-trivial
    _, _, params = unit.ddi(params, x, h)
    y, _ = unit.forward(params, x, h)
    x_lax = unit.inverse(params, y, h)  # portable path (cpu backend)

    x_pl = macow_unit_inverse_pallas(
        y, h, [params[0], params[1], params[3], params[4]],
        [params[2], params[5]], (2, 3), 1.0, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x_lax), atol=1e-4)
    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x), atol=1e-3)
