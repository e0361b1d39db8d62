"""Golden parity: the reference's dormant UnconditionalExtendedLeapFlow
(run read-only in torch as an oracle, with its CustomLinear/ActNorm DDI
triggered) vs flows/leapfrog.py with PORTED weights — forward outputs
(x', v') and logdet must agree.  The reference's REVERSE pass is not used
as an oracle: it drops the exp on the q-scale (flow_blocks.py:1215) and so
does not invert its own forward; our inverse is instead checked against our
forward (tests/test_dormant_zoo.py)."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "models")),
    reason="reference repo not mounted",
)

C, HID, DEPTH, NFLOWS, B = 6, 24, 1, 3, 4
DT = 0.7


@pytest.fixture(scope="module")
def oracle():
    if REF not in sys.path:
        sys.path.append(REF)  # APPEND: REF at path[0] would shadow the repo's main.py
    import torch

    from models.modules.INN.flow_blocks import UnconditionalExtendedLeapFlow

    torch.manual_seed(0)
    net = UnconditionalExtendedLeapFlow(C, HID, DEPTH, NFLOWS, delta_t=DT)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, C, 1, 1)).astype(np.float32)
    v = rng.normal(size=(B, C)).astype(np.float32)
    with torch.no_grad():
        # first pass triggers CustomLinear + ActNorm data-dependent init
        net(torch.from_numpy(x), torch.from_numpy(v))
        y, w, ld = net(torch.from_numpy(x), torch.from_numpy(v))
    state = {k: t.detach().numpy() for k, t in net.state_dict().items()}
    return {"state": state, "x": x, "v": v, "y": y.numpy(),
            "w": w.numpy(), "ld": ld.numpy()}


def _port_mlp(state, prefix, n_linears):
    """torch BasicFullyConnectedNet.main.{0,2,4,...} Linear ->
    [{'w','b'}, ...] (transposed)."""
    out = []
    for i in range(n_linears):
        w = state[f"{prefix}.main.{2 * i}.weight"]
        b = state[f"{prefix}.main.{2 * i}.bias"]
        out.append({"w": np.transpose(w), "b": b})
    return out


def _port_actnorm(state, prefix):
    """reference y = scale*(x + loc) -> ours y = x*exp(log_scale) + bias."""
    scale = state[f"{prefix}.scale"].reshape(-1)
    loc = state[f"{prefix}.loc"].reshape(-1)
    assert (scale > 0).all(), "post-DDI ActNorm scales must be positive"
    return {"log_scale": np.log(scale), "bias": scale * loc}


def test_extended_leapflow_forward_parity(oracle):
    import jax.numpy as jnp

    from ipoke_tpu.flows.leapfrog import LeapFlow, _stack

    state = oracle["state"]
    flow = LeapFlow(C, HID, DEPTH, NFLOWS, delta_t=DT, extended=True)
    n_lin = DEPTH + 2  # [in->hid] + depth*[hid->hid] + [hid->out]
    blocks = []
    for i in range(NFLOWS):
        t = f"sub_layers.{i}"
        coup = {}
        for key in ("s", "t", "q", "f", "v"):
            coup[key] = [
                _port_mlp(state, f"{t}.coupling.{key}.{j}", n_lin)
                for j in range(2)
            ]
        blocks.append({
            "an_x": _port_actnorm(state, f"{t}.norm_layer_x"),
            "an_v": _port_actnorm(state, f"{t}.norm_layer_v"),
            "coupling": coup,
            "sh_x": {
                "buf_perm": state[f"{t}.shuffle_x.forward_shuffle_idx"],
                "buf_inv_perm": state[f"{t}.shuffle_x.backward_shuffle_idx"],
            },
            "sh_v": {
                "buf_perm": state[f"{t}.shuffle_v.forward_shuffle_idx"],
                "buf_inv_perm": state[f"{t}.shuffle_v.backward_shuffle_idx"],
            },
        })
    import jax

    params = {"blocks": _stack([
        jax.tree_util.tree_map(jnp.asarray, b) for b in blocks
    ])}

    x = jnp.asarray(oracle["x"][:, :, 0, 0])
    v = jnp.asarray(oracle["v"])
    y, w, ld = flow.forward(params, x, v)
    np.testing.assert_allclose(np.asarray(y), oracle["y"][:, :, 0, 0],
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(w),
                               oracle["w"].reshape(B, C), atol=2e-4)
    np.testing.assert_allclose(np.asarray(ld), oracle["ld"], atol=2e-3)

    # and OUR inverse recovers the inputs from the oracle-matched outputs
    x2, v2 = flow.inverse(params, y, w)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=2e-4)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=2e-4)
