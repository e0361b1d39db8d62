"""Golden parity: the reference's flat conditional INN (``ConditionalFlow``,
flow_blocks.py:10-66 — the core of SupervisedTransformer / the FC fork's
second/third stages) run read-only in torch as an oracle vs
``flows/fc.py::ConditionalFlatFlow`` with PORTED weights.  Forward outputs,
logdets (reference InvLeakyRelu logdet-0 bookkeeping via
``reference_logdet=True``), and inverses must agree — extending the
checkpoint-parity contract (SURVEY.md §7) to the FC stack."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "models")),
    reason="reference repo not mounted",
)

C, CC, HID, DEPTH, NFLOWS, B = 8, 6, 32, 1, 5, 4


@pytest.fixture(scope="module")
def oracle():
    if REF not in sys.path:
        sys.path.append(REF)  # APPEND: REF at path[0] would shadow the repo's main.py
    import torch

    from models.modules.INN.flow_blocks import ConditionalFlow

    torch.manual_seed(0)
    net = ConditionalFlow(in_channels=C, embedding_dim=CC, hidden_dim=HID,
                          hidden_depth=DEPTH, n_flows=NFLOWS,
                          conditioning_option="none", activation="lrelu")
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, C)).astype(np.float32)
    h = rng.normal(size=(B, CC, 1, 1)).astype(np.float32)
    with torch.no_grad():
        # first pass triggers the ActNorm data-dependent init
        net(torch.from_numpy(x), torch.from_numpy(h))
        y, ld = net(torch.from_numpy(x), torch.from_numpy(h))
        x_rec = net(y, torch.from_numpy(h), reverse=True)
    state = {k: t.detach().numpy() for k, t in net.state_dict().items()}
    return {"state": state, "x": x, "h": h[:, :, 0, 0],
            "y": y.reshape(B, C).numpy(), "ld": ld.numpy(),
            "x_rec": x_rec.reshape(B, C).numpy()}


def _mlp(state, prefix, n_linears):
    return [{"w": np.transpose(state[f"{prefix}.main.{2 * i}.weight"]),
             "b": state[f"{prefix}.main.{2 * i}.bias"]}
            for i in range(n_linears)]


def _block(state, i):
    """reference sub_layers.{i} -> FlatCouplingBlock params
    [actnorm, inv-lrelu, coupling, shuffle]."""
    t = f"sub_layers.{i}"
    scale = state[f"{t}.norm_layer.scale"].reshape(-1)
    loc = state[f"{t}.norm_layer.loc"].reshape(-1)
    assert (scale > 0).all()
    an = {"log_scale": np.log(scale), "bias": scale * loc}
    n_lin = DEPTH + 2
    coup = {"s": [_mlp(state, f"{t}.coupling.s.{j}", n_lin)
                  for j in range(2)],
            "t": [_mlp(state, f"{t}.coupling.t.{j}", n_lin)
                  for j in range(2)]}
    shuf = {"buf_perm": state[f"{t}.shuffle.forward_shuffle_idx"],
            "buf_inv_perm": state[f"{t}.shuffle.backward_shuffle_idx"]}
    return [an, {}, coup, shuf]


def test_conditional_flat_flow_parity(oracle):
    import jax
    import jax.numpy as jnp

    from ipoke_tpu.flows.fc import ConditionalFlatFlow

    state = oracle["state"]
    flow = ConditionalFlatFlow(C, CC, HID, DEPTH, NFLOWS,
                               activation="lrelu", reference_logdet=True)
    blocks = [_block(state, i) for i in range(NFLOWS)]
    pairs = [jax.tree_util.tree_map(jnp.asarray, [blocks[2 * j],
                                                  blocks[2 * j + 1]])
             for j in range(NFLOWS // 2)]
    params = {
        "pairs": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *pairs),
    }
    if NFLOWS % 2:
        params["last"] = jax.tree_util.tree_map(jnp.asarray, blocks[-1])

    x = jnp.asarray(oracle["x"])
    h = jnp.asarray(oracle["h"])
    y, ld = flow.forward(params, x, h)
    np.testing.assert_allclose(np.asarray(y), oracle["y"], atol=2e-4)
    np.testing.assert_allclose(np.asarray(ld), oracle["ld"],
                               atol=2e-3, rtol=1e-4)
    x_rec = flow.inverse(params, jnp.asarray(oracle["y"]), h)
    np.testing.assert_allclose(np.asarray(x_rec), oracle["x_rec"],
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(x_rec), oracle["x"], atol=2e-4)
