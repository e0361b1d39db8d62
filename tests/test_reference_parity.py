"""Golden parity: the reference's PyTorch MaCow cINN (run read-only as an
oracle from /root/reference) vs this framework's flow engine with PORTED
weights.  Forward outputs, logdets, and inverses must agree numerically —
this is the checkpoint-parity contract (SURVEY.md §7 hard part 2).
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "models")),
    reason="reference repo not mounted",
)

NUM_STEPS = [2, 1]
C, HC, B, S = 8, 6, 2, 8
HIDDEN = 32


@pytest.fixture(scope="module")
def oracle():
    sys.path.insert(0, REF)
    import torch

    from models.modules.INN.macow2 import MaCowStep, MultiScaleInternal

    torch.manual_seed(0)
    net = MultiScaleInternal(
        MaCowStep, num_steps=NUM_STEPS, in_channels=C,
        hidden_channels=HIDDEN, h_channels=HC, factor=4,
        transform="affine", prior_transform="affine", kernel_size=(2, 3),
        coupling_type="conv", activation="elu", use_1x1=False,
        condition_nice=False,
    )
    net.eval()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, C, S, S)).astype(np.float32)
    h = rng.normal(size=(B, HC, S, S)).astype(np.float32)
    with torch.no_grad():
        # first pass triggers the reference's data-dependent init buffers
        net(torch.from_numpy(x), h=torch.from_numpy(h))
        y_ref, ld_ref = net(torch.from_numpy(x), h=torch.from_numpy(h))
        x_rec_ref = net(torch.from_numpy(np.asarray(y_ref)),
                        h=torch.from_numpy(h), reverse=True)
    state = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    return {
        "state": state, "x": x, "h": h,
        "y": y_ref.numpy(), "ld": ld_ref.numpy(),
        "x_rec": x_rec_ref.numpy(),
    }


def test_ported_weights_match_reference_forward_and_logdet(oracle):
    import jax.numpy as jnp

    from ipoke_tpu.flows import MultiScaleInternal
    from tools.port_reference_flow import port_multiscale_state

    flow = MultiScaleInternal(
        num_steps=tuple(NUM_STEPS), in_channels=C, hidden_channels=HIDDEN,
        h_channels=HC, factor=4, transform="affine",
        prior_transform="affine", kernel_size=(2, 3), activation="elu",
    )
    params = port_multiscale_state(oracle["state"], NUM_STEPS)

    x = jnp.asarray(np.transpose(oracle["x"], (0, 2, 3, 1)))  # NCHW -> NHWC
    h = jnp.asarray(np.transpose(oracle["h"], (0, 2, 3, 1)))
    y, ld = flow.forward(params, x, h)

    y_ref = np.transpose(oracle["y"], (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ld), oracle["ld"], rtol=2e-4,
                               atol=2e-3)

    # inverse also matches the reference inverse (and round-trips)
    x_rec = flow.inverse(params, y, h)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=2e-4)
    x_rec_ref = np.transpose(oracle["x_rec"], (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(x_rec), x_rec_ref, atol=2e-4)
