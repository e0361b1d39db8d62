"""Golden parity: the reference's BigGAN autoencoder (big_ae.py BigAE =
ResnetEncoder + ClassUp + VariableDimGenerator64, run read-only in torch
with randomized BN stats and GANalyze spectral norm) vs
``models/biggan_compat.py`` with PORTED (SN-collapsed) weights — so the FC
fork's released FCAE checkpoints can be carried over.

torchvision is absent in this image; the shared fake provides a faithful
resnet replica (the reference only uses the feature tower)."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "models")),
    reason="reference repo not mounted",
)

Z, B, S = 64, 2, 64


@pytest.fixture(scope="module")
def oracle():
    from _fake_torchvision import install_fake_torchvision

    if REF not in sys.path:
        sys.path.append(REF)
    install_fake_torchvision()
    import torch

    from models.modules.autoencoders.big_ae import BigAE

    torch.manual_seed(0)
    cfg = {"deterministic": False, "z_dim": Z, "in_size": S,
           "type": "resnet18", "norm": "bn", "pretrained": False,
           "pre_process": False, "use_actnorm_in_dec": False,
           "n_out_channels": 2, "n_in_channels": 2, "use_adain": False}
    net = BigAE(cfg)
    # randomize every BN's running stats so frozen-BN conversion is tested
    for m in net.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.8, 1.2)
    net.eval()
    # dump FIRST: the GANalyze SpectralNorm updates u on every forward, and
    # the converter's collapse reproduces exactly the next forward's math
    state = {k: t.detach().numpy().copy()
             for k, t in net.state_dict().items()}
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, size=(B, 2, S, S)).astype(np.float32)
    with torch.no_grad():
        p = net.encode(torch.from_numpy(x))
        mu, logvar = p.mean, p.logvar
        dec = net.decode(mu)
    return {"state": state, "x": x,
            "mu": mu.numpy().reshape(B, Z),
            "logvar": logvar.numpy().reshape(B, Z),
            "dec": dec.numpy()}


def test_bigae_encoder_parity(oracle):
    import jax.numpy as jnp

    from ipoke_tpu.models.biggan_compat import (
        BigAECompat,
        convert_torch_bigae,
    )

    variables = convert_torch_bigae(oracle["state"], Z, enc_type="resnet18")
    model = BigAECompat(Z, enc_type="resnet18", in_channels=2)
    x = jnp.asarray(np.transpose(oracle["x"], (0, 2, 3, 1)))
    mu, logvar = model.encode(variables, x)
    np.testing.assert_allclose(np.asarray(mu), oracle["mu"], atol=2e-4)
    np.testing.assert_allclose(np.asarray(logvar), oracle["logvar"],
                               atol=2e-4)


def test_bigae_decoder_parity(oracle):
    import jax.numpy as jnp

    from ipoke_tpu.models.biggan_compat import (
        BigAECompat,
        convert_torch_bigae,
    )

    variables = convert_torch_bigae(oracle["state"], Z, enc_type="resnet18")
    model = BigAECompat(Z, enc_type="resnet18", in_channels=2)
    z = jnp.asarray(oracle["mu"])
    dec = model.decode(variables, z)
    assert dec.shape == (B, S, S, 2)
    np.testing.assert_allclose(
        np.asarray(dec), np.transpose(oracle["dec"], (0, 2, 3, 1)),
        atol=5e-3, rtol=1e-3)


def test_third_stage_fc_composes_bigae_compat():
    """ThirdStageFC's encoder indirection drives a carried FCAE (BigAECompat)
    end to end: density forward + residual-seeded flow hallucination."""
    import jax
    import jax.numpy as jnp

    from ipoke_tpu.models.biggan_compat import (
        BigAECompat,
        TorchBigGANDecoder64,
        TorchResnetEncoder,
    )
    from ipoke_tpu.models.second_stage import FrozenBundle
    from ipoke_tpu.models.third_stage import ThirdStageFC

    z_dim, s = 48, 64
    compat = BigAECompat(z_dim, enc_type="resnet18", in_channels=2, chn=8)
    enc_v = TorchResnetEncoder(z_dim, "resnet18", 2).init(
        jax.random.PRNGKey(0), jnp.zeros((1, s, s, 2)))
    dec_v = TorchBigGANDecoder64(z_dim, chn=8, n_channels=2).init(
        jax.random.PRNGKey(1), jnp.zeros((1, z_dim)))
    frozen = {"flow_enc": FrozenBundle(
        {"encoder": enc_v, "decoder": dec_v}, {})}

    cfg = {"architecture": {"flow_in_channels": z_dim + 8,
                            "flow_mid_channels_factor": 2,
                            "flow_hidden_depth": 1, "n_flows": 4}}
    model = ThirdStageFC(cfg, compat, second_stage_density=None)
    params = model.init(jax.random.PRNGKey(2))
    batch = {"flow": jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, size=(2, s, s, 2)).astype(np.float32))}
    out, ld = model.forward_density(params, frozen, batch,
                                    jax.random.PRNGKey(3))
    assert out.shape == (2, z_dim + 8) and np.isfinite(np.asarray(out)).all()
    flow, rest = model.forward_sample_flow(params, frozen, batch,
                                           jax.random.PRNGKey(4))
    assert flow.shape == (2, s, s, 2) and rest.shape == (2, 8)
    assert np.isfinite(np.asarray(flow)).all()
