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
    if REF not in sys.path:
        sys.path.append(REF)  # APPEND: REF at path[0] would shadow the repo's main.py
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


def test_ported_conv_encoder_matches_reference():
    if REF not in sys.path:
        sys.path.append(REF)  # APPEND: REF at path[0] would shadow the repo's main.py
    import torch

    from models.modules.autoencoders.fully_conv_models import (
        ConvEncoder as RefConvEncoder,
    )

    import jax.numpy as jnp

    from ipoke_tpu.nn.encoders import ConvEncoder
    from tools.port_reference_encoders import port_conv_encoder

    torch.manual_seed(1)
    ref = RefConvEncoder(nf_in=3, nf_max=32, n_stages=3, variational=False)
    ref.eval()
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        out_ref, mean_ref, _ = ref(torch.from_numpy(x))

    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = port_conv_encoder(state, n_stages=3, variational=False)
    ours = ConvEncoder(nf_in=3, nf_max=32, n_stages=3, variational=False,
                       snorm=False)
    out, mean_pre, _ = ours.apply({"params": params},
                                  jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 3, 1, 2)), out_ref.numpy(),
        atol=5e-4)


def test_ported_variational_conv_encoder_mean_matches():
    if REF not in sys.path:
        sys.path.append(REF)  # APPEND: REF at path[0] would shadow the repo's main.py
    import torch

    from models.modules.autoencoders.fully_conv_models import (
        ConvEncoder as RefConvEncoder,
    )

    import jax.numpy as jnp

    from ipoke_tpu.nn.encoders import ConvEncoder
    from tools.port_reference_encoders import port_conv_encoder

    torch.manual_seed(2)
    ref = RefConvEncoder(nf_in=3, nf_max=32, n_stages=3, variational=True)
    ref.eval()
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        _, mean_ref, logstd_ref = ref(torch.from_numpy(x))

    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = port_conv_encoder(state, n_stages=3, variational=True)
    ours = ConvEncoder(nf_in=3, nf_max=32, n_stages=3, variational=True,
                       snorm=False)
    z, mean, logstd = ours.apply(
        {"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(
        np.transpose(np.asarray(mean), (0, 3, 1, 2)), mean_ref.numpy(),
        atol=5e-4)
    np.testing.assert_allclose(
        np.transpose(np.asarray(logstd), (0, 3, 1, 2)), logstd_ref.numpy(),
        atol=5e-4)


def test_ported_motion_encoder_matches_reference():
    if REF not in sys.path:
        sys.path.append(REF)  # APPEND: REF at path[0] would shadow the repo's main.py
    import torch

    from models.modules.motion_models.motion_encoder import (
        resnet18_alternative,
    )

    import jax.numpy as jnp

    from ipoke_tpu.nn.motion import ResNetMotionEncoder
    from tools.port_reference_encoders import port_motion_encoder

    torch.manual_seed(3)
    cfg = {"ENC_M_channels": [16, 16, 32, 32], "z_dim": 8, "img_size": 32,
           "max_frames": 4, "full_seq": True, "min_spatial_size": 4}
    ref = resnet18_alternative(dic=cfg)
    ref.eval()
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 3, 5, 32, 32)).astype(np.float32)  # NCTHW
    with torch.no_grad():
        # bypass the reference's hardcoded-.cuda() reparameterize: take the
        # deterministic feature path
        feats = ref.conv1(torch.from_numpy(x))
        feats = ref.relu(ref.bn1(feats))
        feats = ref.layer3(ref.layer2(ref.layer1(feats)))
        mu_ref = ref.conv_mu(feats.squeeze(2))
        logvar_ref = ref.conv_var(feats.squeeze(2))

    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = port_motion_encoder(state)
    ours = ResNetMotionEncoder(channels=(16, 16, 32, 32), z_dim=8,
                               spatial_size=32, max_frames=4, full_seq=True,
                               min_spatial_size=4)
    x_jax = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))  # NTHWC
    z, mu, logvar = ours.apply({"params": params}, x_jax)
    np.testing.assert_allclose(
        np.transpose(np.asarray(mu), (0, 3, 1, 2)), mu_ref.numpy(),
        atol=5e-4)
    np.testing.assert_allclose(
        np.transpose(np.asarray(logvar), (0, 3, 1, 2)), logvar_ref.numpy(),
        atol=5e-4)


def test_ported_spade_decoder_matches_reference(monkeypatch):
    if REF not in sys.path:
        sys.path.append(REF)  # APPEND: REF at path[0] would shadow the repo's main.py
    import torch

    # the reference Spade hardcodes .cuda() (util.py:496); run CPU-only
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)

    from models.modules.autoencoders.fully_conv_models import (
        SpadeCondConvDecoder as RefDecoder,
    )

    import jax.numpy as jnp

    from ipoke_tpu.nn.encoders import SpadeCondConvDecoder
    from tools.port_reference_encoders import port_spade_decoder

    torch.manual_seed(4)
    cfg = {"dec_channels": [32, 32, 16, 16], "z_dim": 8,
           "spectral_norm": True, "norm": "group", "running_stats": False}
    ref = RefDecoder(cfg)
    ref.eval()
    rng = np.random.default_rng(4)
    h_t = rng.normal(size=(2, 8, 4, 4)).astype(np.float32)
    x0 = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref([torch.from_numpy(h_t)], torch.from_numpy(x0),
                      del_shape=True)

    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = port_spade_decoder(state, n_blocks=3)
    ours = SpadeCondConvDecoder(dec_channels=(32, 32, 16, 16),
                                out_channels=3, snorm=False,
                                torch_compat=True)
    out = ours.apply({"params": params},
                     jnp.asarray(np.transpose(h_t, (0, 2, 3, 1))),
                     jnp.asarray(np.transpose(x0, (0, 2, 3, 1))))
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 3, 1, 2)), out_ref.numpy(),
        atol=5e-4)


def test_ported_conv_gru_matches_reference():
    if REF not in sys.path:
        sys.path.append(REF)  # APPEND: REF at path[0] would shadow the repo's main.py
    import torch

    from models.modules.motion_models.rnn import ConvGRU as RefConvGRU

    import jax.numpy as jnp

    from ipoke_tpu.nn.gru import ConvGRU
    from tools.port_reference_encoders import port_conv_gru

    torch.manual_seed(5)
    ref = RefConvGRU(input_size=8, hidden_sizes=8, kernel_sizes=3, n_layers=2)
    ref.eval()
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 8, 4, 4)).astype(np.float32)
    h0 = [rng.normal(size=(2, 8, 4, 4)).astype(np.float32) for _ in range(2)]
    with torch.no_grad():
        hidden_ref = ref(torch.from_numpy(x),
                         [torch.from_numpy(h) for h in h0])

    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = port_conv_gru(state, n_layers=2)
    ours = ConvGRU(hidden_size=8, n_layers=2)
    hidden = ours.apply(
        {"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        tuple(jnp.asarray(np.transpose(h, (0, 2, 3, 1))) for h in h0))
    for a, b in zip(hidden, hidden_ref):
        np.testing.assert_allclose(
            np.transpose(np.asarray(a), (0, 3, 1, 2)), b.numpy(), atol=5e-4)


def test_ported_first_stage_decode_rollout_matches(monkeypatch):
    """End-to-end first-stage sampling parity: motion latent -> ConvGRU
    rollout -> SPADE decode, composed exactly like the reference
    (first_stage_motion_model.py:497-521)."""
    if REF not in sys.path:
        sys.path.append(REF)  # APPEND: REF at path[0] would shadow the repo's main.py
    import torch

    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)

    from models.modules.autoencoders.fully_conv_models import (
        SpadeCondConvDecoder as RefDecoder,
    )
    from models.modules.motion_models.rnn import ConvGRU as RefConvGRU

    import jax.numpy as jnp

    from ipoke_tpu.models.first_stage import FirstStageModel
    from tools.port_reference_encoders import port_first_stage

    torch.manual_seed(6)
    z_dim, s_lat, S, T, n_layers = 8, 4, 32, 3, 2
    gru = RefConvGRU(input_size=z_dim, hidden_sizes=z_dim, kernel_sizes=3,
                     n_layers=n_layers)
    dec = RefDecoder({"dec_channels": [32, 32, 16, 16], "z_dim": z_dim,
                      "spectral_norm": True, "norm": "group",
                      "running_stats": False})
    gru.eval(), dec.eval()
    rng = np.random.default_rng(6)
    motion = rng.normal(size=(2, z_dim, s_lat, s_lat)).astype(np.float32)
    bias = rng.normal(size=(1, z_dim, s_lat, s_lat)).astype(np.float32)
    x0 = rng.normal(size=(2, 3, S, S)).astype(np.float32)

    with torch.no_grad():
        hidden = [torch.from_numpy(motion)] * n_layers
        in_rnn = torch.from_numpy(np.repeat(bias, 2, axis=0))
        frames_ref = []
        for _ in range(T):
            hidden = gru(in_rnn, hidden)
            frames_ref.append(dec([hidden[-1]], torch.from_numpy(x0),
                                  del_shape=True).numpy())
    out_ref = np.stack(frames_ref, axis=1)

    state = {f"rnn.{k}": v.detach().numpy()
             for k, v in gru.state_dict().items()}
    state.update({f"gen.{k}": v.detach().numpy()
                  for k, v in dec.state_dict().items()})
    state["motion_bias"] = bias
    # a tiny motion encoder just to complete the param tree (unused in decode)
    from models.modules.motion_models.motion_encoder import (
        resnet18_alternative,
    )

    enc = resnet18_alternative(dic={
        "ENC_M_channels": [16, 16, 32, 32], "z_dim": z_dim, "img_size": S,
        "max_frames": T, "full_seq": True, "min_spatial_size": s_lat})
    state.update({f"enc_motion.{k}": v.detach().numpy()
                  for k, v in enc.state_dict().items()})

    params = port_first_stage(state, n_gru_layers=n_layers, n_dec_blocks=3)
    model = FirstStageModel(
        spatial_size=S, z_dim=z_dim, enc_channels=(16, 16, 32, 32),
        dec_channels=(32, 32, 16, 16), n_gru_layers=n_layers,
        min_spatial_size=s_lat, max_frames=T, torch_compat=True)
    out = model.apply(
        {"params": params},
        jnp.asarray(np.transpose(motion, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(x0, (0, 2, 3, 1))), T, False,
        method=FirstStageModel.decode)
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 1, 4, 2, 3)), out_ref, atol=1e-3)


def test_full_second_stage_sampling_parity(monkeypatch):
    """THE end-to-end parity test: z ~ base -> cINN inverse (conditioned on
    ported encoders) -> ConvGRU+SPADE rollout, our SecondStageModel vs a
    manual composition of the reference's own modules with the same z."""
    if REF not in sys.path:
        sys.path.append(REF)  # APPEND: REF at path[0] would shadow the repo's main.py
    import torch

    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)

    from models.modules.autoencoders.fully_conv_models import (
        ConvEncoder as RefConvEncoder,
        SpadeCondConvDecoder as RefDecoder,
    )
    from models.modules.motion_models.motion_encoder import (
        resnet18_alternative,
    )
    from models.modules.motion_models.rnn import ConvGRU as RefConvGRU
    from models.modules.INN.macow2 import MaCowStep, MultiScaleInternal

    import jax.numpy as jnp

    from ipoke_tpu.core.config import Config
    from ipoke_tpu.models.first_stage import FirstStageModel
    from ipoke_tpu.models.second_stage import FrozenBundle, SecondStageModel
    from ipoke_tpu.nn.encoders import FirstStageWrapper
    from tools.port_reference_encoders import (
        port_conv_encoder,
        port_first_stage,
    )
    from tools.port_reference_flow import port_multiscale_state

    torch.manual_seed(7)
    z_dim, s_lat, S, T, n_layers, nf_cond = 8, 4, 32, 3, 2, 16
    num_steps = [1, 1]

    # ---- reference modules ----
    cond_enc = RefConvEncoder(nf_in=3, nf_max=nf_cond, n_stages=3)
    poke_enc = RefConvEncoder(nf_in=2, nf_max=nf_cond, n_stages=3)
    flow_ref = MultiScaleInternal(
        MaCowStep, num_steps=num_steps, in_channels=z_dim,
        hidden_channels=32, h_channels=2 * nf_cond, factor=4,
        transform="affine", prior_transform="affine", kernel_size=(2, 3),
        coupling_type="conv", activation="elu", use_1x1=False,
        condition_nice=False)
    gru = RefConvGRU(input_size=z_dim, hidden_sizes=z_dim, kernel_sizes=3,
                     n_layers=n_layers)
    dec = RefDecoder({"dec_channels": [32, 32, 16, 16], "z_dim": z_dim,
                      "spectral_norm": True, "norm": "group",
                      "running_stats": False})
    enc_motion = resnet18_alternative(dic={
        "ENC_M_channels": [16, 16, 32, 32], "z_dim": z_dim, "img_size": S,
        "max_frames": T, "full_seq": True, "min_spatial_size": s_lat})
    for m in (cond_enc, poke_enc, flow_ref, gru, dec, enc_motion):
        m.eval()

    rng = np.random.default_rng(7)
    x0 = rng.normal(size=(2, 3, S, S)).astype(np.float32)
    poke = rng.normal(size=(2, 2, S, S)).astype(np.float32)
    z = rng.normal(size=(2, z_dim, s_lat, s_lat)).astype(np.float32)
    bias = rng.normal(size=(1, z_dim, s_lat, s_lat)).astype(np.float32)

    with torch.no_grad():
        # init flow's data-dependent buffers
        h_ref = torch.cat([cond_enc(torch.from_numpy(x0))[0],
                           poke_enc(torch.from_numpy(poke))[0]], dim=1)
        flow_ref(torch.from_numpy(z), h=h_ref)
        motion_ref = flow_ref(torch.from_numpy(z), h=h_ref, reverse=True)
        hidden = [motion_ref] * n_layers
        in_rnn = torch.from_numpy(np.repeat(bias, 2, axis=0))
        frames = []
        for _ in range(T):
            hidden = gru(in_rnn, hidden)
            frames.append(dec([hidden[-1]], torch.from_numpy(x0),
                              del_shape=True).numpy())
    vid_ref = np.stack(frames, axis=1)

    # ---- ported composition through OUR SecondStageModel ----
    fs_state = {f"rnn.{k}": v.numpy() for k, v in gru.state_dict().items()}
    fs_state.update({f"gen.{k}": v.numpy()
                     for k, v in dec.state_dict().items()})
    fs_state.update({f"enc_motion.{k}": v.numpy()
                     for k, v in enc_motion.state_dict().items()})
    fs_state["motion_bias"] = bias
    fs_params = port_first_stage(fs_state, n_gru_layers=n_layers,
                                 n_dec_blocks=3)

    fs_model = FirstStageModel(
        spatial_size=S, z_dim=z_dim, enc_channels=(16, 16, 32, 32),
        dec_channels=(32, 32, 16, 16), n_gru_layers=n_layers,
        min_spatial_size=s_lat, max_frames=T, torch_compat=True)
    cond_model = FirstStageWrapper(spatial_size=S, nf_in=3, nf_max=nf_cond,
                                   min_spatial_size=s_lat, snorm=False)
    poke_model = FirstStageWrapper(spatial_size=S, nf_in=2, nf_max=nf_cond,
                                   min_spatial_size=s_lat, snorm=False)
    frozen = {
        "fs": FrozenBundle(fs_params, {}),
        "cond": FrozenBundle({"encoder": port_conv_encoder(
            {k: v.numpy() for k, v in cond_enc.state_dict().items()},
            n_stages=3)}, {}),
        "poke": FrozenBundle({"encoder": port_conv_encoder(
            {k: v.numpy() for k, v in poke_enc.state_dict().items()},
            n_stages=3)}, {}),
    }
    ss_cfg = Config({
        "data": {"spatial_size": (S, S), "max_frames": T},
        "architecture": {"flow_mid_channels": 32, "factor": 4,
                         "num_steps": num_steps, "kernel_size": [2, 3],
                         "transform": "affine", "prior_transform": "affine",
                         "activation": "elu", "augmented_input": False},
        "training": {}, "poke_embedder": {}})
    model = SecondStageModel(ss_cfg, fs_model, cond_model, poke_model)
    flow_state = {k: v.detach().numpy()
                  for k, v in flow_ref.state_dict().items()}
    params = {"flow": port_multiscale_state(flow_state, num_steps)}

    batch = {
        "images": jnp.asarray(np.transpose(
            np.repeat(x0[:, None], T + 1, 1), (0, 1, 3, 4, 2))),
        "poke": jnp.asarray(np.transpose(poke, (0, 2, 3, 1))),
    }
    # inject the same z: replicate forward_sample with explicit z
    cond = model.embed_conditioning(frozen, batch)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(cond, (0, 3, 1, 2))), h_ref.numpy(),
        atol=5e-4)
    motion = model.flow.inverse(params["flow"],
                                jnp.asarray(np.transpose(z, (0, 2, 3, 1))),
                                cond)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(motion, (0, 3, 1, 2))), motion_ref.numpy(),
        atol=5e-4)
    vid = model.decode_first_stage(frozen, motion, batch["images"][:, 0], T)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(vid, (0, 1, 4, 2, 3))), vid_ref, atol=2e-3)
