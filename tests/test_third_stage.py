"""Third-stage / FC stack tests: BigAE, FCAE trainer, FlowMotion (conv) and
ThirdStageFC (vector) bridges, incl. the composed flow->video capability."""

import jax
import jax.numpy as jnp
import numpy as np

from ipoke_tpu.core.config import Config
from ipoke_tpu.core.optim import flow_adam, gan_adam
from ipoke_tpu.data.synthetic import make_batch
from ipoke_tpu.models.big_ae import BigAE
from ipoke_tpu.models.fc_stack import (
    build_big_ae,
    create_fcae_state,
    make_fcae_train_step,
)
from ipoke_tpu.models.second_stage import FrozenBundle
from ipoke_tpu.models.third_stage import (
    ConvFlowVAE,
    FlowMotionModel,
    ThirdStageFC,
    ThirdStageState,
    create_third_stage_state,
    double_recon_weight_schedule,
    make_flow_motion_train_step,
    make_third_stage_fc_train_step,
)
from ipoke_tpu.nn import PatchDiscriminator2D
from ipoke_tpu.nn.vgg import init_vgg_params

K = jax.random.PRNGKey


def _batch(bs=2, s=32, t=3):
    rng = np.random.default_rng(0)
    return {k: jnp.asarray(v) for k, v in
            make_batch(rng, batch_size=bs, n_frames=t, spatial_size=s).items()}


def test_big_ae_shapes_and_kl():
    model = BigAE(z_dim=16, spatial_size=64, in_channels=2, gen_ch=8)
    x = jax.random.normal(K(0), (2, 64, 64, 2))
    v = model.init({"params": K(1)}, x, rng=K(2))
    rec, mu, logvar = model.apply(v, x, rng=K(3))
    assert rec.shape == x.shape
    assert mu.shape == (2, 16)
    z = model.apply(v, x, method=BigAE.encode)[0]
    dec = model.apply(v, z, method=BigAE.decode)
    assert dec.shape == x.shape


def test_fcae_trains_on_flow():
    cfg = Config({
        "data": {"spatial_size": (64, 64)},
        "architecture": {"z_dim": 16, "n_out_channels": 2, "gen_ch": 8},
        "training": {"perc_weight": 1.0, "kl_weight": 1e-6,
                     "disc_weight": 1.0},
    })
    model = build_big_ae(cfg)
    disc = PatchDiscriminator2D(ndf=16, n_layers=2)
    vgg = init_vgg_params(0)
    tx = gan_adam(1e-4)
    state = create_fcae_state(K(0), cfg, model, disc, tx, tx)
    step = jax.jit(make_fcae_train_step(cfg, model, disc, vgg, tx, tx))
    batch = {"flow": jax.random.normal(K(5), (2, 64, 64, 2))}
    for i in range(2):
        state, m = step(state, batch, K(i), 1.0)
    for k, v in m.items():
        assert bool(jnp.isfinite(v)), k
    assert int(state.step) == 2


def _tiny_second_stage():
    from tests.test_second_stage import SS_CFG, _make_frozen
    from ipoke_tpu.models.second_stage import SecondStageModel

    fs_model, cond, poke, frozen = _make_frozen()
    model = SecondStageModel(SS_CFG, fs_model, cond, poke)
    params = model.init(K(77))
    return model, params, frozen


def test_flow_motion_bridge_and_video():
    ss_model, ss_params, frozen = _tiny_second_stage()
    fv = ConvFlowVAE(spatial_size=32, bottleneck_channels=4, nf_max=16,
                     min_spatial_size=4)
    fv_vars = fv.init({"params": K(0)}, jnp.zeros((1, 32, 32, 2)), rng=K(1))
    frozen = dict(frozen)
    frozen["flow_vae"] = FrozenBundle(fv_vars["params"],
                                  fv_vars.get("batch_stats", {}))

    cfg = Config({
        "architecture": {"num_steps": [1], "flow_mid_channels_factor": 2,
                         "factor": 4},
        "training": {"spatial_mean": False},
    })
    model = FlowMotionModel(cfg, ss_model, fv)
    tx = flow_adam(1e-3)
    state = create_third_stage_state(K(1), model, tx, weight_recon=1.0)
    tx = flow_adam(1e-3, params=state.params)
    state = state.replace(opt=tx.init(state.params))
    step = jax.jit(make_flow_motion_train_step(model, ss_params, tx))

    batch = _batch()
    losses = []
    for i in range(2):
        state, log = step(state, frozen, batch, K(10 + i))
        losses.append(float(log["flow_loss"]))
        assert np.isfinite(log["reconstruction_loss"])
    assert all(np.isfinite(l) for l in losses)

    # hallucinated flow map
    flow = model.forward_sample_flow(state.params, frozen, batch, K(20))
    assert flow.shape == (2, 32, 32, 2)
    # composed capability: flow -> residual -> video, no poke used
    vid = model.forward_video_from_flow(state.params, ss_params, frozen,
                                        batch, K(21), length=3)
    assert vid.shape == (2, 3, 32, 32, 3)
    assert bool(jnp.all(jnp.isfinite(vid)))


def test_third_stage_fc_bridge():
    flow_enc = BigAE(z_dim=8, spatial_size=64, in_channels=2, gen_ch=8)
    fe_vars = flow_enc.init({"params": K(0)},
                            jnp.zeros((1, 64, 64, 2)), rng=K(1))
    frozen = {"flow_enc": FrozenBundle(fe_vars["params"], {})}

    D = 12  # fake FC second-stage residual dim = z_total

    def fake_density(frozen, batch, rng):
        return jnp.tanh(
            jnp.mean(batch["flow"], axis=(1, 2)).repeat(D // 2, axis=-1))

    cfg = Config({"architecture": {
        "flow_in_channels": D, "flow_mid_channels": 32,
        "flow_hidden_depth": 1, "n_flows": 3}})
    model = ThirdStageFC(cfg, flow_enc, fake_density)
    tx = flow_adam(1e-3)
    state = create_third_stage_state(K(2), model, tx)
    tx = flow_adam(1e-3, params=state.params)
    state = state.replace(opt=tx.init(state.params))
    step = jax.jit(make_third_stage_fc_train_step(model, tx))

    batch = {"flow": jax.random.normal(K(3), (2, 64, 64, 2))}
    for i in range(2):
        state, log = step(state, frozen, batch, K(30 + i))
        assert np.isfinite(float(log["flow_loss"]))

    flow, residual = model.forward_sample_flow(state.params, frozen, batch,
                                               K(40))
    assert flow.shape == (2, 64, 64, 2)
    assert residual.shape == (2, D - 8)

    # recon-weight doubling schedule: pure function of the epoch so the
    # per-batch fit loop can call it repeatedly without compounding; the
    # reference doubles at the START of epoch 9/19/... (epoch % 10 == 9), so
    # the weight is already 2x DURING epoch 9
    w0 = float(state.weight_recon)
    for _ in range(5):  # 5 batches of epoch 3 -> unchanged
        state = double_recon_weight_schedule(state, epoch=3, initial=w0,
                                             every=10)
    assert float(state.weight_recon) == w0
    state = double_recon_weight_schedule(state, epoch=8, initial=w0,
                                         every=10)
    assert float(state.weight_recon) == w0
    for _ in range(5):  # 5 batches of epoch 9 -> exactly one doubling
        state = double_recon_weight_schedule(state, epoch=9, initial=w0,
                                             every=10)
    assert float(state.weight_recon) == 2 * w0
    state = double_recon_weight_schedule(state, epoch=18, initial=w0,
                                         every=10)
    assert float(state.weight_recon) == 2 * w0
    state = double_recon_weight_schedule(state, epoch=19, initial=w0,
                                         every=10)
    assert float(state.weight_recon) == 4 * w0
