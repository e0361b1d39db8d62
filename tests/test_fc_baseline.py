"""FC tower tests: FC first stage trains under the shared VAE-GAN step; FC
second stage density + sampling."""

import jax
import jax.numpy as jnp
import numpy as np

from ipoke_tpu.core.config import Config
from ipoke_tpu.core.optim import flow_adam, gan_adam
from ipoke_tpu.data.synthetic import make_batch
from ipoke_tpu.models.fc_baseline import (
    FCBaselineModel,
    FirstStageFCWrapper,
    SecondStageModelFC,
)
from ipoke_tpu.models.first_stage import (
    build_first_stage,
    create_first_stage_state,
    make_first_stage_train_step,
)
from ipoke_tpu.models.second_stage import FrozenBundle
from ipoke_tpu.nn.vgg import init_vgg_params

K = jax.random.PRNGKey

FC_CFG = Config({
    "data": {"spatial_size": (32, 32), "max_frames": 3, "batch_size": 2},
    "architecture": {
        "fc_baseline": True, "z_dim": 16, "ENC_M_channels": [16, 16, 32, 32],
        "dec_channels": [32, 32, 16, 16], "n_gru_layers": 2,
        "CN_content": "spade",
    },
    "training": {"lr": 1e-4, "w_kl": 1e-6, "w_l1": 10.0, "w_vgg": 1.0,
                 "full_sequence": True},
    "d_t": {"use": True, "pretrain": 0, "max_frames": 3, "gp_weight": 0.5,
            "gen_weight": 1.0, "fmap_weight": 1.0, "layers": [1, 1, 1, 1]},
    "d_s": {"use": True, "pretrain": 0, "n_examples": 4, "ndf": 16,
            "n_layers": 2},
})


def _batch():
    rng = np.random.default_rng(0)
    return {k: jnp.asarray(v) for k, v in make_batch(
        rng, batch_size=2, n_frames=3, spatial_size=32).items()}


def test_fc_first_stage_trains_under_shared_gan_step():
    model, disc_s, disc_t = build_first_stage(FC_CFG)
    assert isinstance(model, FCBaselineModel)
    vgg = init_vgg_params(0)
    tx = gan_adam(1e-4)
    state = create_first_stage_state(K(0), FC_CFG, model, disc_s, disc_t,
                                     tx, tx, tx)
    step = jax.jit(make_first_stage_train_step(
        FC_CFG, model, disc_s, disc_t, vgg, tx, tx, tx))
    batch = _batch()
    state, metrics = step(state, batch, K(1), 1.0)
    for k, v in metrics.items():
        assert bool(jnp.isfinite(v)), k
    # vector latent
    v = {"params": state.params_g, "batch_stats": state.stats_g}
    _, mu, logvar = model.apply(v, batch["images"], K(2),
                                method=FCBaselineModel.encode)
    assert mu.ndim == 2 and mu.shape == (2, 16)


def test_fc_second_stage_density_and_sampling():
    model_fs, *_ = build_first_stage(FC_CFG)
    X = jnp.zeros((1, 4, 32, 32, 3))
    fs_vars = model_fs.init({"params": K(0)}, X, rng=K(1), train=False)
    cond = FirstStageFCWrapper(spatial_size=32, nf_in=3, nf_max=16)
    cond_vars = cond.init({"params": K(2)}, jnp.zeros((1, 32, 32, 3)),
                          train=False)
    poke = FirstStageFCWrapper(spatial_size=32, nf_in=2, nf_max=16)
    poke_vars = poke.init({"params": K(3)}, jnp.zeros((1, 32, 32, 2)),
                          train=False)
    frozen = {
        "fs": FrozenBundle(fs_vars["params"], fs_vars.get("batch_stats", {})),
        "cond": FrozenBundle(cond_vars["params"],
                             cond_vars.get("batch_stats", {})),
        "poke": FrozenBundle(poke_vars["params"],
                             poke_vars.get("batch_stats", {})),
    }
    ss_cfg = Config({
        "architecture": {"flow_mid_channels_factor": 2,
                         "flow_hidden_depth": 1, "n_flows": 3},
    })
    model = SecondStageModelFC(ss_cfg, model_fs, cond, poke)
    params = model.init(K(4))
    batch = _batch()
    # ddi then density
    params = model.ddi(params, frozen, batch, K(5))
    z, logdet = jax.jit(model.forward_density)(params, frozen, batch, K(6))
    assert z.shape == (2, 16) and logdet.shape == (2,)
    assert bool(jnp.all(jnp.isfinite(z)))
    vid = jax.jit(lambda p, f, b, r: model.forward_sample(p, f, b, r, 3))(
        params, frozen, batch, K(7))
    assert vid.shape == (2, 3, 32, 32, 3)
    assert bool(jnp.all(jnp.isfinite(vid)))


def test_fc_batched_eval_decode_matches_per_frame():
    model, *_ = build_first_stage(FC_CFG)
    batch = _batch()
    X = batch["images"]
    v = model.init({"params": K(0)}, X, rng=K(1), train=False)
    motion = jax.random.normal(K(2), (2, 16))

    def per_frame(mdl, motion, start, length):
        hidden = [motion] * mdl.n_gru_layers
        frames = []
        for _ in range(length):
            inp = motion
            for i, cell in enumerate(mdl.cells):
                hidden[i], _ = cell(hidden[i], inp)
                inp = hidden[i]
            frames.append(mdl.gen(hidden[-1], start, train=False))
        return jnp.stack(frames, axis=1)

    batched = model.apply(v, motion, X[:, 0], 3, False,
                          method=FCBaselineModel.decode)
    looped = model.apply(v, motion, X[:, 0], 3, method=per_frame)
    np.testing.assert_allclose(np.asarray(batched), np.asarray(looped),
                               atol=2e-5, rtol=2e-5)


def test_fc_wrapper_roundtrip_shapes():
    w = FirstStageFCWrapper(spatial_size=32, nf_in=2, nf_max=24)
    x = jnp.zeros((2, 32, 32, 2))
    v = w.init({"params": K(0)}, x, train=False)
    rec, _ = w.apply(v, x, train=True, mutable=["batch_stats"])
    assert rec.shape == x.shape
    z, *_ = w.apply(v, x, method=FirstStageFCWrapper.encode)
    assert z.shape == (2, 24)
