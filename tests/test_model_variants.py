"""Model-variant coverage: PokeVAE cVAE baseline, RNN first stage, 3D
SPADE/ADAIN generator, flow-mask filtering, loss variants, AdaBelief."""

import jax
import jax.numpy as jnp
import numpy as np

from ipoke_tpu.core.config import Config
from ipoke_tpu.core.optim import flow_adam, gan_adam
from ipoke_tpu.data.datasets import compute_flow_mask
from ipoke_tpu.data.synthetic import make_batch
from ipoke_tpu.flows.loss import (
    flow_loss_alternative,
    gaussian_logp,
    nll_with_typicality,
)
from ipoke_tpu.models.first_stage import (
    build_first_stage,
    create_first_stage_state,
    make_first_stage_train_step,
)
from ipoke_tpu.models.poke_vae import PokeVAEModel, RNNMotionModel
from ipoke_tpu.nn.motion_generator import Generator3D
from ipoke_tpu.nn.vgg import init_vgg_params

K = jax.random.PRNGKey

VAE_CFG = Config({
    "data": {"spatial_size": (32, 32), "max_frames": 3, "batch_size": 2},
    "architecture": {
        "baseline": True, "z_dim": 8, "ENC_M_channels": [16, 16, 32, 32],
        "dec_channels": [32, 32, 16, 16], "n_gru_layers": 2,
        "min_spatial_size": 4, "stack_motion_and_poke": False,
    },
    "training": {"lr": 1e-4, "w_kl": 1e-4, "w_l1": 10.0, "w_vgg": 1.0,
                 "full_sequence": True, "kl_annealing": 2},
    "d_t": {"use": True, "pretrain": 0, "max_frames": 3, "gp_weight": 0.0,
            "gen_weight": 1.0, "fmap_weight": 1.0, "layers": [1, 1, 1, 1]},
    "d_s": {"use": True, "pretrain": 0, "n_examples": 4, "ndf": 16,
            "n_layers": 2},
})


def _batch():
    rng = np.random.default_rng(0)
    return {k: jnp.asarray(v) for k, v in make_batch(
        rng, batch_size=2, n_frames=3, spatial_size=32).items()}


def test_poke_vae_selected_and_trains():
    model, disc_s, disc_t = build_first_stage(VAE_CFG)
    assert isinstance(model, PokeVAEModel)
    vgg = init_vgg_params(0)
    tx = gan_adam(1e-4)
    state = create_first_stage_state(K(0), VAE_CFG, model, disc_s, disc_t,
                                     tx, tx, tx)
    step = jax.jit(make_first_stage_train_step(
        VAE_CFG, model, disc_s, disc_t, vgg, tx, tx, tx))
    batch = _batch()
    state, m = step(state, batch, K(1), 1.0, 0.5)  # kl half-annealed
    for k, v in m.items():
        assert bool(jnp.isfinite(v)), k

    # poke actually conditions the rollout
    v = {"params": state.params_g, "batch_stats": state.stats_g}
    out1, *_ = model.apply(v, batch["images"], K(2), poke=batch["poke"])
    out2, *_ = model.apply(v, batch["images"], K(2),
                           poke=batch["poke"] * 0.0)
    assert float(jnp.max(jnp.abs(out1 - out2))) > 1e-6
    # prior sampling path
    out3, *_ = model.apply(v, batch["images"], K(3), poke=batch["poke"],
                           sample_prior=True)
    assert out3.shape == out1.shape


def test_poke_vae_state_create_with_poke():
    # create_first_stage_state must init a needs_poke model correctly
    model, disc_s, disc_t = build_first_stage(VAE_CFG)
    tx = gan_adam(1e-4)
    state = create_first_stage_state(K(0), VAE_CFG, model, disc_s, disc_t,
                                     tx, tx, tx)
    assert state.params_g


def test_rnn_motion_model_shapes():
    m = RNNMotionModel(spatial_size=32, z_dim=8,
                       enc_channels=(16, 16, 32, 32),
                       dec_channels=(32, 32, 16, 16), n_gru_layers=2,
                       min_spatial_size=4, max_frames=3)
    X = jnp.zeros((2, 4, 32, 32, 3))
    v = m.init({"params": K(0)}, X, rng=K(1))
    (X_hat, mu, logvar), _ = m.apply(v, X, rng=K(2),
                                     mutable=["batch_stats"])
    assert X_hat.shape == (2, 3, 32, 32, 3)


def test_baseline_batched_eval_decode_matches_per_frame():
    """PokeVAE / RNNMotion eval decodes render all frames in ONE batched
    generator apply; each must reproduce a per-frame rollout exactly."""
    # PokeVAE
    model, *_ = build_first_stage(VAE_CFG)
    batch = _batch()
    X, poke = batch["images"], batch["poke"]
    v = model.init({"params": K(0)}, X, rng=K(1), poke=poke)

    def vae_per_frame(mdl, motion, start, length, poke):
        poke_repr = mdl._poke_repr(start, poke, False)
        if mdl.stack_motion_and_poke:
            state0 = jnp.concatenate([motion, poke_repr], axis=-1)
            in_rnn = jnp.zeros_like(state0)
        else:
            state0, in_rnn = motion, poke_repr
        hidden = tuple(state0 for _ in range(mdl.n_gru_layers))
        mods = mdl.gen.spade_modulations(start, motion.shape[1])
        frames = []
        for _ in range(length):
            hidden = mdl.rnn(in_rnn, hidden)
            frames.append(mdl.gen(hidden[-1], start, train=False, mods=mods))
        return jnp.stack(frames, axis=1)

    motion = jax.random.normal(K(2), (2, 4, 4, 8))
    batched = model.apply(v, motion, X[:, 0], 3, False, poke,
                          method=PokeVAEModel.decode)
    looped = model.apply(v, motion, X[:, 0], 3, poke, method=vae_per_frame)
    np.testing.assert_allclose(np.asarray(batched), np.asarray(looped),
                               atol=2e-5, rtol=2e-5)

    # RNNMotion
    m = RNNMotionModel(spatial_size=32, z_dim=8,
                       enc_channels=(16, 16, 32, 32),
                       dec_channels=(32, 32, 16, 16), n_gru_layers=2,
                       min_spatial_size=4, max_frames=3)
    X = jax.random.normal(K(3), (2, 4, 32, 32, 3))
    v = m.init({"params": K(0)}, X, rng=K(1))

    def rnn_per_frame(mdl, motion, start, length):
        scene, *_ = mdl.enc_static(start, train=False)
        hidden = tuple(motion for _ in range(mdl.n_gru_layers))
        x = scene
        frames = []
        for _ in range(length):
            hidden = mdl.rnn(x, hidden)
            x = mdl.post_hidden(hidden[-1])
            frames.append(mdl.gen(x, train=False))
        return jnp.stack(frames, axis=1)

    motion = jax.random.normal(K(4), (2, 4, 4, 8))
    batched = m.apply(v, motion, X[:, 0], 3, False,
                      method=RNNMotionModel.decode)
    looped = m.apply(v, motion, X[:, 0], 3, method=rnn_per_frame)
    np.testing.assert_allclose(np.asarray(batched), np.asarray(looped),
                               atol=2e-5, rtol=2e-5)


def test_generator3d_shapes():
    g = Generator3D(nf=8, z_dim=16, spatial_size=32, max_frames=5)
    z = jax.random.normal(K(0), (2, 16))
    x0 = jnp.zeros((2, 32, 32, 3))
    v = g.init({"params": K(1)}, z, x0)
    vid = g.apply(v, z, x0)
    assert vid.shape == (2, 5, 32, 32, 3)


def test_flow_mask_filtering():
    flow = np.zeros((32, 32, 2), np.float32)
    flow[8:16, 8:16] = 3.0
    mask = compute_flow_mask(flow)
    assert mask[10, 10] and not mask[0, 0]

    from ipoke_tpu.data.poke import simulate_poke

    poke, centers = simulate_poke(
        jnp.asarray(flow).__array__(), np.random.default_rng(0), 1, 3,
        foreground_mask=mask)
    r, c = centers[0]
    assert mask[r, c]


def test_loss_variants_finite():
    z = jax.random.normal(K(0), (4, 8, 8, 8))
    ld = jax.random.normal(K(1), (4,))
    for fn in (lambda: flow_loss_alternative(z, ld),
               lambda: gaussian_logp(z, ld),
               lambda: nll_with_typicality(z, ld, step=100)):
        loss, log = fn()
        assert bool(jnp.isfinite(loss)), log


def test_adabelief_runs():
    import optax

    tx = flow_adam(1e-3, use_adabelief=True)
    params = {"w": jnp.ones((4, 4))}
    opt = tx.init(params)
    grads = {"w": jnp.full((4, 4), 0.1)}
    upd, opt = tx.update(grads, opt, params)
    new = optax.apply_updates(params, upd)
    assert float(jnp.max(jnp.abs(new["w"] - params["w"]))) > 0
