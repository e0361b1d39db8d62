"""End-to-end smoke test: first-stage VAE-GAN trains on synthetic data."""

import jax
import jax.numpy as jnp
import numpy as np

from ipoke_tpu.core.config import Config
from ipoke_tpu.core.optim import gan_adam
from ipoke_tpu.data.synthetic import make_batch
from ipoke_tpu.models.first_stage import (
    build_first_stage,
    create_first_stage_state,
    make_first_stage_train_step,
)
from ipoke_tpu.nn.vgg import init_vgg_params

TINY = Config({
    "data": {"spatial_size": (32, 32), "max_frames": 3, "batch_size": 2},
    "architecture": {
        "z_dim": 8, "ENC_M_channels": [16, 16, 32, 32],
        "dec_channels": [32, 32, 16, 16],
        "n_gru_layers": 2, "min_spatial_size": 4, "norm": "group",
        "spectral_norm": True, "motion_bias": True,
    },
    "training": {"lr": 1e-3, "w_kl": 1e-6, "w_l1": 10.0, "w_vgg": 1.0,
                 "full_sequence": True},
    "d_t": {"use": True, "pretrain": 0, "max_frames": 3, "gp_weight": 1.0,
            "gen_weight": 1.0, "fmap_weight": 1.0, "layers": [1, 1, 1, 1]},
    "d_s": {"use": True, "pretrain": 0, "n_examples": 4, "ndf": 16,
            "n_layers": 2},
})


def test_first_stage_trains():
    model, disc_s, disc_t = build_first_stage(TINY)
    vgg_params = init_vgg_params(0)
    tx = gan_adam(1e-4)
    state = create_first_stage_state(
        jax.random.PRNGKey(0), TINY, model, disc_s, disc_t, tx, tx, tx
    )
    step = jax.jit(make_first_stage_train_step(
        TINY, model, disc_s, disc_t, vgg_params, tx, tx, tx
    ))
    rng = np.random.default_rng(0)
    batch = {k: jnp.asarray(v) for k, v in make_batch(
        rng, batch_size=2, n_frames=3, spatial_size=32).items()}

    p0 = state.params_g
    metrics = None
    for i in range(2):
        state, metrics = step(state, batch, jax.random.PRNGKey(i), 1.0)
    for k, v in metrics.items():
        assert bool(jnp.isfinite(v)), f"{k} not finite: {v}"
    # generator params actually moved
    delta = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.sum(jnp.abs(b))),
        jax.tree_util.tree_map(lambda a, b: a - b, state.params_g, p0), 0.0,
    )
    assert delta > 0
    assert int(state.step) == 2


def test_first_stage_forward_and_decode_shapes():
    model, *_ = build_first_stage(TINY)
    X = jnp.zeros((2, 4, 32, 32, 3))
    v = model.init({"params": jax.random.PRNGKey(0)}, X,
                   rng=jax.random.PRNGKey(1), train=False)
    (X_hat, mu, logvar), _ = model.apply(
        v, X, rng=jax.random.PRNGKey(2), train=False, mutable=["batch_stats"])
    assert X_hat.shape == (2, 3, 32, 32, 3)
    assert mu.shape == (2, 4, 4, 8)
    # decode from a motion latent directly (the second stage's entry point)
    motion = jnp.zeros((2, 4, 4, 8))
    from ipoke_tpu.models.first_stage import FirstStageModel

    frames = model.apply(
        v, motion, X[:, 0], 5, train=False, method=FirstStageModel.decode
    )
    assert frames.shape == (2, 5, 32, 32, 3)


def test_batched_eval_decode_matches_per_frame_rollout():
    """The inference decode batches all T frames into ONE decoder apply; it
    must reproduce the per-frame rollout (the train-path scan body) exactly —
    no cross-batch ops exist in the decoder."""
    model, *_ = build_first_stage(TINY)
    rng = jax.random.PRNGKey(0)
    X = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 32, 32, 3))
    v = model.init({"params": rng}, X, rng=jax.random.PRNGKey(1), train=False)
    motion = jax.random.normal(jax.random.PRNGKey(4), (2, 4, 4, 8))
    start = X[:, 0]
    T = 5

    from ipoke_tpu.models.first_stage import FirstStageModel

    batched = model.apply(
        v, motion, start, T, train=False, method=FirstStageModel.decode
    )

    # reference rollout: GRU step + one decoder apply per frame
    def per_frame(mdl, motion, start, length):
        hidden = tuple(motion for _ in range(mdl.n_gru_layers))
        in_rnn = jnp.tile(mdl.motion_bias, (motion.shape[0], 1, 1, 1))
        mods = mdl.gen.spade_modulations(start, motion.shape[1])
        frames = []
        for _ in range(length):
            hidden = mdl.rnn(in_rnn, hidden)
            frames.append(mdl.gen(hidden[-1], start, train=False, mods=mods))
        return jnp.stack(frames, axis=1)

    looped = model.apply(v, motion, start, T, method=per_frame)
    np.testing.assert_allclose(
        np.asarray(batched), np.asarray(looped), atol=2e-5, rtol=2e-5)
