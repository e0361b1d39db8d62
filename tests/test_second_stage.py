"""End-to-end second-stage cINN: density training + sampling on synthetic data
with tiny frozen first-stage/conditioner/poke-embedder models."""

import jax
import jax.numpy as jnp
import numpy as np

from ipoke_tpu.core.config import Config
from ipoke_tpu.core.optim import flow_adam, warmup_linear_decay, zero_buffer_grads
from ipoke_tpu.data.synthetic import make_batch
from ipoke_tpu.models.first_stage import build_first_stage
from ipoke_tpu.models.second_stage import (
    FrozenBundle,
    SecondStageModel,
    create_second_stage_state,
    make_second_stage_train_step,
)
from ipoke_tpu.nn.encoders import FirstStageWrapper

K = jax.random.PRNGKey

FS_CFG = Config({
    "data": {"spatial_size": (32, 32), "max_frames": 3, "batch_size": 2},
    "architecture": {
        "z_dim": 8, "ENC_M_channels": [16, 16, 32, 32],
        "dec_channels": [32, 32, 16, 16], "n_gru_layers": 2,
        "min_spatial_size": 4, "norm": "group", "spectral_norm": True,
        "motion_bias": True,
    },
    "training": {"full_sequence": True},
    "d_t": {}, "d_s": {},
})

SS_CFG = Config({
    "data": {"spatial_size": (32, 32), "max_frames": 3, "batch_size": 2},
    "architecture": {
        "flow_mid_channels_factor": 2, "factor": 4, "num_steps": [1, 1],
        "kernel_size": [2, 3], "transform": "affine",
        "prior_transform": "affine", "activation": "elu",
        "augmented_input": False,
    },
    "training": {"lr": 1e-3, "spatial_mean": False},
    "poke_embedder": {},
})


def _make_frozen():
    fs_model, *_ = build_first_stage(FS_CFG)
    X = jnp.zeros((1, 4, 32, 32, 3))
    fs_vars = fs_model.init({"params": K(0)}, X, rng=K(1), train=False)

    cond = FirstStageWrapper(spatial_size=32, nf_in=3, nf_max=16,
                             min_spatial_size=4, deterministic=True)
    cond_vars = cond.init({"params": K(2)}, jnp.zeros((1, 32, 32, 3)),
                          train=False)
    poke = FirstStageWrapper(spatial_size=32, nf_in=2, nf_max=16,
                             min_spatial_size=4, deterministic=True)
    poke_vars = poke.init({"params": K(3)}, jnp.zeros((1, 32, 32, 2)),
                          train=False)
    frozen = {
        "fs": FrozenBundle(fs_vars["params"], fs_vars.get("batch_stats", {})),
        "cond": FrozenBundle(cond_vars["params"],
                             cond_vars.get("batch_stats", {})),
        "poke": FrozenBundle(poke_vars["params"],
                             poke_vars.get("batch_stats", {})),
    }
    return fs_model, cond, poke, frozen


def test_second_stage_density_and_sampling():
    fs_model, cond, poke, frozen = _make_frozen()
    model = SecondStageModel(SS_CFG, fs_model, cond, poke)

    rng = np.random.default_rng(0)
    batch = {k: jnp.asarray(v) for k, v in make_batch(
        rng, batch_size=2, n_frames=3, spatial_size=32).items()}

    tx = flow_adam(warmup_linear_decay(1e-3, 5, 50))
    state = create_second_stage_state(K(10), model, tx)
    # reference-style data-dependent init from the first batch
    state = state.replace(params=model.ddi(state.params, frozen, batch, K(11)))
    tx = flow_adam(warmup_linear_decay(1e-3, 5, 50), params=state.params)
    state = state.replace(opt=tx.init(state.params))

    step = jax.jit(make_second_stage_train_step(model, tx))
    losses = []
    for i in range(3):
        state, log = step(state, frozen, batch, K(20 + i))
        losses.append(float(log["flow_loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert int(state.step) == 3

    # sampling: z ~ N(0,I) -> video
    vid = jax.jit(
        lambda p, f, b, r: model.forward_sample(p, f, b, r, length=3)
    )(state.params, frozen, batch, K(30))
    assert vid.shape == (2, 3, 32, 32, 3)
    assert bool(jnp.all(jnp.isfinite(vid)))


def test_second_stage_conv_adapt_mismatched_latent_sizes():
    """conv_adapt (reference second_stage_video.py:125-141): embedders whose
    min_spatial_size differs from the first stage's get learned stride /
    transpose-conv adapters; the composition trains and samples."""
    fs_model, *_ = build_first_stage(FS_CFG)
    X = jnp.zeros((1, 4, 32, 32, 3))
    fs_vars = fs_model.init({"params": K(0)}, X, rng=K(1), train=False)
    # conditioner latent 2x2 (needs upsample to 4), poke latent 8x8 (needs
    # strided downsample to 4)
    cond = FirstStageWrapper(spatial_size=32, nf_in=3, nf_max=16,
                             min_spatial_size=2, deterministic=True)
    cond_vars = cond.init({"params": K(2)}, jnp.zeros((1, 32, 32, 3)),
                          train=False)
    poke = FirstStageWrapper(spatial_size=32, nf_in=2, nf_max=16,
                             min_spatial_size=8, deterministic=True)
    poke_vars = poke.init({"params": K(3)}, jnp.zeros((1, 32, 32, 2)),
                          train=False)
    frozen = {
        "fs": FrozenBundle(fs_vars["params"], fs_vars.get("batch_stats", {})),
        "cond": FrozenBundle(cond_vars["params"],
                             cond_vars.get("batch_stats", {})),
        "poke": FrozenBundle(poke_vars["params"],
                             poke_vars.get("batch_stats", {})),
    }
    model = SecondStageModel(SS_CFG, fs_model, cond, poke)
    assert model.adapt_poke is not None and model.adapt_cond is not None

    rng = np.random.default_rng(2)
    batch = {k: jnp.asarray(v) for k, v in make_batch(
        rng, batch_size=2, n_frames=3, spatial_size=32).items()}
    state = create_second_stage_state(K(4), model, flow_adam(1e-3))
    assert "adapt_poke" in state.params and "adapt_cond" in state.params

    cond_emb = model.embed_conditioning(frozen, batch, state.params)
    assert cond_emb.shape == (2, 4, 4, 32)  # both adapted to fs latent size

    tx = flow_adam(1e-3, params=state.params)  # constant lr (no warmup-0)
    state = state.replace(opt=tx.init(state.params))
    step = jax.jit(make_second_stage_train_step(model, tx))
    before = jax.tree_util.tree_map(lambda x: x.copy(),
                                    state.params["adapt_poke"])
    state, log = step(state, frozen, batch, K(5))
    assert np.isfinite(float(log["flow_loss"]))
    moved = not jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: jnp.array_equal(a, b), before,
        state.params["adapt_poke"]))
    assert moved, "adapters must train"

    vid = jax.jit(
        lambda p, f, b, r: model.forward_sample(p, f, b, r, length=3)
    )(state.params, frozen, batch, K(6))
    assert vid.shape == (2, 3, 32, 32, 3)
    assert bool(jnp.all(jnp.isfinite(vid)))


def test_second_stage_density_latent_shape_matches_input():
    fs_model, cond, poke, frozen = _make_frozen()
    model = SecondStageModel(SS_CFG, fs_model, cond, poke)
    state = create_second_stage_state(K(0), model, flow_adam(1e-3))
    rng = np.random.default_rng(1)
    batch = {k: jnp.asarray(v) for k, v in make_batch(
        rng, batch_size=2, n_frames=3, spatial_size=32).items()}
    z, logdet = model.forward_density(state.params, frozen, batch, K(1))
    assert z.shape == (2, 4, 4, 8)
    assert logdet.shape == (2,)
