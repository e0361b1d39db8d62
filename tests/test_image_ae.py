"""Image conditioner + poke-embedder training smoke tests."""

import jax
import jax.numpy as jnp
import numpy as np

from ipoke_tpu.core.config import Config
from ipoke_tpu.core.optim import gan_adam
from ipoke_tpu.data.synthetic import make_batch
from ipoke_tpu.models.image_ae import (
    build_image_ae,
    create_image_ae_state,
    make_image_ae_train_step,
)
from ipoke_tpu.nn import PatchDiscriminator2D
from ipoke_tpu.nn.vgg import init_vgg_params

K = jax.random.PRNGKey


def _run(cfg, use_disc):
    model = build_image_ae(cfg)
    disc = PatchDiscriminator2D(ndf=16, n_layers=2)
    vgg = init_vgg_params(0)
    tx = gan_adam(1e-4)
    state = create_image_ae_state(K(0), cfg, model, disc, tx, tx,
                                  use_disc=use_disc)
    step = jax.jit(make_image_ae_train_step(
        cfg, model, disc, vgg, tx, tx, use_disc=use_disc))
    rng = np.random.default_rng(0)
    batch = {k: jnp.asarray(v) for k, v in make_batch(
        rng, batch_size=2, n_frames=3, spatial_size=32).items()}
    for i in range(2):
        state, metrics = step(state, batch, K(i), 1.0)
    for k, v in metrics.items():
        assert bool(jnp.all(jnp.isfinite(jnp.asarray(v)))), f"{k}: {v}"
    return state, metrics


def test_img_encoder_trains_with_adaptive_disc():
    cfg = Config({
        "data": {"spatial_size": (32, 32)},
        "architecture": {"nf_in": 3, "nf_max": 16, "min_spatial_size": 4,
                         "deterministic": True},
        "training": {"perc_weight": 1.0, "disc_weight": 1.0},
        "disc": {"gp_weight": 0.5},
        "input_key": "images", "target_key": "images",
    })
    state, metrics = _run(cfg, use_disc=True)
    assert float(metrics["d_weight"]) >= 0


def test_poke_encoder_trains_flow_completion():
    cfg = Config({
        "data": {"spatial_size": (32, 32)},
        "architecture": {"nf_in": 2, "nf_max": 16, "min_spatial_size": 4,
                         "deterministic": True},
        "training": {"perc_weight": 1.0},
        "input_key": "poke", "target_key": "flow",
    })
    _run(cfg, use_disc=False)
