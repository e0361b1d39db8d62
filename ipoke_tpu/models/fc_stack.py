"""FC / BigGAN-AE stack: the flow-encoder trainer.

Rebuild of reference ``models/fully_connected_ae.py`` (``FCAEModel``): a BigAE
VAE-GAN on 2-channel optical-flow maps (the third stage's "flow encoder",
trained by ``FlowAutoencoderFC.py`` / the ``flow_encoder_fc`` experiment) or
on 3-channel images (``ImgAutoencoderFC.py``).  Faithful training dynamics:

* loss = L1 + perc_weight * VGG + d_weight * disc_factor * g_loss + kl_weight * KL;
* adaptive disc weight additionally gated by ``relu(1 - relu(prev_d_loss))``
  (reference ``:99-105``);
* the discriminator update is skipped while its hinge loss is <= 0
  (reference ``:111-124``) — here a multiplicative (d_loss > 0) gate.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..core.optim import gated_update
from ..nn import PatchDiscriminator2D, hinge_d_loss
from ..nn.vgg import vgg_loss
from .big_ae import BigAE, gaussian_kl
from .image_ae import _leaf_norm, _pad3


def build_big_ae(config) -> BigAE:
    arch = config["architecture"]
    return BigAE(
        z_dim=arch["z_dim"],
        spatial_size=config["data"]["spatial_size"][0],
        in_channels=arch.get("n_out_channels", 2),
        gen_ch=arch.get("gen_ch", 48),
    )


class FCAETrainState(struct.PyTreeNode):
    params: Any
    params_d: Any
    stats_d: Any
    opt: Any
    opt_d: Any
    prev_d_loss: jnp.ndarray
    step: jnp.ndarray


def create_fcae_state(rng, config, model: BigAE, disc, tx, tx_d) -> FCAETrainState:
    s = config["data"]["spatial_size"][0]
    c = config["architecture"].get("n_out_channels", 2)
    k1, k2, k3 = jax.random.split(rng, 3)
    v = model.init({"params": k1}, jnp.zeros((1, s, s, c)), rng=k3)
    vd = disc.init({"params": k2}, jnp.zeros((1, s, s, c)), train=False)
    return FCAETrainState(
        params=v["params"], params_d=vd["params"],
        stats_d=vd.get("batch_stats", {}),
        opt=tx.init(v["params"]), opt_d=tx_d.init(vd["params"]),
        prev_d_loss=jnp.zeros(()), step=jnp.zeros((), jnp.int32),
    )


def make_fcae_train_step(config, model: BigAE, disc, vgg_params, tx, tx_d) -> Callable:
    tcfg = config["training"]
    perc_w = float(tcfg.get("perc_weight", 1.0))
    kl_w = float(tcfg.get("kl_weight", 1e-6))
    disc_weight = float(tcfg.get("disc_weight", 1.0))
    key = "flow" if config["architecture"].get("n_out_channels", 2) == 2 \
        else "images"

    def step(state: FCAETrainState, batch, rng, disc_factor):
        x = batch[key]
        if key == "images" and x.ndim == 5:
            x = x[:, 0]
        r1 = rng

        def recon_fn(params):
            rec, mu, logvar = model.apply({"params": params}, x, rng=r1)
            vx, vr = (x, rec) if x.shape[-1] == 3 else (_pad3(x), _pad3(rec))
            rec_loss = jnp.mean(jnp.abs(x - rec))
            p_loss = vgg_loss(vgg_params, vx, vr)
            kl = gaussian_kl(mu, logvar)
            return rec_loss + perc_w * p_loss + kl_w * kl, (rec, rec_loss,
                                                            p_loss, kl)

        def adv_fn(params):
            rec, *_ = model.apply({"params": params}, x, rng=r1)
            (logits_fake, _) = disc.apply(
                {"params": state.params_d, "batch_stats": state.stats_d},
                rec, train=False)
            return -jnp.mean(logits_fake)

        (nll, (rec, rec_loss, p_loss, kl)), g_nll = jax.value_and_grad(
            recon_fn, has_aux=True)(state.params)
        g_adv_val, g_adv = jax.value_and_grad(adv_fn)(state.params)

        d_weight = jnp.clip(
            _leaf_norm(g_nll) / (_leaf_norm(g_adv) + 1e-4), 0.0, 1e4
        ) * disc_weight
        d_weight = d_weight * jax.nn.relu(
            1.0 - jax.nn.relu(state.prev_d_loss))
        d_weight = jax.lax.stop_gradient(d_weight) * disc_factor

        grads = jax.tree_util.tree_map(
            lambda a, b: a + d_weight * b, g_nll, g_adv)
        upd, opt = tx.update(grads, state.opt, state.params)
        params = optax.apply_updates(state.params, upd)

        # ---- disc: hinge loss, update gated by (d_loss > 0) ----
        def d_loss_fn(params_d):
            (lr_, _), new = disc.apply(
                {"params": params_d, "batch_stats": state.stats_d}, x,
                train=True, mutable=["batch_stats"])
            (lf_, _), _ = disc.apply(
                {"params": params_d, "batch_stats": state.stats_d},
                jax.lax.stop_gradient(rec), train=False, mutable=[])
            loss = disc_factor * 0.5 * (hinge_d_loss(lr_, True) +
                                        hinge_d_loss(lf_, False))
            return loss, (new, jnp.mean(lr_), jnp.mean(lf_))

        (d_loss, (new_d, lr_mean, lf_mean)), g_d = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.params_d)
        gate = (d_loss > 0).astype(jnp.float32)
        params_d, opt_d = gated_update(
            tx_d, gate, g_d, state.opt_d, state.params_d)

        metrics = {
            "rec_loss": rec_loss, "p_loss": p_loss, "kl_loss": kl,
            "g_loss": g_adv_val, "d_loss": d_loss, "d_weight": d_weight,
            "logits_real": lr_mean, "logits_fake": lf_mean,
        }
        return state.replace(
            params=params, params_d=params_d,
            stats_d=new_d.get("batch_stats", state.stats_d),
            opt=opt, opt_d=opt_d, prev_d_loss=d_loss, step=state.step + 1,
        ), metrics

    return step
