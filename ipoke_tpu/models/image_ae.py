"""Image / poke encoder stages.

* ``ImageAEModel`` — the conditioner phi(x_0): conv AE trained as VAE-GAN with
  a learned output logvar and an adaptive discriminator weight (reference
  ``models/first_stage_image_conv.py:21-200``).
* Poke encoder phi(c) — same AE, 2-channel poke(+image) input, target = the
  FULL flow map (poke -> flow completion), NLL only, no discriminator
  (reference ``models/conv_poke_encoder.py:16-120``).

Both produce the frozen encoders consumed by the second stage; the adaptive
disc weight ||grad_nll(last)|| / ||grad_adv(last)|| is computed from the two
param gradients directly (reference ``disc_utils.py:10-22`` uses
torch.autograd.grad on the last decoder layer).
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct

from ..core.optim import gated_update
from ..nn import PatchDiscriminator2D, gradient_penalty, hinge_d_loss
from ..nn.encoders import FirstStageWrapper
from ..nn.vgg import vgg_loss


def build_image_ae(config) -> FirstStageWrapper:
    arch = config["architecture"]
    return FirstStageWrapper(
        spatial_size=config["data"]["spatial_size"][0],
        nf_in=arch.get("nf_in", 3),
        nf_max=arch["nf_max"],
        min_spatial_size=arch.get("min_spatial_size", 8),
        deterministic=arch.get("deterministic", True),
        poke_and_image=arch.get("poke_and_image", False),
    )


class AETrainState(struct.PyTreeNode):
    params: Any          # {'ae': ..., 'logvar': scalar}
    params_d: Any
    stats: Any
    stats_d: Any
    opt: Any
    opt_d: Any
    step: jnp.ndarray


def _pad3(x):
    """Pad a 2-channel flow map to 3 channels for the VGG net
    (reference conv_poke_encoder.py:72-74)."""
    zeros = jnp.zeros((*x.shape[:-1], 1), x.dtype)
    return jnp.concatenate([x, zeros], axis=-1)


def nll_recon_loss(x, rec, logvar, vgg_params, perc_weight=1.0):
    rec_map = jnp.abs(x - rec)
    vx, vr = (x, rec) if x.shape[-1] == 3 else (_pad3(x), _pad3(rec))
    p_loss = vgg_loss(vgg_params, vx, vr)
    rec_map = rec_map + perc_weight * p_loss
    nll = rec_map / jnp.exp(logvar) + logvar
    return jnp.sum(nll) / x.shape[0], p_loss


def kl_conv(mu, logstd):
    """Reference ``utils/losses.py:50-56`` (note: takes log-std)."""
    mu = mu.reshape(mu.shape[0], -1)
    logvar = 2.0 * logstd.reshape(logstd.shape[0], -1)
    return jnp.mean(
        0.5 * jnp.sum(mu**2 + jnp.exp(logvar) - 1.0 - logvar, axis=-1)
    )


def _leaf_norm(tree):
    return jnp.sqrt(
        sum(jnp.sum(g**2) for g in jax.tree_util.tree_leaves(tree)) + 1e-12
    )


def make_image_ae_train_step(
    config, model: FirstStageWrapper, disc: PatchDiscriminator2D,
    vgg_params, tx, tx_d, use_disc: bool = True,
) -> Callable:
    """jittable ``step(state, batch, rng, disc_gate) -> (state, metrics)``.

    target key: images -> images for the conditioner; (poke|flow) -> flow for
    the poke embedder (pass ``use_disc=False`` there).
    """
    tcfg = config["training"]
    perc_w = tcfg.get("perc_weight", 1.0)
    w_kl = tcfg.get("w_kl", 0.0)
    disc_weight = tcfg.get("disc_weight", 1.0)
    gp_weight = config.get("disc", {}).get("gp_weight", 0.0)
    input_key = config.get("input_key", "images")
    target_key = config.get("target_key", "images")
    poke_and_image = config["architecture"].get("poke_and_image", False)

    def fwd(params, stats, x, rng, train=True):
        out, new_vars = model.apply(
            {"params": params, "batch_stats": stats}, x, rng=rng, train=train,
            mutable=["batch_stats"] if train else [],
        )
        return out, new_vars.get("batch_stats", stats)

    def get_io(batch):
        x_in = batch[input_key]
        if input_key == "images":
            x_in = x_in[:, -1] if x_in.ndim == 5 else x_in
        if poke_and_image:
            x_in = jnp.concatenate([x_in, batch["images"][:, 0]], axis=-1)
        tgt = batch[target_key]
        if target_key == "images":
            tgt = tgt[:, -1] if tgt.ndim == 5 else tgt
        return x_in, tgt

    def step(state: AETrainState, batch, rng, disc_gate):
        x_in, target = get_io(batch)
        r1, r2 = jax.random.split(rng)

        # ---- disc update ----
        if use_disc:
            rec0, _ = fwd(state.params["ae"], state.stats, x_in, r1,
                          train=False)

            def d_loss_fn(params_d):
                (pred_fake, _), new = disc.apply(
                    {"params": params_d, "batch_stats": state.stats_d},
                    jax.lax.stop_gradient(rec0), train=True,
                    mutable=["batch_stats"],
                )
                (pred_true, _), _ = disc.apply(
                    {"params": params_d, "batch_stats": state.stats_d},
                    target, train=False, mutable=[],
                )
                loss = 0.5 * (hinge_d_loss(pred_fake, False)
                              + hinge_d_loss(pred_true, True))
                gp = 0.0
                if gp_weight > 0:
                    gp = jnp.mean(gradient_penalty(
                        lambda v: disc.apply(
                            {"params": params_d,
                             "batch_stats": state.stats_d}, v,
                            train=False)[0],
                        target,
                    ))
                return disc_gate * (loss + gp_weight * gp), (loss, new)

            (_, (loss_d, new_d)), g_d = jax.value_and_grad(
                d_loss_fn, has_aux=True)(state.params_d)
            params_d, opt_d = gated_update(
                tx_d, disc_gate, g_d, state.opt_d, state.params_d)
            stats_d = new_d.get("batch_stats", state.stats_d)
        else:
            loss_d = 0.0
            params_d, stats_d, opt_d = state.params_d, state.stats_d, state.opt_d

        # ---- generator: two loss heads for the adaptive weight ----
        def nll_fn(params):
            rec, new_stats = fwd(params["ae"], state.stats, x_in, r1)
            nll, p_loss = nll_recon_loss(
                target, rec, params["logvar"], vgg_params, perc_w
            )
            return nll, (rec, p_loss, new_stats)

        def adv_fn(params):
            rec, _ = fwd(params["ae"], state.stats, x_in, r1)
            pred_fake, _ = disc.apply(
                {"params": params_d, "batch_stats": stats_d}, rec, train=False
            )
            return -jnp.mean(pred_fake)

        (nll, (rec, p_loss, new_stats)), g_nll = jax.value_and_grad(
            nll_fn, has_aux=True)(state.params)

        if use_disc:
            adv, g_adv = jax.value_and_grad(adv_fn)(state.params)
            d_weight = jax.lax.stop_gradient(
                jnp.clip(_leaf_norm(g_nll["ae"]) / (_leaf_norm(g_adv["ae"])
                                                    + 1e-4), 0.0, 1e4)
            ) * disc_weight * disc_gate
            grads = jax.tree_util.tree_map(
                lambda a, b: a + d_weight * b, g_nll, g_adv
            )
        else:
            adv, d_weight = 0.0, 0.0
            grads = g_nll

        upd, opt = tx.update(grads, state.opt, state.params)
        params = optax.apply_updates(state.params, upd)

        metrics = {
            "nll_loss": nll, "p_loss": p_loss, "g_loss": adv,
            "d_loss": loss_d, "d_weight": d_weight,
            "logvar": state.params["logvar"],
        }
        return state.replace(
            params=params, params_d=params_d, stats=new_stats, stats_d=stats_d,
            opt=opt, opt_d=opt_d, step=state.step + 1,
        ), metrics

    return step


def create_image_ae_state(rng, config, model, disc, tx, tx_d,
                          use_disc: bool = True) -> AETrainState:
    s = config["data"]["spatial_size"][0]
    nf_in = config["architecture"].get("nf_in", 3)
    if config["architecture"].get("poke_and_image", False):
        nf_in += 3
    k1, k2, k3 = jax.random.split(rng, 3)
    x = jnp.zeros((1, s, s, nf_in))
    v = model.init({"params": k1}, x, rng=k3, train=False)
    params = {"ae": v["params"], "logvar": jnp.zeros(())}
    out_ch = config["architecture"].get("nf_in", 3)
    vd = disc.init({"params": k2}, jnp.zeros((1, s, s, out_ch)), train=False)
    return AETrainState(
        params=params, params_d=vd["params"],
        stats=v.get("batch_stats", {}), stats_d=vd.get("batch_stats", {}),
        opt=tx.init(params), opt_d=tx_d.init(vd["params"]),
        step=jnp.zeros((), jnp.int32),
    )
