"""First-stage video autoencoder (VAE-GAN) — the shipped
``SpadeCondMotionModel`` (reference ``models/first_stage_motion_model.py:468-545``)
rebuilt TPU-first:

* model = 3D-ResNet motion encoder -> z_m (B, s, s, z_dim) -> ConvGRU rollout
  from a learned ``motion_bias`` -> SPADE-conditioned conv decoder per frame;
* training = ONE jitted step computing the generator forward once, then
  discriminator updates (temporal 3D-ResNet on a random frame window with R1
  penalty; spatial PatchGAN on random frames) and the generator update
  (hinge adv + feature-matching + VGG + L1 + KL), replacing the reference's
  3-optimizer manual-backward choreography (``:156-297``) with pure grads;
* epoch-gated discriminators (``pretrain``) enter as a traced 0/1 gate so the
  step never recompiles.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from flax import struct

from ..core.optim import gated_update
from ..nn import (
    ConvGRU,
    PatchDiscriminator2D,
    ResNet3DDiscriminator,
    ResNetMotionEncoder,
    SpadeCondConvDecoder,
    fmap_loss,
    gen_loss,
    gradient_penalty,
    hinge_d_loss,
)
from ..nn.vgg import vgg_loss


def kl_loss(mu, logvar):
    """Reference ``utils/losses.py:47-48``: channel-sum, mean elsewhere."""
    return -0.5 * jnp.mean(
        jnp.sum(1.0 + logvar - mu**2 - jnp.exp(logvar), axis=-1)
    )


class FirstStageModel(nn.Module):
    """Video VAE generator. Call with X (B, T+1, H, W, 3) in [-1, 1]."""

    spatial_size: int
    z_dim: int = 32
    enc_channels: Sequence[int] = (64, 128, 256, 256, 256)
    dec_channels: Sequence[int] = (256, 256, 256, 128, 64)
    n_gru_layers: int = 4
    min_spatial_size: int = 8
    max_frames: int = 10
    full_seq: bool = True
    use_motion_bias: bool = True
    norm: str = "group"
    spectral_norm: bool = True
    deterministic: bool = False
    torch_compat: bool = False  # exact reference decode semantics (porting)
    dtype: Any = None

    def setup(self):
        self.enc_motion = ResNetMotionEncoder(
            channels=self.enc_channels, z_dim=self.z_dim,
            spatial_size=self.spatial_size, max_frames=self.max_frames,
            full_seq=self.full_seq, min_spatial_size=self.min_spatial_size,
            deterministic=self.deterministic, dtype=self.dtype,
        )
        self.rnn = ConvGRU(
            hidden_size=self.z_dim, n_layers=self.n_gru_layers, dtype=self.dtype
        )
        if self.use_motion_bias:
            self.motion_bias = self.param(
                "motion_bias", nn.initializers.normal(1.0),
                (1, self.min_spatial_size, self.min_spatial_size, self.z_dim),
            )
        self.gen = SpadeCondConvDecoder(
            dec_channels=self.dec_channels, out_channels=3, norm=self.norm,
            snorm=self.spectral_norm and not self.torch_compat,
            torch_compat=self.torch_compat, dtype=self.dtype,
        )

    def __call__(self, X, rng=None, train: bool = False, poke=None):
        del poke  # poke-conditioned only in the PokeVAE baseline
        X_in = X if self.full_seq else X[:, 1:]
        motion, mu, logvar = self.enc_motion(X_in, rng=rng)
        X_hat = self.decode(motion, X[:, 0], X.shape[1] - 1, train=train)
        return X_hat, mu, logvar

    def encode(self, X, rng=None):
        X_in = X if self.full_seq else X[:, 1:]
        return self.enc_motion(X_in, rng=rng)

    def decode(self, motion, start_frame, length: int, train: bool = False):
        """ConvGRU rollout + per-frame SPADE decoding
        (reference ``:497-521`` / ``second_stage_video.py:372-393``).

        One ``nn.scan`` over the T frames (params broadcast; spectral-norm
        power-iteration stats carried sequentially in train mode) instead of
        a Python loop — the unrolled HLO was the main compile-time cost of
        the shipped-scale sampling/train programs.

        The SPADE modulation maps depend only on the (fixed) start frame, so
        they are computed ONCE here and broadcast into the scan instead of
        being recomputed every frame (the reference recomputes them per frame
        — same math, ~45% of the per-frame decode FLOPs at 128px).

        Inference additionally decouples the recurrence from the rendering:
        only the tiny ConvGRU (8x8 latents) is scanned over T; the decoder —
        where all the decode FLOPs live — then renders ALL T frames in ONE
        batched apply over (T*B). Identical math (no cross-batch ops in the
        decoder: GroupNorm is per-sample, SN eval uses stored u), but the
        MXU sees T-times-larger matmul batches and the sequential chain
        shrinks to the GRU."""
        hidden = tuple(motion for _ in range(self.n_gru_layers))
        if self.use_motion_bias:
            in_rnn = jnp.tile(self.motion_bias, (motion.shape[0], 1, 1, 1))
        else:
            in_rnn = motion
        mods = self.gen.spade_modulations(start_frame, motion.shape[1])

        if not train:
            def gru_body(mdl, hidden, _):
                hidden = mdl.rnn(in_rnn, hidden)
                return hidden, hidden[-1]

            gru_scan = nn.scan(
                gru_body,
                variable_broadcast=["params", "batch_stats"],
                variable_carry=False,
                split_rngs={"params": False},
                length=length,
            )
            _, hs = gru_scan(self, hidden, None)  # (T, B, s, s, z)
            T, B = hs.shape[0], hs.shape[1]
            # flatten B-MAJOR (frame index = b*T + t): under a dp mesh the
            # batch axis is sharded, and keeping it the major factor of the
            # merged (B*T) dim lets shard propagation split it cleanly
            # instead of inserting resharding collectives
            flat = jnp.moveaxis(hs, 0, 1).reshape(B * T, *hs.shape[2:])
            # the (B,)-batched mods broadcast per clip inside the fused
            # SPADE apply (b-major flat layout) — no T-repeated
            # full-resolution gamma/beta maps are materialized
            frames = self.gen(flat, None, train=False, mods=mods)
            return frames.reshape(B, T, *frames.shape[1:])

        def body(mdl, hidden, _):
            hidden = mdl.rnn(in_rnn, hidden)
            return hidden, mdl.gen(hidden[-1], start_frame, train=train,
                                   mods=mods)

        scan = nn.scan(
            body,
            variable_broadcast="params" if train else ["params",
                                                       "batch_stats"],
            variable_carry="batch_stats" if train else False,
            split_rngs={"params": False},
            length=length,
        )
        _, frames = scan(self, hidden, None)
        return jnp.moveaxis(frames, 0, 1)


# ---------------------------------------------------------------------------
# Train state / step
# ---------------------------------------------------------------------------

class GANTrainState(struct.PyTreeNode):
    params_g: Any
    params_ds: Any
    params_dt: Any
    stats_g: Any
    stats_ds: Any
    stats_dt: Any
    opt_g: Any
    opt_ds: Any
    opt_dt: Any
    step: jnp.ndarray


def create_first_stage_state(
    rng, config, model: FirstStageModel, disc_s: PatchDiscriminator2D,
    disc_t: ResNet3DDiscriminator, tx_g, tx_ds, tx_dt,
) -> GANTrainState:
    tcfg = config["training"]
    dcfg = config["data"]
    T = dcfg["max_frames"]
    s = dcfg["spatial_size"][0]
    kg, kd1, kd2, kr = jax.random.split(rng, 4)
    X = jnp.zeros((1, T + 1, s, s, 3))
    kw = {"poke": jnp.zeros((1, s, s, 2))} if getattr(
        model, "needs_poke", False) else {}
    vg = model.init({"params": kg}, X, rng=kr, train=False, **kw)
    mf_dt = min(config["d_t"].get("max_frames", 8), T + 1)
    vdt = disc_t.init({"params": kd1}, jnp.zeros((1, mf_dt, s, s, 3)), train=False)
    vds = disc_s.init({"params": kd2}, jnp.zeros((1, s, s, 3)), train=False)
    return GANTrainState(
        params_g=vg["params"], params_ds=vds["params"], params_dt=vdt["params"],
        stats_g=vg.get("batch_stats", {}), stats_ds=vds.get("batch_stats", {}),
        stats_dt=vdt.get("batch_stats", {}),
        opt_g=tx_g.init(vg["params"]), opt_ds=tx_ds.init(vds["params"]),
        opt_dt=tx_dt.init(vdt["params"]),
        step=jnp.zeros((), jnp.int32),
    )


def make_first_stage_train_step(
    config, model: FirstStageModel, disc_s, disc_t, vgg_params,
    tx_g, tx_ds, tx_dt,
) -> Callable:
    """Returns jittable ``step(state, batch, rng, disc_gate) -> (state, metrics)``.

    ``disc_gate`` is a traced 0/1 float implementing the reference's
    epoch-gated discriminator pretraining (``d_t.pretrain``); batch['images']
    is (B, T+1, H, W, 3).
    """
    tcfg = config["training"]
    mf_dt = min(config["d_t"].get("max_frames", 8),
                config["data"]["max_frames"] + 1)
    n_examples = config["d_s"].get("n_examples", 16)
    gp_weight = config["d_t"].get("gp_weight", 0.0)
    w_kl, w_l1, w_vgg = tcfg["w_kl"], tcfg["w_l1"], tcfg["w_vgg"]
    gen_w = config["d_t"].get("gen_weight", 1.0)
    fmap_w = config["d_t"].get("fmap_weight", 1.0)

    needs_poke = getattr(model, "needs_poke", False)

    def gen_forward(params_g, stats_g, X, rng, poke=None, train=True):
        kw = {"poke": poke} if needs_poke else {}
        (X_hat, mu, logvar), new_vars = model.apply(
            {"params": params_g, "batch_stats": stats_g}, X, rng=rng,
            train=train, mutable=["batch_stats"] if train else [], **kw,
        )
        return X_hat, mu, logvar, (new_vars.get("batch_stats", stats_g))

    def step(state: GANTrainState, batch, rng, disc_gate, kl_gate=1.0):
        X = batch["images"]
        B, Tp1 = X.shape[0], X.shape[1]
        r_enc, r_off, r_true, r_fake, r_g = jax.random.split(rng, 5)

        poke = batch.get("poke") if needs_poke else None
        # ---- generator forward (once, current params) ----
        X_hat, mu, logvar, stats_g = gen_forward(
            state.params_g, state.stats_g, X, r_enc, poke
        )
        X_fake_full = jnp.concatenate([X[:, :1], X_hat], axis=1)

        # ---- temporal disc update ----
        offset = jax.random.randint(r_off, (), 0, max(1, Tp1 - mf_dt))
        window = lambda V: jax.lax.dynamic_slice_in_dim(V, offset, mf_dt, axis=1)
        X_true_w, X_fake_w = window(X), window(X_fake_full)

        def dt_loss_fn(params_dt):
            (pred_fake, _), new = disc_t.apply(
                {"params": params_dt, "batch_stats": state.stats_dt},
                jax.lax.stop_gradient(X_fake_w), train=True,
                mutable=["batch_stats"],
            )
            (pred_true, _), _ = disc_t.apply(
                {"params": params_dt, "batch_stats": state.stats_dt},
                X_true_w, train=False, mutable=[],
            )
            loss = 0.5 * (hinge_d_loss(pred_fake, False) +
                          hinge_d_loss(pred_true, True))
            gp = 0.0
            if gp_weight > 0:
                gp = jnp.mean(gradient_penalty(
                    lambda v: disc_t.apply(
                        {"params": params_dt, "batch_stats": state.stats_dt},
                        v, train=False)[0],
                    X_true_w,
                ))
            return disc_gate * (loss + gp_weight * gp), (loss, gp, new)

        (_, (loss_dt, gp_dt, new_dt)), g_dt = jax.value_and_grad(
            dt_loss_fn, has_aux=True)(state.params_dt)
        params_dt, opt_dt = gated_update(
            tx_dt, disc_gate, g_dt, state.opt_dt, state.params_dt)
        stats_dt = new_dt.get("batch_stats", state.stats_dt)

        # ---- spatial disc update ----
        idx_t = jax.random.randint(r_true, (n_examples,), 0, B * Tp1)
        idx_f = jax.random.randint(r_fake, (n_examples,), 0, B * (Tp1 - 1))
        x_true = X.reshape(-1, *X.shape[2:])[idx_t]
        x_fake = X_hat.reshape(-1, *X_hat.shape[2:])[idx_f]

        def ds_loss_fn(params_ds):
            (pred_fake, _), new = disc_s.apply(
                {"params": params_ds, "batch_stats": state.stats_ds},
                jax.lax.stop_gradient(x_fake), train=True,
                mutable=["batch_stats"],
            )
            (pred_true, _), _ = disc_s.apply(
                {"params": params_ds, "batch_stats": state.stats_ds},
                x_true, train=False, mutable=[],
            )
            loss = 0.5 * (hinge_d_loss(pred_fake, False) +
                          hinge_d_loss(pred_true, True))
            return disc_gate * loss, (loss, new)

        (_, (loss_ds, new_ds)), g_ds = jax.value_and_grad(
            ds_loss_fn, has_aux=True)(state.params_ds)
        params_ds, opt_ds = gated_update(
            tx_ds, disc_gate, g_ds, state.opt_ds, state.params_ds)
        stats_ds = new_ds.get("batch_stats", state.stats_ds)

        # ---- generator update (updated discs, frozen) ----
        def g_loss_fn(params_g):
            X_hat, mu, logvar, new_stats = gen_forward(
                params_g, state.stats_g, X, r_enc, poke
            )
            X_fake_full = jnp.concatenate([X[:, :1], X_hat], axis=1)
            X_fake_w = window(X_fake_full)
            x_fake = X_hat.reshape(-1, *X_hat.shape[2:])[idx_f]

            pred_fake_s, _ = disc_s.apply(
                {"params": params_ds, "batch_stats": stats_ds}, x_fake,
                train=False,
            )
            pred_fake_t, fmap_fake = disc_t.apply(
                {"params": params_dt, "batch_stats": stats_dt}, X_fake_w,
                train=False,
            )
            _, fmap_true = disc_t.apply(
                {"params": params_dt, "batch_stats": stats_dt}, X_true_w,
                train=False,
            )
            l_gen_s = gen_loss(pred_fake_s)
            l_gen_t = gen_loss(pred_fake_t)
            l_fmap = fmap_loss(fmap_fake, fmap_true)
            l_vgg = vgg_loss(
                vgg_params,
                X[:, 1:].reshape(-1, *X.shape[2:]),
                X_hat.reshape(-1, *X_hat.shape[2:]),
            )
            l_l1 = jnp.mean(jnp.abs(X[:, 1:] - X_hat))
            l_kl = 0.0 if model.deterministic else kl_loss(mu, logvar)
            loss = (
                disc_gate * (l_gen_s + gen_w * l_gen_t + fmap_w * l_fmap)
                + w_vgg * l_vgg + kl_gate * w_kl * l_kl + w_l1 * l_l1
            )
            aux = {
                "loss_g_s": l_gen_s, "loss_g_t": l_gen_t, "loss_fmap_t": l_fmap,
                "l_vgg": l_vgg, "l_rec": l_l1, "l_kl": l_kl, "loss": loss,
                "stats_g": new_stats,
            }
            return loss, aux

        (_, aux), g_g = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.params_g
        )
        upd, opt_g = tx_g.update(g_g, state.opt_g, state.params_g)
        params_g = optax.apply_updates(state.params_g, upd)

        metrics = {k: v for k, v in aux.items() if k != "stats_g"}
        metrics.update({"loss_d_dt": loss_dt, "loss_gp_dt": gp_dt,
                        "loss_d_ds": loss_ds})
        new_state = state.replace(
            params_g=params_g, params_ds=params_ds, params_dt=params_dt,
            stats_g=aux["stats_g"], stats_ds=stats_ds, stats_dt=stats_dt,
            opt_g=opt_g, opt_ds=opt_ds, opt_dt=opt_dt, step=state.step + 1,
        )
        return new_state, metrics

    return step


def build_first_stage(config) -> Tuple[Any, Any, Any]:
    """Model + discriminators from a reference-style config tree.

    ``architecture.baseline: True`` selects the FC vector-latent baseline
    (reference experiments/first_stage_video.py:16-23)."""
    arch = config["architecture"]
    dcfg = config["data"]
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if config["training"].get("mixed_prec", False) \
        else None
    if arch.get("fc_baseline", False):
        from .fc_baseline import FCBaselineModel

        model = FCBaselineModel(
            spatial_size=dcfg["spatial_size"][0],
            z_dim=arch["z_dim"],
            enc_channels=tuple(arch["ENC_M_channels"]),
            dec_channels=tuple(arch["dec_channels"]),
            n_gru_layers=arch.get("n_gru_layers", 2),
            max_frames=dcfg["max_frames"],
            full_seq=config["training"].get("full_sequence", True),
            use_spade=arch.get("CN_content", "spade") == "spade",
            deterministic=arch.get("deterministic", False),
            dtype=dtype,
        )
    elif arch.get("baseline", False):
        from .poke_vae import PokeVAEModel

        model = PokeVAEModel(
            spatial_size=dcfg["spatial_size"][0],
            z_dim=arch["z_dim"],
            enc_channels=tuple(arch["ENC_M_channels"]),
            dec_channels=tuple(arch["dec_channels"]),
            n_gru_layers=arch.get("n_gru_layers", 4),
            min_spatial_size=arch.get("min_spatial_size", 8),
            max_frames=dcfg["max_frames"],
            full_seq=config["training"].get("full_sequence", True),
            stack_motion_and_poke=arch.get("stack_motion_and_poke", False),
            norm=arch.get("norm", "group"),
            spectral_norm=arch.get("spectral_norm", True),
            dtype=dtype,
        )
    else:
        model = FirstStageModel(
            spatial_size=dcfg["spatial_size"][0],
            z_dim=arch["z_dim"],
            enc_channels=tuple(arch["ENC_M_channels"]),
            dec_channels=tuple(arch["dec_channels"]),
            n_gru_layers=arch.get("n_gru_layers", 4),
            min_spatial_size=arch.get("min_spatial_size", 8),
            max_frames=dcfg["max_frames"],
            full_seq=config["training"].get("full_sequence", True),
            use_motion_bias=arch.get("motion_bias", True),
            norm=arch.get("norm", "group"),
            spectral_norm=arch.get("spectral_norm", True),
            deterministic=arch.get("deterministic", False),
            torch_compat=arch.get("torch_compat", False),
            dtype=dtype,
        )
    disc_s = PatchDiscriminator2D(
        ndf=config["d_s"].get("ndf", 64),
        n_layers=config["d_s"].get("n_layers", 3),
        dtype=dtype,
    )
    disc_t = ResNet3DDiscriminator(
        layers=tuple(config["d_t"].get("layers", (1, 1, 1, 1))),
        patch_temp_disc=config["d_t"].get("patch_temp_disc", False),
        dtype=dtype,
    )
    return model, disc_s, disc_t
