"""FC / third-stage experiment wrappers (reference fork experiments:
``experiments/{third_stage_flow_encoder_fc,second_stage_video_fc,
third_stage_video_fc}.py`` + the standalone trainers ``FlowAutoencoderFC.py``,
``opticalFlowINN.py``)."""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..core.checkpoint import CheckpointStore
from ..core.config import Config, load_config
from ..core.optim import flow_adam, gan_adam, warmup_linear_decay
from .experiments import Experiment, _AEExperiment


class FlowEncoderFCExperiment(Experiment):
    """BigAE VAE-GAN on flow maps (reference FCAEModel via
    ``flow_encoder_fc``; monitored on perceptual recon error like the
    reference's lpips-val)."""

    monitor = "lpips-val"
    datakeys = ["flow", "images"]

    def build(self):
        from ..models.fc_stack import (
            build_big_ae,
            create_fcae_state,
            make_fcae_train_step,
        )
        from ..nn import PatchDiscriminator2D
        from ..nn.vgg import init_vgg_params

        cfg = self.config
        self.model = build_big_ae(cfg)
        self.disc = PatchDiscriminator2D(
            ndf=cfg.get("disc", {}).get("ndf", 64),
            n_layers=cfg.get("disc", {}).get("n_layers", 3))
        self.vgg_params = init_vgg_params(0)
        self.tx = self.accumulate(
            gan_adam(float(cfg["training"].get("lr", 2e-4)),
                     float(cfg["training"].get("weight_decay", 1e-5))))
        self.state = create_fcae_state(self.next_rng(), cfg, self.model,
                                       self.disc, self.tx, self.tx)
        self._step = jax.jit(make_fcae_train_step(
            cfg, self.model, self.disc, self.vgg_params, self.tx, self.tx))
        self.disc_start = int(cfg.get("disc", {}).get("start", 0))
        self.key = "flow" if cfg["architecture"].get(
            "n_out_channels", 2) == 2 else "images"

    def train_step(self, batch, epoch):
        gate = 1.0 if epoch >= self.disc_start else 0.0
        return self._step(self.state, batch, self.next_rng(), gate)

    def export_weights(self, state):
        return {"params": state.params, "stats": {}}

    def validate(self, epoch):
        from ..eval.metrics import perceptual_distance
        from ..models.image_ae import _pad3
        from ..eval import angular_error, endpoint_error

        apply = jax.jit(lambda p, x, r: self.model.apply(
            {"params": p}, x, rng=r))
        lp, ee, ae = [], [], []
        for batch in self.datamodule.val_loader(
                epoch=epoch, n_batches=self.max_val_batches):
            x = jnp.asarray(batch[self.key])
            if self.key == "images" and x.ndim == 5:
                x = x[:, 0]
            rec, *_ = apply(self.state.params, x, self.next_rng())
            a, b = (x, rec) if x.shape[-1] == 3 else (_pad3(x), _pad3(rec))
            lp.append(np.asarray(perceptual_distance(self.vgg_params, a, b)))
            if self.key == "flow":
                ee.append(float(jnp.mean(endpoint_error(x, rec))))
                ae.append(float(jnp.mean(angular_error(x, rec))))
        out = {"lpips-val": float(np.mean(np.concatenate(lp)))}
        if ee:
            out["EE-val"] = float(np.mean(ee))
            out["AE-val"] = float(np.mean(ae))
        return out


class _FCEncoderExperiment(_AEExperiment):
    """FC poke/img encoder (vector latent wrapper)."""

    def build(self):
        from ..models.fc_baseline import FirstStageFCWrapper
        from ..models.image_ae import create_image_ae_state, make_image_ae_train_step
        from ..nn import PatchDiscriminator2D
        from ..nn.vgg import init_vgg_params

        cfg = self.config
        arch = cfg["architecture"]
        self.model = FirstStageFCWrapper(
            spatial_size=cfg["data"]["spatial_size"][0],
            nf_in=arch.get("nf_in", 3), nf_max=arch["nf_max"],
            deterministic=arch.get("deterministic", True),
            poke_and_image=arch.get("poke_and_image", False))
        self.disc = PatchDiscriminator2D(
            ndf=cfg.get("disc", {}).get("ndf", 64),
            n_layers=cfg.get("disc", {}).get("n_layers", 3))
        self.vgg_params = init_vgg_params(0)
        self.tx = self.accumulate(gan_adam(float(cfg["training"].get(
            "lr", 2e-4))))
        self.state = create_image_ae_state(
            self.next_rng(), cfg, self.model, self.disc, self.tx, self.tx,
            use_disc=self.use_disc)
        self._step = jax.jit(make_image_ae_train_step(
            cfg, self.model, self.disc, self.vgg_params, self.tx, self.tx,
            use_disc=self.use_disc))
        self.disc_start = int(cfg.get("disc", {}).get("start", 0))


class ImgEncoderFCExperiment(_FCEncoderExperiment):
    datakeys = ["images"]
    use_disc = True


class PokeEncoderFCExperiment(_FCEncoderExperiment):
    datakeys = ["images", "poke", "flow"]
    use_disc = False

    def __init__(self, config, dirs, **kw):
        config["input_key"] = "poke"
        config["target_key"] = "flow"
        super().__init__(config, dirs, **kw)


class SecondStageFCExperiment(Experiment):
    """FC cINN over the frozen FC first stage + FC encoders (reference
    ``second_stage_video_fc``)."""

    monitor = "FVD-val"
    datakeys = ["images", "poke", "flow"]

    def _load_frozen(self):
        from ..models.fc_baseline import FirstStageFCWrapper
        from ..models.first_stage import build_first_stage
        from ..models.second_stage import FrozenBundle

        K = jax.random.PRNGKey
        s = self.config["data"]["spatial_size"][0]
        T = self.config["data"]["max_frames"]

        from ..models.pretrained_registry import resolve

        def load(section, model, init_x):
            sec = resolve(section, dict(self.config[section]))
            sub_cfg = load_config(sec["config"]) if isinstance(
                sec.get("config"), str) else Config(sec.get("config", {}))
            v = (model.init({"params": K(0)}, init_x, rng=K(1), train=False)
                 if section == "first_stage" else
                 model.init({"params": K(0)}, init_x, train=False))
            state = {"params": v["params"],
                     "stats": v.get("batch_stats", {})}
            if sec.get("ckpt"):
                state = CheckpointStore(sec["ckpt"]).restore_best(
                    state, weights=True)
            return model, FrozenBundle(state["params"], state["stats"])

        fs_cfg = self.config["first_stage"]
        sub = load_config(fs_cfg["config"]) if isinstance(
            fs_cfg.get("config"), str) else Config(fs_cfg["config"])
        fs_model, *_ = build_first_stage(sub)
        fs_model, fs_b = load("first_stage", fs_model,
                              jnp.zeros((1, T + 1, s, s, 3)))
        ca = self.config["conditioner"]["architecture"] if isinstance(
            self.config.get("conditioner", {}).get("architecture"), dict
        ) else {}
        cond = FirstStageFCWrapper(
            spatial_size=s, nf_in=3,
            nf_max=self.config["conditioner"].get("nf_max", 64))
        cond, cond_b = load("conditioner", cond, jnp.zeros((1, s, s, 3)))
        poke = FirstStageFCWrapper(
            spatial_size=s, nf_in=2,
            nf_max=self.config["poke_embedder"].get("nf_max", 64))
        poke, poke_b = load("poke_embedder", poke, jnp.zeros((1, s, s, 2)))
        return fs_model, cond, poke, {"fs": fs_b, "cond": cond_b,
                                      "poke": poke_b}

    def build(self):
        from ..models.fc_baseline import SecondStageModelFC
        from ..models.second_stage import FlowTrainState

        fs_model, cond, poke, self.frozen = self._load_frozen()
        self.model = SecondStageModelFC(self.config, fs_model, cond, poke)
        tcfg = self.config["training"]
        sched = warmup_linear_decay(
            float(tcfg.get("lr", 1e-3)),
            int(tcfg.get("lr_scaling_max_it", 500)),
            self.n_epochs * self.max_batches)
        params = self.model.init(self.next_rng())
        self.tx = self.accumulate(flow_adam(sched, params=params))
        self.state = FlowTrainState(params=params, opt=self.tx.init(params),
                                    step=jnp.zeros((), jnp.int32))
        self._ddi_done = False

        from ..flows import flow_loss
        import optax
        from ..core.optim import zero_buffer_grads

        def _step(state, frozen, batch, rng):
            r1, r2 = jax.random.split(rng)

            radial = self.model.radial

            def loss_fn(p):
                z, logdet = self.model.forward_density(p, frozen, batch, r1)
                return flow_loss(z, logdet, rng=r2, radial=radial)

            (loss, log), grads = jax.value_and_grad(
                loss_fn, has_aux=True, allow_int=True)(state.params)
            grads = zero_buffer_grads(grads, state.params)
            upd, opt = self.tx.update(grads, state.opt, state.params)
            return state.replace(
                params=optax.apply_updates(state.params, upd), opt=opt,
                step=state.step + 1), log

        self._step = jax.jit(_step)

    def train_step(self, batch, epoch):
        # skip DDI on resumed runs (restored step > 0) — see
        # SecondStageExperiment.train_step
        if not self._ddi_done:
            if int(self.state.step) == 0:
                self.state = self.state.replace(params=self.model.ddi(
                    self.state.params, self.frozen, batch, self.next_rng()))
            self._ddi_done = True
        return self._step(self.state, self.frozen, batch, self.next_rng())

    def export_weights(self, state):
        return {"params": state.params}

    def validate(self, epoch):
        from ..eval import compute_fvd, init_fvd_backbone

        if not hasattr(self, "_i3d"):
            s = self.config["data"]["spatial_size"][0]
            self._i3d = init_fvd_backbone(
                0, spatial=s, frames=self.config["data"]["max_frames"])
        T = self.config["data"]["max_frames"]
        sample = jax.jit(lambda p, f, b, r: self.model.forward_sample(
            p, f, b, r, length=T))
        reals, fakes = [], []
        for batch in self.datamodule.val_loader(
                epoch=epoch, n_batches=self.max_val_batches):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            vid = sample(self.state.params, self.frozen, batch,
                         self.next_rng())
            reals.append(np.asarray(batch["images"][:, 1:]))
            fakes.append(np.asarray(vid))
        fvd = compute_fvd(self._i3d, np.concatenate(reals),
                          np.concatenate(fakes),
                          batch_size=min(8, sum(r.shape[0] for r in reals)))
        return {"FVD-val": float(fvd)}


class INNFCAEExperiment(Experiment):
    """Unconditional flat-INN density model on frozen BigAE flow latents
    (reference ``FCAEINNModel``, experiments/fully_connected_ae_INN.py:42)."""

    monitor = "flow_loss-val"
    datakeys = ["flow"]

    def build(self):
        import optax

        from ..core.optim import zero_buffer_grads
        from ..flows import flow_loss
        from ..flows.fc import build_unsupervised_transformer3
        from ..models.big_ae import BigAE
        from ..models.second_stage import FlowTrainState, FrozenBundle

        cfg = self.config
        fe_sec = cfg["flow_encoder"]
        fe_cfg = load_config(fe_sec["config"]) if isinstance(
            fe_sec.get("config"), str) else Config(fe_sec["config"])
        from ..models.fc_stack import build_big_ae

        self.flow_encoder = build_big_ae(fe_cfg)
        s = fe_cfg["data"]["spatial_size"][0]
        c = fe_cfg["architecture"].get("n_out_channels", 2)
        v = self.flow_encoder.init(
            {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, s, s, c)),
            rng=jax.random.PRNGKey(1))
        state_fe = {"params": v["params"], "stats": {}}
        if fe_sec.get("ckpt"):
            state_fe = CheckpointStore(fe_sec["ckpt"]).restore_best(
                state_fe, weights=True)
        self.frozen = {"flow_enc": FrozenBundle(state_fe["params"],
                                                state_fe["stats"])}

        arch = dict(cfg["architecture"])
        arch.setdefault("flow_in_channels",
                        fe_cfg["architecture"]["z_dim"])
        arch.setdefault("flow_mid_channels",
                        4 * arch["flow_in_channels"])
        self.inn = build_unsupervised_transformer3(arch)
        params = {"inn": self.inn.init(
            jax.random.PRNGKey(2), (1, arch["flow_in_channels"]))}
        tcfg = cfg["training"]
        sched = warmup_linear_decay(
            float(tcfg.get("lr", 1e-3)),
            int(tcfg.get("lr_scaling_max_it", 500)),
            self.n_epochs * self.max_batches)
        self.tx = self.accumulate(flow_adam(sched, params=params))
        self.state = FlowTrainState(params=params, opt=self.tx.init(params),
                                    step=jnp.zeros((), jnp.int32))

        def _encode(frozen, batch, rng):
            mu, logvar = self.flow_encoder.apply(
                {"params": frozen["flow_enc"].params}, batch["flow"],
                method=BigAE.encode)
            return mu + jnp.exp(0.5 * logvar) * jax.random.normal(
                rng, mu.shape)

        self._encode = _encode

        def _step(state, frozen, batch, rng):
            r1, r2 = jax.random.split(rng)
            z_in = jax.lax.stop_gradient(_encode(frozen, batch, r1))

            def loss_fn(p):
                z, logdet = self.inn.forward(p["inn"], z_in)
                return flow_loss(z, logdet, rng=r2)

            (loss, log), grads = jax.value_and_grad(
                loss_fn, has_aux=True, allow_int=True)(state.params)
            grads = zero_buffer_grads(grads, state.params)
            upd, opt = self.tx.update(grads, state.opt, state.params)
            return state.replace(
                params=optax.apply_updates(state.params, upd), opt=opt,
                step=state.step + 1), log

        self._step = jax.jit(_step)

    def train_step(self, batch, epoch):
        return self._step(self.state, self.frozen, batch, self.next_rng())

    def export_weights(self, state):
        return {"params": state.params}

    def validate(self, epoch):
        from ..flows import flow_loss

        fn = jax.jit(lambda p, f, b, r: flow_loss(
            *self.inn.forward(p["inn"], self._encode(f, b, r))))
        losses = []
        for batch in self.datamodule.val_loader(
                epoch=epoch, n_batches=self.max_val_batches):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            loss, _ = fn(self.state.params, self.frozen, batch,
                         self.next_rng())
            losses.append(float(loss))
        return {"flow_loss-val": float(np.mean(losses))}


class ThirdStageFCExperiment(Experiment):
    """The fork's namesake third stage (reference
    ``experiments/third_stage_video_fc.py`` + ``models/third_stage_video_fc.py``
    / ``..._conditional.py``): an unconditional (or poke-conditioned, via
    ``general.conditional``) flat coupling INN aligns frozen-BigAE flow
    latents with the frozen FC second stage's residual space.

    Monitored on ``EE_R3-val`` — the fraction of flow vectors with >3px
    endpoint error between the residual-seeded hallucinated flow and the
    AE-reconstructed ground-truth flow (reference ``:341-347``, checkpoint
    gate ``val-EE_R3`` at experiments/third_stage_video_fc.py:32-33)."""

    monitor = "EE_R3-val"
    datakeys = ["images", "poke", "flow"]
    # enables the fork's `--test realism` / third-stage `--test accuracy`
    # fan-out (cli/testing.py; reference third_stage_video_fc.py:371-453)
    evaluates_hallucinated_flow = True

    def build(self):
        from ..models.big_ae import BigAE
        from ..models.fc_baseline import SecondStageModelFC
        from ..models.fc_stack import build_big_ae
        from ..models.second_stage import FrozenBundle
        from ..models.third_stage import (
            ThirdStageFC,
            create_third_stage_state,
            make_third_stage_fc_train_step,
        )

        cfg = self.config
        # frozen FC second stage (submodels + trained cINN params)
        helper = SecondStageFCExperiment.__new__(SecondStageFCExperiment)
        helper.config = cfg
        fs_model, cond, poke, frozen = helper._load_frozen()
        ss_sec = cfg["second_stage"]
        ss_cfg = load_config(ss_sec["config"]) if isinstance(
            ss_sec.get("config"), str) else Config(ss_sec["config"])
        self.ss_model = SecondStageModelFC(ss_cfg, fs_model, cond, poke)
        ss_params = self.ss_model.init(jax.random.PRNGKey(0))
        if ss_sec.get("ckpt"):
            ss_params = CheckpointStore(ss_sec["ckpt"]).restore_best(
                {"params": ss_params}, weights=True)["params"]
        self.ss_params = ss_params

        # frozen BigAE flow encoder: the repo's TPU-first BigAE (trained
        # with flow_encoder_fc), or a CARRIED reference FCAE checkpoint via
        # flow_encoder.torch_compat_npz (models/biggan_compat.py)
        fe_sec = cfg["flow_encoder"]
        if fe_sec.get("torch_compat_npz"):
            from ..models.biggan_compat import (
                BigAECompat,
                load_torch_bigae_npz,
            )

            variables = load_torch_bigae_npz(
                fe_sec["torch_compat_npz"], int(fe_sec["z_dim"]),
                enc_type=fe_sec.get("type", "resnet101"))
            self.flow_encoder = BigAECompat(
                int(fe_sec["z_dim"]), enc_type=fe_sec.get("type",
                                                          "resnet101"),
                in_channels=int(fe_sec.get("n_in_channels", 2)))
            frozen["flow_enc"] = FrozenBundle(variables, {})
        else:
            fe_cfg = load_config(fe_sec["config"]) if isinstance(
                fe_sec.get("config"), str) else Config(fe_sec["config"])
            self.flow_encoder = build_big_ae(fe_cfg)
            s = fe_cfg["data"]["spatial_size"][0]
            c = fe_cfg["architecture"].get("n_out_channels", 2)
            v = self.flow_encoder.init(
                {"params": jax.random.PRNGKey(1)}, jnp.zeros((1, s, s, c)),
                rng=jax.random.PRNGKey(2))
            fe_state = {"params": v["params"], "stats": {}}
            if fe_sec.get("ckpt"):
                fe_state = CheckpointStore(fe_sec["ckpt"]).restore_best(
                    fe_state, weights=True)
            frozen["flow_enc"] = FrozenBundle(fe_state["params"],
                                              fe_state["stats"])
        self.frozen = frozen

        arch = dict(cfg["architecture"])
        # INN dims default to the second stage's residual dims (reference
        # third_stage_video_fc_conditional.py:92: flow_in_channels = fs z_dim)
        arch.setdefault("flow_in_channels", self.ss_model.flow_in_channels)
        cfg["architecture"] = arch

        self.conditional = bool(cfg.get("general", {}).get(
            "conditional", False))
        poke_nf = self.ss_model.poke_embedder.nf_max
        ss_model, ss_p = self.ss_model, self.ss_params
        density = lambda frozen, batch, rng: ss_model.forward_density(
            ss_p, frozen, batch, rng)[0]
        # conditional variant: the INN sees the (frozen) poke embedding slice
        # of the second stage's conditioning vector (reference
        # third_stage_video_fc_conditional.py:246-248)
        self.cond_fn = (
            (lambda frozen, batch: ss_model.embed_conditioning(
                frozen, batch)[:, -poke_nf:])
            if self.conditional else None)
        self.model = ThirdStageFC(
            cfg, self.flow_encoder, density,
            poke_cond_dim=poke_nf if self.conditional else 0)

        tcfg = cfg["training"]
        sched = warmup_linear_decay(
            float(tcfg.get("lr", 1e-3)),
            int(tcfg.get("lr_scaling_max_it", 500)),
            self.n_epochs * self.max_batches)
        state = create_third_stage_state(
            self.next_rng(), self.model, flow_adam(sched),
            weight_recon=float(tcfg.get("weight_recon", 1.0)))
        self.tx = self.accumulate(flow_adam(sched, params=state.params))
        self.state = state.replace(opt=self.tx.init(state.params))
        self._step = jax.jit(make_third_stage_fc_train_step(
            self.model, self.tx, cond_fn=self.cond_fn))

        from ..eval.metrics import optical_flow_metrics
        from ..flows import flow_loss

        def _val(params, frozen, batch, rng):
            r1, r2, r3 = jax.random.split(rng, 3)
            h = self.cond_fn(frozen, batch) if self.cond_fn else None
            out_hat = density(frozen, batch, r1)  # target residual
            out, logdet = self.model.forward_density(params, frozen, batch,
                                                     r2, h)
            loss, _ = flow_loss(out, logdet)
            recon = jnp.mean((out - out_hat.reshape(out.shape)) ** 2)
            # EE metric: residual-seeded hallucinated flow vs AE-recon GT.
            # The INN is dimension-preserving, so the second-stage residual
            # IS a full latent seed (reference third_stage_video_fc.py:341
            # seeds forward_sample with the density output directly)
            z_seed = out_hat.reshape(out_hat.shape[0], -1)
            flow_hat, _ = self.model.forward_sample_flow(
                params, frozen, batch, r3, h, z=z_seed)
            mu, _ = self.model.encode_flow(frozen, batch["flow"])
            flow_ref = self.model.decode_flow_latent(frozen, mu)
            m = optical_flow_metrics(flow_hat, flow_ref)
            m["flow_loss"] = loss
            m["reconstruction_loss"] = recon
            return m

        self._val = jax.jit(_val)

    def train_step(self, batch, epoch):
        from ..models.third_stage import double_recon_weight_schedule

        if self.config["training"].get("recon_scaling", False):
            self.state = double_recon_weight_schedule(
                self.state, epoch,
                float(self.config["training"].get("weight_recon", 1.0)))
        return self._step(self.state, self.frozen, batch, self.next_rng())

    def export_weights(self, state):
        return {"params": state.params}

    def validate(self, epoch):
        agg = {}
        for batch in self.datamodule.val_loader(
                epoch=epoch, n_batches=self.max_val_batches):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            m = self._val(self.state.params, self.frozen, batch,
                          self.next_rng())
            for k, v in m.items():
                agg.setdefault(k, []).append(float(v))
        return {f"{k}-val": float(np.mean(v)) for k, v in agg.items()}

    def sample_video(self, batch, rng, length: int):
        """The composed fork capability: measured flow -> BigAE latent -> INN
        -> second-stage residual -> motion latent -> video, with NO
        ground-truth poke required for the motion content."""
        r1, r2 = jax.random.split(rng)
        h = self.cond_fn(self.frozen, batch) if self.cond_fn else None
        z = self.model.make_flow_input(self.frozen, batch, r1)
        residual, _ = self.model.inn.forward(
            self.state.params["inn"], z, h)
        cond = self.ss_model.embed_conditioning(self.frozen, batch)
        motion = self.ss_model.flow.inverse(
            self.ss_params["flow"], residual, cond)
        return self.ss_model.decode_first_stage(
            self.frozen, motion, batch["images"][:, 0], length)


class FlowVAEExperiment(Experiment):
    """Trainer for the conv ``ConvFlowVAE`` (reference FlowVAE/FlowVAE3,
    models/opticalFlow/models.py — the frozen flow encoder of the
    ``flow_motion`` bridge).  MSE recon + KL; monitored on recon endpoint
    error so ``flow_motion`` composes a genuinely trained VAE."""

    monitor = "EE-val"
    datakeys = ["flow"]

    def build(self):
        import optax

        from ..models.second_stage import FlowTrainState
        from ..models.third_stage import ConvFlowVAE

        cfg = self.config
        arch = cfg["architecture"]
        s = cfg["data"]["spatial_size"][0]
        self.model = ConvFlowVAE(
            spatial_size=s,
            bottleneck_channels=arch.get("flow_vae_channels", 8),
            nf_max=arch.get("flow_vae_nf_max", 64),
            min_spatial_size=arch.get("min_spatial_size", 8))
        v = self.model.init(
            {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, s, s, 2)),
            rng=jax.random.PRNGKey(1))
        params = v["params"]
        # spectral-norm u vectors (power iteration state) live in batch_stats
        self.stats = v.get("batch_stats", {})
        tcfg = cfg["training"]
        self.tx = self.accumulate(optax.adam(float(tcfg.get("lr", 1e-3))))
        self.state = FlowTrainState(params=params, opt=self.tx.init(params),
                                    step=jnp.zeros((), jnp.int32))
        kl_w = float(tcfg.get("kl_weight", 1e-6))

        def _step(state, stats, batch, rng):
            flow = batch["flow"]

            def loss_fn(p):
                (rec, mu, logvar), new_vars = self.model.apply(
                    {"params": p, "batch_stats": stats}, flow, rng=rng,
                    train=True, mutable=["batch_stats"])
                rec_l = jnp.mean((rec - flow) ** 2)
                kl = -0.5 * jnp.mean(jnp.sum(
                    1.0 + logvar - mu**2 - jnp.exp(logvar), axis=-1))
                loss = rec_l + kl_w * kl
                return loss, ({"loss": loss, "rec_loss": rec_l,
                               "kl_loss": kl}, new_vars["batch_stats"])

            (loss, (log, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            upd, opt = self.tx.update(grads, state.opt, state.params)
            return state.replace(
                params=optax.apply_updates(state.params, upd), opt=opt,
                step=state.step + 1), new_stats, log

        self._step = jax.jit(_step)

    def train_step(self, batch, epoch):
        state, self.stats, log = self._step(self.state, self.stats, batch,
                                            self.next_rng())
        self.state = state
        return state, log

    def export_weights(self, state):
        return {"params": state.params, "stats": self.stats}

    def validate(self, epoch):
        from ..eval import angular_error, endpoint_error

        apply = jax.jit(lambda p, st, x: self.model.apply(
            {"params": p, "batch_stats": st}, x))
        ees, aes = [], []
        for batch in self.datamodule.val_loader(
                epoch=epoch, n_batches=self.max_val_batches):
            flow = jnp.asarray(batch["flow"])
            rec, *_ = apply(self.state.params, self.stats, flow)
            ees.append(float(jnp.mean(endpoint_error(flow, rec))))
            aes.append(float(jnp.mean(angular_error(flow, rec))))
        return {"EE-val": float(np.mean(ees)), "AE-val": float(np.mean(aes))}


class FlowMotionExperiment(Experiment):
    """Conv third stage (reference ``opticalFlowINN.py`` / ``flow_motion.py``):
    train the bridge INN against the frozen conv second stage + flow VAE.
    Monitored on endpoint error of hallucinated flow (reference
    ``val-EE_R3``-style, third_stage_video_fc experiment)."""

    monitor = "EE-val"
    datakeys = ["images", "poke", "flow"]

    def build(self):
        from ..models.second_stage import FlowTrainState, FrozenBundle
        from ..models.third_stage import (
            ConvFlowVAE,
            FlowMotionModel,
            create_third_stage_state,
            make_flow_motion_train_step,
        )
        from .experiments import SecondStageExperiment

        cfg = self.config
        # reuse the second-stage experiment's frozen-model loader
        helper = SecondStageExperiment.__new__(SecondStageExperiment)
        helper.config = cfg
        fs_model, cond_model, poke_model, frozen = helper._load_frozen()
        from ..models.second_stage import SecondStageModel

        ss_cfg = load_config(cfg["second_stage"]["config"]) if isinstance(
            cfg["second_stage"].get("config"), str) else Config(
            cfg["second_stage"]["config"])
        self.ss_model = SecondStageModel(ss_cfg, fs_model, cond_model,
                                         poke_model)
        ss_params = self.ss_model.init(jax.random.PRNGKey(0))
        if cfg["second_stage"].get("ckpt"):
            ss_params = CheckpointStore(
                cfg["second_stage"]["ckpt"]).restore_best(
                {"params": ss_params}, weights=True)["params"]
        self.ss_params = ss_params

        arch = cfg["architecture"]
        s = cfg["data"]["spatial_size"][0]
        self.flow_vae = ConvFlowVAE(
            spatial_size=s,
            bottleneck_channels=arch.get("flow_vae_channels", 8),
            nf_max=arch.get("flow_vae_nf_max", 64),
            min_spatial_size=self.ss_model.min_spatial_size)
        fv_sec = cfg.get("flow_vae", {})
        v = self.flow_vae.init(
            {"params": jax.random.PRNGKey(1)}, jnp.zeros((1, s, s, 2)),
            rng=jax.random.PRNGKey(2))
        fv_state = {"params": v["params"],
                    "stats": v.get("batch_stats", {})}
        if fv_sec.get("ckpt"):
            fv_state = CheckpointStore(fv_sec["ckpt"]).restore_best(
                fv_state, weights=True)
        frozen["flow_vae"] = FrozenBundle(fv_state["params"],
                                          fv_state["stats"])
        self.frozen = frozen

        self.model = FlowMotionModel(cfg, self.ss_model, self.flow_vae)
        tcfg = cfg["training"]
        sched = warmup_linear_decay(
            float(tcfg.get("lr", 1e-3)),
            int(tcfg.get("lr_scaling_max_it", 500)),
            self.n_epochs * self.max_batches)
        state = create_third_stage_state(
            self.next_rng(), self.model, flow_adam(sched),
            weight_recon=float(tcfg.get("weight_recon", 1.0)))
        self.tx = self.accumulate(flow_adam(sched, params=state.params))
        self.state = state.replace(opt=self.tx.init(state.params))
        self._step = jax.jit(make_flow_motion_train_step(
            self.model, self.ss_params, self.tx))

    def train_step(self, batch, epoch):
        from ..models.third_stage import double_recon_weight_schedule

        if self.config["training"].get("recon_scaling", False):
            self.state = double_recon_weight_schedule(
                self.state, epoch,
                float(self.config["training"].get("weight_recon", 1.0)))
        return self._step(self.state, self.frozen, batch, self.next_rng())

    def export_weights(self, state):
        return {"params": state.params}

    def validate(self, epoch):
        from ..eval import angular_error, endpoint_error

        sample = jax.jit(lambda p, f, b, r:
                         self.model.forward_sample_flow(p, f, b, r))
        ees, aes = [], []
        for batch in self.datamodule.val_loader(
                epoch=epoch, n_batches=self.max_val_batches):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            flow_hat = sample(self.state.params, self.frozen, batch,
                              self.next_rng())
            ees.append(float(jnp.mean(endpoint_error(batch["flow"],
                                                     flow_hat))))
            aes.append(float(jnp.mean(angular_error(batch["flow"],
                                                    flow_hat))))
        return {"EE-val": float(np.mean(ees)), "AE-val": float(np.mean(aes))}
