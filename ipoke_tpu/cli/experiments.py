"""Experiment orchestration (reference ``experiments/`` L4).

``Experiment`` owns seeds, versioned run dirs, metric logging, the train/val
loop, and metric-gated checkpointing (reference ``experiments/experiment.py``)
— rebuilt without Lightning: the loop is explicit, train steps are jitted pure
functions, and the datamodule feeds host numpy batches.

Registry names match the reference (``experiments/__init__.py:14-24``):
img_encoder, poke_encoder, first_stage, second_stage (+ FC stack variants in
``ipoke_tpu.models.fc_stack``).
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.checkpoint import CheckpointStore, latest_version, next_version
from ..core.config import Config, load_config
from ..core.optim import (
    exp_decay_per_epoch,
    flow_adam,
    gan_adam,
    warmup_linear_decay,
)
from ..data.datamodule import StaticDataModule


def get_logger(name="ipoke_tpu"):
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter("[%(asctime)s %(levelname)s] %(message)s"))
        logger.addHandler(h)
        logger.setLevel(logging.INFO)
    return logger


class MetricsLogger:
    """JSONL metrics sink (the wandb replacement; wandb hooks in if present)."""

    def __init__(self, log_dir: str, use_wandb: bool = False, config=None):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self.wandb = None
        if use_wandb:
            try:
                import wandb

                self.wandb = wandb.init(
                    project="ipoke_tpu", config=config, dir=log_dir
                )
            except Exception:
                self.wandb = None

    def log(self, metrics: Dict[str, Any], step: int):
        rec = {"step": int(step)}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                continue
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self.wandb is not None:
            self.wandb.log(rec, step=step)

    def close(self):
        if self._f is not None:
            self._f.close()
            self._f = None
        if self.wandb is not None:
            try:
                self.wandb.finish()
            except Exception:
                pass
            self.wandb = None


class Experiment:
    monitor = "loss"
    monitor_mode = "min"
    datakeys = ["images"]

    def __init__(self, config: Config, dirs: Dict[str, str],
                 devices: Optional[list] = None,
                 data_root: Optional[str] = None, meta=None):
        self.config = config
        self.dirs = dirs
        self.logger = get_logger()
        gen = config.get("general", {})
        self.debug = bool(gen.get("debug", False))
        self.seed = int(gen.get("seed", 42))
        np.random.seed(self.seed)
        self.rng = jax.random.PRNGKey(self.seed)

        # versioned run dir (reference experiment.py:50-60); test mode and
        # resume attach to an existing version (--target_version pins one)
        resume = bool(gen.get("resume", False))
        test_mode = gen.get("test", "none") not in (None, "none")
        if gen.get("target_version") is not None:
            self.version = int(gen["target_version"])
        elif resume or test_mode:
            v = latest_version(dirs["ckpt"])
            assert v is not None, "no existing run version to attach to"
            self.version = v
        else:
            self.version = next_version(dirs["ckpt"])
        self.version_dir = os.path.join(dirs["ckpt"], str(self.version))
        self.store = CheckpointStore(
            self.version_dir, monitor=self.monitor,
            save_top_k=config.get_path("logging.n_saved_ckpt", 3),
            mode=self.monitor_mode,
        )
        self.metrics_logger = MetricsLogger(
            os.path.join(dirs["log"], str(self.version)),
            use_wandb=not self.debug and bool(gen.get("wandb", False)),
            config=config.to_dict() if hasattr(config, "to_dict") else None,
        )
        config.save(os.path.join(dirs["config"], f"{self.version}.yaml"))

        tcfg = config["training"]
        self.n_epochs = 2 if self.debug else int(tcfg.get("n_epochs", 100))
        self.max_batches = 10 if self.debug else int(
            tcfg.get("max_batches_per_epoch", 10**9)
        )
        self.max_val_batches = 2 if self.debug else int(
            tcfg.get("max_val_batches", 100)
        )
        dcfg = dict(config["data"])
        if self.debug:
            dcfg["batch_size"] = min(int(dcfg.get("batch_size", 2)), 2)
            dcfg["n_workers"] = 2
        self.datamodule = StaticDataModule(
            dcfg, self.datakeys, data_root=data_root, meta=meta
        )
        self.batch_size = int(dcfg.get("batch_size", 2))
        self.resume = resume

    def accumulate(self, tx):
        """Gradient accumulation to reach ``training.min_acc_batch_size``
        (reference experiments/experiment.py:81-82)."""
        from ..core.optim import with_grad_accumulation

        tx, k = with_grad_accumulation(tx, self.config, self.batch_size)
        if k > 1:
            self.logger.info(f"gradient accumulation: {k} microbatches/update")
        return tx

    # -- subclass API ------------------------------------------------------
    def build(self):
        """Set self.state, self.step_fn; return initialized state."""
        raise NotImplementedError

    def validate(self, epoch: int) -> Dict[str, float]:
        raise NotImplementedError

    def next_rng(self):
        self.rng, k = jax.random.split(self.rng)
        return k

    # -- loops ---------------------------------------------------------------
    def check_finite(self, metrics, epoch: int, step: int):
        """NaN/divergence guard (reference ``terminate_on_nan``,
        experiments/first_stage_video.py:45): abort cleanly instead of burning
        the epoch budget on a diverged run."""
        for k, v in metrics.items():
            try:
                fv = float(v)
            except (TypeError, ValueError):
                continue
            if not np.isfinite(fv):
                raise FloatingPointError(
                    f"non-finite train metric {k}={fv} at epoch {epoch} "
                    f"step {step}; aborting (terminate_on_nan)"
                )

    def _resume_template(self, state):
        """Abstract tree used to restore a checkpoint on resume; subclasses
        whose TRAINED state dtypes differ from the freshly-built ones (e.g.
        bf16-resident params under mixed_prec_master) override this."""
        return state

    def train(self):
        try:
            return self._train_loop()
        finally:
            self.metrics_logger.close()

    def _train_loop(self):
        self.build()
        if self.resume:
            # _resume_template aligns the abstract tree's dtypes with what a
            # trained checkpoint actually holds (e.g. bf16-resident params
            # under mixed_prec_master) — orbax restores INTO the template's
            # dtypes, so a mismatched template silently upcasts
            self.state = self.store.restore(
                self._resume_template(self.state), "last")
            self.logger.info(f"resumed from {self.version_dir}/last")
        profile = bool(self.config.get_path("general.profiler", False))
        profile_dir = os.path.join(self.dirs["log"], str(self.version),
                                   "profile")
        t_start = time.time()
        step = 0
        step_time_ema = None
        for epoch in range(self.n_epochs):
            loader = self.datamodule.train_loader(
                epoch=epoch, n_batches=self.max_batches
            )
            for batch in loader:
                # jax.profiler trace of steps 10..14 of the first epoch
                # (replaces PL AdvancedProfiler, reference experiment.py:84-85)
                if profile and epoch == 0 and step == 10:
                    jax.profiler.start_trace(profile_dir)
                t0 = time.time()
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
                self.state, metrics = self.train_step(batch, epoch)
                for leaf in jax.tree_util.tree_leaves(metrics):
                    if hasattr(leaf, "block_until_ready"):
                        leaf.block_until_ready()
                        break
                dt = time.time() - t0
                step_time_ema = dt if step_time_ema is None else (
                    0.9 * step_time_ema + 0.1 * dt)
                if profile and epoch == 0 and step == 14:
                    jax.profiler.stop_trace()
                    self.logger.info(f"profile trace in {profile_dir}")
                step += 1
                # every 10th step: scalar host pulls are not free over the
                # remote-TPU tunnel, and a diverged run is still caught fast
                if step % 10 == 1:
                    self.check_finite(metrics, epoch, step)
                if step % 50 == 1:
                    metrics = dict(metrics)
                    metrics["step_time_s"] = step_time_ema
                    self.metrics_logger.log(
                        {f"train/{k}": v for k, v in metrics.items()}, step
                    )
                    self.logger.info(
                        f"epoch {epoch} step {step}: " + ", ".join(
                            f"{k}={float(v):.4f}" for k, v in list(
                                metrics.items())[:6]
                        )
                    )
            val_metrics = self.validate(epoch)
            self.metrics_logger.log(
                {f"val/{k}": v for k, v in val_metrics.items()}, step
            )
            monitor_val = val_metrics.get(self.monitor)
            self.store.save(self.state, step=step, metric=monitor_val,
                            weights=self.export_weights(self.state))
            self.logger.info(
                f"epoch {epoch} done ({time.time() - t_start:.0f}s): "
                + ", ".join(f"{k}={v:.4f}" for k, v in val_metrics.items())
            )
        return self.state

    def train_step(self, batch, epoch: int):
        raise NotImplementedError

    def export_weights(self, state):
        """Lightweight model-only tree for cross-stage loading."""
        return None


class FirstStageExperiment(Experiment):
    """Video VAE-GAN (reference experiments/first_stage_video.py)."""

    monitor = "FVD-val"
    datakeys = ["images", "poke", "flow"]

    def build(self):
        from ..models.first_stage import (
            build_first_stage,
            create_first_stage_state,
            make_first_stage_train_step,
        )
        from ..nn.vgg import init_vgg_params

        cfg = self.config
        tcfg = cfg["training"]
        self.model, self.disc_s, self.disc_t = build_first_stage(cfg)
        lr = float(tcfg.get("lr", 2e-4))
        wd = float(tcfg.get("weight_decay", 1e-5))
        sched = exp_decay_per_epoch(lr, float(tcfg.get("gamma", 0.98)),
                                    self.max_batches)
        self.tx = self.accumulate(gan_adam(sched, wd))
        self.vgg_params = init_vgg_params(0)
        self.state = create_first_stage_state(
            self.next_rng(), cfg, self.model, self.disc_s, self.disc_t,
            self.tx, self.tx, self.tx,
        )
        self._step = jax.jit(make_first_stage_train_step(
            cfg, self.model, self.disc_s, self.disc_t, self.vgg_params,
            self.tx, self.tx, self.tx,
        ))
        self.pretrain = int(cfg.get("d_t", {}).get("pretrain", 0))

    def train_step(self, batch, epoch):
        gate = 1.0 if epoch >= self.pretrain else 0.0
        # KL annealing: linear ramp over `kl_annealing` epochs (reference
        # poke_vae.py:107-114)
        anneal = float(self.config["training"].get("kl_annealing", 0))
        kl_gate = min(1.0, (epoch + 1) / anneal) if anneal > 0 else 1.0
        return self._step(self.state, batch, self.next_rng(), gate, kl_gate)

    def export_weights(self, state):
        return {"params": state.params_g, "stats": state.stats_g}

    def validate(self, epoch):
        from ..eval import compute_fvd, init_fvd_backbone, psnr, ssim
        from ..eval.metrics import perceptual_distance

        if not hasattr(self, "_i3d"):
            s = self.config["data"]["spatial_size"][0]
            self._i3d = init_fvd_backbone(
                0, spatial=s, frames=self.config["data"]["max_frames"]
            )
        apply = jax.jit(lambda p, st, X, r: self.model.apply(
            {"params": p, "batch_stats": st}, X, rng=r, train=False,
        ))
        ssims, psnrs, lpips_vals, reals, fakes = [], [], [], [], []
        for batch in self.datamodule.val_loader(
            epoch=epoch, n_batches=self.max_val_batches
        ):
            X = jnp.asarray(batch["images"])
            X_hat, *_ = apply(self.state.params_g, self.state.stats_g, X,
                              self.next_rng())
            a = X[:, 1:].reshape(-1, *X.shape[2:])
            b = X_hat.reshape(-1, *X_hat.shape[2:])
            ssims.append(np.asarray(ssim(a, b)))
            psnrs.append(np.asarray(psnr(a, b)))
            lpips_vals.append(
                np.asarray(perceptual_distance(self.vgg_params, a, b))
            )
            reals.append(np.asarray(X[:, 1:]))
            fakes.append(np.asarray(X_hat))
        fvd = compute_fvd(
            self._i3d, np.concatenate(reals), np.concatenate(fakes),
            batch_size=min(8, len(reals) * reals[0].shape[0]),
        )
        return {
            "FVD-val": float(fvd),
            "ssim-val": float(np.mean(np.concatenate(ssims))),
            "psnr-val": float(np.mean(np.concatenate(psnrs))),
            "lpips-val": float(np.mean(np.concatenate(lpips_vals))),
        }


class _AEExperiment(Experiment):
    """Shared conditioner/poke-embedder trainer."""

    monitor = "lpips-val"
    use_disc = True

    def build(self):
        from ..models.image_ae import (
            build_image_ae,
            create_image_ae_state,
            make_image_ae_train_step,
        )
        from ..nn import PatchDiscriminator2D
        from ..nn.vgg import init_vgg_params

        cfg = self.config
        self.model = build_image_ae(cfg)
        self.disc = PatchDiscriminator2D(
            ndf=cfg.get("disc", {}).get("ndf", 64),
            n_layers=cfg.get("disc", {}).get("n_layers", 3),
        )
        self.vgg_params = init_vgg_params(0)
        lr = float(cfg["training"].get("lr", 2e-4))
        self.tx = self.accumulate(
            gan_adam(lr, float(cfg["training"].get("weight_decay", 1e-5))))
        self.state = create_image_ae_state(
            self.next_rng(), cfg, self.model, self.disc, self.tx, self.tx,
            use_disc=self.use_disc,
        )
        self._step = jax.jit(make_image_ae_train_step(
            cfg, self.model, self.disc, self.vgg_params, self.tx, self.tx,
            use_disc=self.use_disc,
        ))
        self.disc_start = int(cfg.get("disc", {}).get("start", 0))

    def train_step(self, batch, epoch):
        gate = 1.0 if (self.use_disc and epoch >= self.disc_start) else 0.0
        return self._step(self.state, batch, self.next_rng(), gate)

    def export_weights(self, state):
        return {"params": state.params["ae"], "stats": state.stats}

    def _io_keys(self):
        return (self.config.get("input_key", "images"),
                self.config.get("target_key", "images"))

    # FID between real and reconstructed images during validation — the
    # reference computes it for the image AE only (first_stage_image_conv.py
    # :223-256, `n_it_fid` batches through FIDInceptionModel)
    fid_val = False

    def validate(self, epoch):
        from ..eval.metrics import perceptual_distance, psnr, ssim
        from ..models.image_ae import _pad3

        in_key, tgt_key = self._io_keys()
        apply = jax.jit(lambda p, st, x, r: self.model.apply(
            {"params": p, "batch_stats": st}, x, rng=r, train=False,
        ))
        lp, ss, ps, reals, recs = [], [], [], [], []
        for batch in self.datamodule.val_loader(
            epoch=epoch, n_batches=self.max_val_batches
        ):
            x = jnp.asarray(batch[in_key])
            if in_key == "images" and x.ndim == 5:
                x = x[:, -1]
            tgt = jnp.asarray(batch[tgt_key])
            if tgt_key == "images" and tgt.ndim == 5:
                tgt = tgt[:, -1]
            rec = apply(self.state.params["ae"], self.state.stats, x,
                        self.next_rng())
            a, b = (tgt, rec) if tgt.shape[-1] == 3 else (_pad3(tgt), _pad3(rec))
            lp.append(np.asarray(perceptual_distance(self.vgg_params, a, b)))
            ss.append(np.asarray(ssim(a, b)))
            ps.append(np.asarray(psnr(a, b)))
            if self.fid_val:
                reals.append(np.asarray(a))
                recs.append(np.asarray(b))
        out = {
            "lpips-val": float(np.mean(np.concatenate(lp))),
            "ssim-val": float(np.mean(np.concatenate(ss))),
            "psnr-val": float(np.mean(np.concatenate(ps))),
        }
        if self.fid_val:
            from ..eval.metrics import compute_fid

            real = np.concatenate(reals)
            out["fid-val"] = float(compute_fid(
                self.vgg_params, real, np.concatenate(recs),
                batch_size=min(32, real.shape[0])))
        return out


class ImgEncoderExperiment(_AEExperiment):
    datakeys = ["images"]
    fid_val = True


class PokeEncoderExperiment(_AEExperiment):
    datakeys = ["images", "poke", "flow"]
    use_disc = False

    def __init__(self, config, dirs, **kw):
        config["input_key"] = "flow" if config.get_path(
            "architecture.flow_ae", False) else "poke"
        config["target_key"] = "flow"
        super().__init__(config, dirs, **kw)


class SecondStageExperiment(Experiment):
    """cINN over frozen stage-1 + encoders (reference
    experiments/second_stage_video.py)."""

    monitor = "FVD-val"
    datakeys = ["images", "poke", "flow"]
    # class-level default so partially-constructed shells (tests) and
    # subclasses that override build() keep fp32 semantics
    _mixed = False

    def _load_frozen(self, data_root=None, meta=None):
        """Build + restore the three frozen submodels from their run dirs
        (config keys: first_stage/conditioner/poke_embedder .config/.ckpt)."""
        from ..models.first_stage import build_first_stage
        from ..models.second_stage import FrozenBundle
        from ..models.image_ae import build_image_ae
        from ..nn.encoders import FirstStageWrapper

        from ..models.pretrained_registry import resolve

        def load_one(section, builder, init_fn):
            sec = resolve(section, dict(self.config[section]))
            sub_cfg = load_config(sec["config"]) if isinstance(
                sec.get("config"), str) else Config(sec["config"])
            model = builder(sub_cfg)
            variables = init_fn(model, sub_cfg)
            state = {"params": variables["params"],
                     "stats": variables.get("batch_stats", {})}
            if sec.get("ckpt"):
                store = CheckpointStore(sec["ckpt"])
                state = store.restore_best(state, weights=True)
            return model, FrozenBundle(state["params"], state["stats"])

        K = jax.random.PRNGKey
        s = self.config["data"]["spatial_size"][0]
        T = self.config["data"]["max_frames"]

        def init_fs(model, cfg):
            X = jnp.zeros((1, T + 1, s, s, 3))
            return model.init({"params": K(0)}, X, rng=K(1), train=False)

        def init_ae(nf_in):
            def f(model, cfg):
                return model.init({"params": K(0)},
                                  jnp.zeros((1, s, s, nf_in)), train=False)
            return f

        fs_model, fs_bundle = load_one(
            "first_stage", lambda c: build_first_stage(c)[0], init_fs)
        cond_model, cond_bundle = (None, None)
        if self.config.get_path("conditioner.use", True):
            cond_model, cond_bundle = load_one(
                "conditioner", build_image_ae, init_ae(3))
        poke_model, poke_bundle = load_one(
            "poke_embedder", build_image_ae, init_ae(2))
        frozen = {"fs": fs_bundle, "poke": poke_bundle}
        if cond_bundle is not None:
            frozen["cond"] = cond_bundle
        return fs_model, cond_model, poke_model, frozen

    def export_weights(self, state):
        return {"params": state.params}

    def build(self):
        from ..models.second_stage import (
            SecondStageModel,
            create_second_stage_state,
            make_second_stage_train_step,
        )

        cfg = self.config
        fs_model, cond_model, poke_model, self.frozen = self._load_frozen()
        self.model = SecondStageModel(cfg, fs_model, cond_model, poke_model)
        tcfg = cfg["training"]
        lr = float(tcfg.get("lr", 1e-3))
        total = self.n_epochs * self.max_batches if tcfg.get(
            "custom_lr_decrease", True) else 10**9
        sched = warmup_linear_decay(
            lr, int(tcfg.get("lr_scaling_max_it", 500)), total)
        state = create_second_stage_state(self.next_rng(), self.model,
                                          flow_adam(sched))
        self._ddi_done = False
        self._mixed = bool(tcfg.get("mixed_prec_master", False))
        tx = flow_adam(
            sched, params=state.params,
            clip_grad_norm=float(tcfg.get("clip_grad_norm", 0)),
            use_adabelief=bool(tcfg.get("use_adabelief", False)),
            use_adafactor=bool(tcfg.get("use_adafactor", False)))
        if self._mixed:
            # bf16-resident params/frozen nets + fp32 master copies in the
            # optimizer (core/optim.master_weights); the bf16 cast itself
            # happens after DDI (train_step), which must run in fp32
            from ..core.optim import cast_floats, master_weights

            tx = master_weights(tx)
            self.frozen = cast_floats(self.frozen, jnp.bfloat16)
        self.tx = self.accumulate(tx)
        state = state.replace(opt=self.tx.init(state.params))
        self.state = state
        self._step = jax.jit(make_second_stage_train_step(self.model, self.tx))
        if self._mixed and bool(tcfg.get("fused_nice_train", False)):
            # run the coupling nets' density forward through the fused Pallas
            # kernel + custom_vjp backward (ops/nice_net.py); bf16-only,
            # hence gated under mixed_prec_master.  The ops gate is a
            # process-level global consulted at TRACE time, so it is flipped
            # only around each step call (the jit retraces under the right
            # gate, and nothing later in the process inherits it — advisor r4)
            from .. import ops

            jitted = self._step

            def _step_with_fused_gate(*args):
                prev = ops._FORCE_NICE_TRAIN
                ops.set_fused_nice_train(True)
                try:
                    return jitted(*args)
                finally:
                    ops.set_fused_nice_train(prev)

            self._step = _step_with_fused_gate

    def _resume_template(self, state):
        if not self._mixed:
            return state
        # a trained mixed-master checkpoint holds bf16 params with fp32
        # masters inside the opt state; restore into that dtype structure
        # (a fresh fp32 template would make orbax upcast the params and the
        # first step would crash on strict lax-conv dtypes)
        from ..core.optim import cast_floats

        params = cast_floats(state.params, jnp.bfloat16)
        return state.replace(params=params, opt=self.tx.init(params))

    def train_step(self, batch, epoch):
        # DDI only on a genuinely fresh run: re-running it on a restored
        # checkpoint would zero every wn-conv g/b and re-init ActNorms from
        # batch stats, destroying the trained params (a resumed state has
        # step > 0)
        if not self._ddi_done:
            if int(self.state.step) == 0:
                params = self.model.ddi(
                    self.state.params, self.frozen, batch, self.next_rng())
                if self._mixed:
                    # DDI ran in fp32; go bf16-resident now and rebuild the
                    # optimizer state so the fp32 master copies the
                    # POST-ddi values
                    from ..core.optim import cast_floats

                    params = cast_floats(params, jnp.bfloat16)
                    self.state = self.state.replace(
                        params=params, opt=self.tx.init(params))
                else:
                    self.state = self.state.replace(params=params)
            self._ddi_done = True
        if self._mixed:
            # bf16-resident batch to match params/frozen: the measured
            # recipe (tools/measure_train_step.py --mixed-master) casts all
            # three, and the flow's raw lax convs are strict about operand
            # dtypes (an fp32 batch reaches the MCF shifted conv as fp32
            # activations against bf16 weights and fails at trace time)
            from ..core.optim import cast_floats

            batch = cast_floats(batch, jnp.bfloat16)
        return self._step(self.state, self.frozen, batch, self.next_rng())

    def validate(self, epoch):
        from ..eval import compute_fvd, init_fvd_backbone
        from ..flows import flow_loss

        if not hasattr(self, "_i3d"):
            s = self.config["data"]["spatial_size"][0]
            self._i3d = init_fvd_backbone(
                0, spatial=s, frames=self.config["data"]["max_frames"])
        T = self.config["data"]["max_frames"]
        density = jax.jit(lambda p, f, b, r: self.model.forward_density(
            p, f, b, r))
        sample = jax.jit(lambda p, f, b, r: self.model.forward_sample(
            p, f, b, r, length=T))
        nlls, reals, fakes, zs = [], [], [], []
        for batch in self.datamodule.val_loader(
            epoch=epoch, n_batches=self.max_val_batches
        ):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            if self._mixed:  # bf16-resident params need bf16 activations
                from ..core.optim import cast_floats

                batch = cast_floats(batch, jnp.bfloat16)
            z, logdet = density(self.state.params, self.frozen, batch,
                                self.next_rng())
            loss, _ = flow_loss(z, logdet)
            nlls.append(float(loss))
            zs.append(np.asarray(z))
            vid = sample(self.state.params, self.frozen, batch,
                         self.next_rng())
            reals.append(np.asarray(batch["images"][:, 1:]))
            fakes.append(np.asarray(vid))
        fvd = compute_fvd(self._i3d, np.concatenate(reals),
                          np.concatenate(fakes),
                          batch_size=min(8, sum(r.shape[0] for r in reals)))
        # latent diagnostic scatter (reference log_umap every 3 epochs,
        # second_stage_video.py:599-638; PCA here)
        if epoch % 3 == 0:
            from ..utils.latent_viz import plot_latent_scatter

            z_all = np.concatenate(zs)
            ref = np.random.default_rng(epoch).normal(size=z_all.shape)
            out_dir = os.path.join(self.dirs["generated"], "latents")
            os.makedirs(out_dir, exist_ok=True)
            plot_latent_scatter(
                {"flow(z_m)": z_all, "N(0,I)": ref},
                os.path.join(out_dir, f"epoch_{epoch:04d}.png"))
        return {"FVD-val": float(fvd), "flow_loss-val": float(np.mean(nlls))}


def _registry():
    from .fc_experiments import (
        FlowEncoderFCExperiment,
        FlowMotionExperiment,
        FlowVAEExperiment,
        ImgEncoderFCExperiment,
        INNFCAEExperiment,
        PokeEncoderFCExperiment,
        SecondStageFCExperiment,
        ThirdStageFCExperiment,
    )

    return {
        # conv pipeline (reference experiments/__init__.py:14-24)
        "img_encoder": ImgEncoderExperiment,
        "poke_encoder": PokeEncoderExperiment,
        "first_stage": FirstStageExperiment,
        "second_stage": SecondStageExperiment,
        # FC / third-stage fork
        "img_encoder_fc": ImgEncoderFCExperiment,
        "poke_encoder_fc": PokeEncoderFCExperiment,
        "first_stage_fc": FirstStageExperiment,  # arch.baseline selects FC
        "second_stage_fc": SecondStageFCExperiment,
        "flow_encoder_fc": FlowEncoderFCExperiment,
        "third_stage_fc": ThirdStageFCExperiment,
        "flow_motion": FlowMotionExperiment,
        "flow_vae": FlowVAEExperiment,
        "inn_fcae": INNFCAEExperiment,
    }


__experiments__ = None


def select_experiment(config: Config):
    global __experiments__
    if __experiments__ is None:
        __experiments__ = _registry()
    name = config.get_path("general.experiment")
    if name not in __experiments__ and isinstance(name, str):
        # the reference registry mixes key casings — its `poke_encoder_FC`
        # (ref experiments/__init__.py:19) must resolve to our lowercase key
        # so unmodified reference YAMLs load
        lowered = name.lower()
        if lowered in __experiments__:
            name = lowered
    assert name in __experiments__, (
        f"unknown experiment {name!r}; choose from {sorted(__experiments__)}"
    )
    return __experiments__[name]
