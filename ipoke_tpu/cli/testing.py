"""``--test`` mode fan-out (reference ``experiments/second_stage_video.py:71-200``
+ ``models/second_stage_video.py`` test_step modes).

Modes: samples (mp4 grids + npy dumps), fvd (real/fake dumps + Fréchet),
diversity (pairwise sample distance), accuracy (per-sample SSIM/PSNR/LPIPS),
transfer (kinematics transfer via residual swap), control_sensitivity
(re-poking the same pixel with rotated directions).  Artifacts land in
``<generated>/<mode>/`` like the reference.
"""

from __future__ import annotations

import json
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def _out_dir(experiment, mode: str) -> str:
    d = os.path.join(experiment.dirs["generated"], mode)
    os.makedirs(d, exist_ok=True)
    return d


def _restore_trained(experiment):
    experiment.build()
    assert hasattr(experiment, "frozen") and hasattr(
        experiment.model, "forward_sample"), (
        f"--test modes drive the sampling pipeline; experiment "
        f"{type(experiment).__name__} has no frozen-submodel sampler "
        f"(run them on second_stage/second_stage_fc runs)"
    )
    name = "last" if experiment.config.get_path("general.last_ckpt") else None
    if name:
        experiment.state = experiment.store.restore(experiment.state, name)
    else:
        experiment.state = experiment.store.restore_best(experiment.state)


def _sample_fn(experiment):
    T = experiment.config["data"]["max_frames"]
    model = experiment.model
    return jax.jit(lambda p, f, b, r: model.forward_sample(p, f, b, r,
                                                           length=T))


def _collect(experiment, n_batches: int, fn):
    out = []
    for batch in experiment.datamodule.test_loader(n_batches=n_batches):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        out.append(fn(batch))
    return out


def test_samples(experiment) -> Dict[str, float]:
    from ..utils.video import make_flow_video_grid, save_enrollment

    _restore_trained(experiment)
    tcfg = experiment.config.get("testing", {})
    n_batches = 1 if experiment.debug else max(
        1, int(tcfg.get("n_samples_vis", 20))
        // experiment.datamodule.config.get("test_batch_size", 4))
    d = _out_dir(experiment, "samples")
    sample = _sample_fn(experiment)

    def gen(batch):
        vids = []
        for s in range(int(tcfg.get("n_samples_per_data_point", 3))):
            vid = sample(experiment.state.params, experiment.frozen, batch,
                         experiment.next_rng())
            vids.append(np.asarray(vid))
        return (np.asarray(batch["images"]), np.stack(vids, axis=1),
                np.asarray(batch.get("poke")), np.asarray(batch.get("flow")))

    bi = 0
    for bi, (real, samples, poke, flow) in enumerate(
            _collect(experiment, n_batches, gen)):
        np.save(os.path.join(d, f"samples_batch{bi}.npy"), samples)
        np.save(os.path.join(d, f"real_batch{bi}.npy"), real)
        # poke-annotated animated grid + per-sample enrollment strips
        # (reference _generate_samples, second_stage_video.py:906-957)
        make_flow_video_grid(
            real[:, 0], poke, list(samples.swapaxes(0, 1)), real[:, 1:],
            flow, os.path.join(d, f"grid_batch{bi}.mp4"), fps=3)
        for i in range(min(4, samples.shape[0])):
            save_enrollment(
                samples[i, 0],
                os.path.join(d, f"enrollment_b{bi}_s{i}.png"))
    return {"n_batches": float(bi + 1)}


def test_fvd(experiment) -> Dict[str, float]:
    from ..eval import compute_fvd, init_i3d_params

    _restore_trained(experiment)
    tcfg = experiment.config.get("testing", {})
    bs = experiment.datamodule.config.get("test_batch_size",
                                          experiment.datamodule.batch_size)
    n_batches = 2 if experiment.debug else max(
        1, int(tcfg.get("n_samples_fvd", 1000)) // bs)
    sample = _sample_fn(experiment)

    def gen(batch):
        vid = sample(experiment.state.params, experiment.frozen, batch,
                     experiment.next_rng())
        return (np.asarray(batch["images"][:, 1:]), np.asarray(vid))

    pairs = _collect(experiment, n_batches, gen)
    real = np.concatenate([p[0] for p in pairs])
    fake = np.concatenate([p[1] for p in pairs])
    d = _out_dir(experiment, "fvd")
    np.save(os.path.join(d, "real_samples.npy"),
            ((real + 1) * 127.5).astype(np.uint8))
    np.save(os.path.join(d, "fake_samples.npy"),
            ((fake + 1) * 127.5).astype(np.uint8))
    s = experiment.config["data"]["spatial_size"][0]
    i3d = init_i3d_params(0, spatial=s,
                          frames=experiment.config["data"]["max_frames"])
    fvd = compute_fvd(i3d, real, fake, batch_size=min(8, real.shape[0]))
    result = {"FVD": float(fvd), "n_samples": float(real.shape[0])}
    with open(os.path.join(d, "fvd.json"), "w") as f:
        json.dump(result, f)
    return result


def test_accuracy(experiment) -> Dict[str, float]:
    from ..eval.metrics import perceptual_distance, psnr, ssim
    from ..nn.vgg import init_vgg_params

    _restore_trained(experiment)
    vgg = init_vgg_params(0)
    tcfg = experiment.config.get("testing", {})
    n_spp = int(tcfg.get("n_samples_per_data_point", 5))
    n_batches = 2 if experiment.debug else 10
    sample = _sample_fn(experiment)
    best_ssim, best_lpips, best_psnr = [], [], []
    pf_ssim, pf_psnr, pf_lpips = [], [], []
    for batch in experiment.datamodule.test_loader(n_batches=n_batches):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        tgt = batch["images"][:, 1:]
        a = tgt.reshape(-1, *tgt.shape[2:])
        per_sample = {"ssim": [], "lpips": [], "psnr": []}
        for s in range(n_spp):
            vid = sample(experiment.state.params, experiment.frozen, batch,
                         experiment.next_rng())
            b = vid.reshape(-1, *vid.shape[2:])
            B, T = tgt.shape[0], tgt.shape[1]
            per_sample["ssim"].append(
                np.asarray(ssim(a, b)).reshape(B, T).mean(-1))
            per_sample["psnr"].append(
                np.asarray(psnr(a, b)).reshape(B, T).mean(-1))
            pf = np.asarray(perceptual_distance(vgg, a, b)).reshape(B, T)
            per_sample["lpips"].append(pf.mean(-1))
            if s == 0:
                pf_lpips.extend(pf)
                pf_ssim.extend(np.asarray(ssim(a, b)).reshape(B, T))
                pf_psnr.extend(np.asarray(psnr(a, b)).reshape(B, T))
        best_ssim.append(np.max(per_sample["ssim"], axis=0))
        best_psnr.append(np.max(per_sample["psnr"], axis=0))
        best_lpips.append(np.min(per_sample["lpips"], axis=0))
    result = {
        "ssim_best_of_n": float(np.mean(np.concatenate(best_ssim))),
        "psnr_best_of_n": float(np.mean(np.concatenate(best_psnr))),
        "lpips_best_of_n": float(np.mean(np.concatenate(best_lpips))),
    }
    d = _out_dir(experiment, "accuracy")
    with open(os.path.join(d, "metrics.json"), "w") as f:
        json.dump(result, f)
    # per-frame errorbar plot + csv (reference metric dumps)
    from ..utils.latent_viz import plot_metric_errorbars

    plot_metric_errorbars(
        {"ssim": np.stack(pf_ssim), "psnr": np.stack(pf_psnr),
         "lpips": np.stack(pf_lpips)},
        os.path.join(d, "per_frame_metrics.png"),
        csv_path=os.path.join(d, "per_frame_metrics.csv"))
    return result


def test_diversity(experiment) -> Dict[str, float]:
    from ..eval.metrics import diversity_score_mse, diversity_score_vgg
    from ..nn.vgg import init_vgg_params

    _restore_trained(experiment)
    tcfg = experiment.config.get("testing", {})
    n_spp = int(tcfg.get("n_samples_per_data_point", 5))
    n_batches = 1 if experiment.debug else 5
    sample = _sample_fn(experiment)

    def gen(batch):
        return np.stack([
            np.asarray(sample(experiment.state.params, experiment.frozen,
                              batch, experiment.next_rng()))
            for _ in range(n_spp)
        ], axis=1)

    samples = np.concatenate(_collect(experiment, n_batches, gen))
    result = {
        "divscore_mse": diversity_score_mse(samples),
        "divscore_vgg": diversity_score_vgg(init_vgg_params(0), samples),
    }
    d = _out_dir(experiment, "diversity")
    with open(os.path.join(d, "metrics.json"), "w") as f:
        json.dump(result, f)
    return result


def test_control_sensitivity(experiment) -> Dict[str, float]:
    """Re-poke the same location with rotated directions; measure how the
    motion at the poke location tracks the poke direction
    (reference ``_control_sensitivity``, second_stage_video.py:797-902)."""
    _restore_trained(experiment)
    n_dirs = 4 if experiment.debug else int(
        experiment.config.get("testing", {}).get(
            "n_control_sensitivity_pokes", 8))
    sample = _sample_fn(experiment)
    sims = []
    for batch in experiment.datamodule.test_loader(n_batches=1):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        poke = np.asarray(batch["poke"])
        mag = np.linalg.norm(poke, axis=-1)
        flat = mag.reshape(mag.shape[0], -1).argmax(-1)
        ys, xs = np.unravel_index(flat, mag.shape[1:])
        amp = mag.reshape(mag.shape[0], -1).max(-1)
        for k in range(n_dirs):
            ang = 2 * np.pi * k / n_dirs
            d_vec = np.stack([np.cos(ang) * amp, np.sin(ang) * amp], -1)
            new_poke = np.zeros_like(poke)
            for b in range(poke.shape[0]):
                y, x = ys[b], xs[b]
                new_poke[b, max(0, y - 2) : y + 3, max(0, x - 2) : x + 3] = (
                    d_vec[b])
            nb = dict(batch)
            nb["poke"] = jnp.asarray(new_poke)
            vid = np.asarray(sample(experiment.state.params,
                                    experiment.frozen, nb,
                                    experiment.next_rng()))
            # displacement proxy: difference around the poke across time
            for b in range(vid.shape[0]):
                y, x = int(ys[b]), int(xs[b])
                patch0 = np.asarray(batch["images"])[b, 0,
                                                     max(0, y - 4) : y + 5,
                                                     max(0, x - 4) : x + 5]
                patchT = vid[b, -1, max(0, y - 4) : y + 5,
                             max(0, x - 4) : x + 5]
                sims.append(float(np.mean(np.abs(patchT - patch0))))
    result = {"poke_region_response": float(np.mean(sims))}
    d = _out_dir(experiment, "control_sensitivity")
    with open(os.path.join(d, "metrics.json"), "w") as f:
        json.dump(result, f)
    return result


def test_transfer(experiment) -> Dict[str, float]:
    """Kinematics transfer: encode video A to its residual z, decode it under
    video B's conditioning (reference ``_test_transfer``,
    second_stage_video.py:959-1045)."""
    _restore_trained(experiment)
    model = experiment.model
    T = experiment.config["data"]["max_frames"]

    @jax.jit
    def transfer(params, frozen, batch_a, batch_b, rng):
        z, _ = model.forward_density(params, frozen, batch_a, rng)
        cond_b = model.embed_conditioning(frozen, batch_b, params)
        motion = model.flow.inverse(params["flow"], z, cond_b)
        if model.augment_input:
            motion = motion[..., : model.first_stage.z_dim]
        return model.decode_first_stage(frozen, motion,
                                        batch_b["images"][:, 0], T)

    d = _out_dir(experiment, "transfer")
    loader = experiment.datamodule.test_loader(n_batches=2)
    batches = [
        {k: jnp.asarray(v) for k, v in b.items()} for b in loader
    ]
    if len(batches) < 2:
        batches = batches * 2
    vid = np.asarray(transfer(experiment.state.params, experiment.frozen,
                              batches[0], batches[1],
                              experiment.next_rng()))
    np.save(os.path.join(d, "transfer_batch0.npy"), vid)
    from ..utils.video import make_transfer_grid

    make_transfer_grid(
        np.asarray(batches[0]["images"][:, 1:]),
        np.asarray(batches[1]["images"][:, 0]), vid,
        os.path.join(d, "transfer_grid.mp4"))
    return {"n_transferred": float(vid.shape[0])}


def test_kps_acc(experiment) -> Dict[str, float]:
    """Targeted keypoint error with keypoint pokes: poke a keypoint with its
    true displacement, estimate keypoints on the generated video, compare to
    the target trajectory (reference ``_test_step_kps_acc``,
    second_stage_video.py:772-794).  Needs keypoint metadata (pose prep) —
    falls back to the standard poke key when absent."""
    from ..eval.pose import PoseEstimator, keypoint_mse

    _restore_trained(experiment)
    est = PoseEstimator(
        input_size=experiment.config["data"]["spatial_size"][0])
    sample = _sample_fn(experiment)
    dset = experiment.datamodule.dset_test
    has_kp = getattr(dset, "keypoints", None) is not None
    if has_kp and "keypoint_poke" not in dset.datakeys:
        dset.datakeys.append("keypoint_poke")
        dset.datakeys.append("keypoints_abs")
    n_batches = 2 if experiment.debug else 10
    errs = []
    for batch in experiment.datamodule.test_loader(n_batches=n_batches):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if has_kp:
            batch = dict(batch)
            batch["poke"] = batch["keypoint_poke"]
        vid = sample(experiment.state.params, experiment.frozen, batch,
                     experiment.next_rng())
        kps_fake = est(np.asarray(vid[:, -1]))
        if has_kp:
            kps_real = np.asarray(batch["keypoints_abs"][:, -1])
        else:
            kps_real = est(np.asarray(batch["images"][:, -1]))
        errs.append(keypoint_mse(kps_fake, kps_real,
                                 norm=vid.shape[2]))
    result = {"kps_mse": float(np.mean(np.concatenate(errs))),
              "annotated_keypoints": float(has_kp)}
    d = _out_dir(experiment, "kps_acc")
    with open(os.path.join(d, "metrics.json"), "w") as f:
        json.dump(result, f)
    return result


_MODES = {
    "samples": test_samples,
    "fvd": test_fvd,
    "accuracy": test_accuracy,
    "diversity": test_diversity,
    "control_sensitivity": test_control_sensitivity,
    "transfer": test_transfer,
    "kps_acc": test_kps_acc,
}


def run_test(experiment, mode: str) -> Dict[str, float]:
    assert mode in _MODES, f"unknown test mode {mode!r} ({sorted(_MODES)})"
    result = _MODES[mode](experiment)
    experiment.logger.info(f"--test {mode}: {result}")
    return result
