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


# Annotated keypoints come from the same COCO-17 PoseResNet layout that pose
# prep writes (eval/pose.py, data/prep.py pose_estimation), so equal joint
# counts mean identical joint semantics.  A count MISMATCH means the layouts
# are incompatible — comparing a truncated common prefix would silently mix
# joint semantics into a plausible-but-wrong MSE, so refuse unless an
# explicit index map is registered here: (n_pred, n_gt) -> (pred_idx, gt_idx).
_JOINT_LAYOUT_MAPS: Dict[tuple, tuple] = {}


def _aligned_joints(kps_pred: np.ndarray, kps_gt: np.ndarray):
    n_p, n_g = kps_pred.shape[1], kps_gt.shape[1]
    if n_p == n_g:
        return kps_pred, kps_gt
    if (n_p, n_g) in _JOINT_LAYOUT_MAPS:
        pi, gi = _JOINT_LAYOUT_MAPS[(n_p, n_g)]
        return kps_pred[:, list(pi)], kps_gt[:, list(gi)]
    raise ValueError(
        f"keypoint layout mismatch: estimator yields {n_p} joints but "
        f"annotations carry {n_g}; register an explicit index map in "
        f"_JOINT_LAYOUT_MAPS instead of truncating to a common prefix")


def _restore_trained(experiment, require_sampler: bool = True):
    """Build + restore the best checkpoint.  ``require_sampler=False`` for
    encoder-style experiments without a frozen-submodel sampling pipeline
    (e.g. FCAE_eval on flow_encoder_fc)."""
    experiment.build()
    if require_sampler:
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
        // experiment.datamodule.config.get(
            "test_batch_size", experiment.datamodule.batch_size))
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
    from ..eval import compute_fvd, init_fvd_backbone

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
    i3d = init_fvd_backbone(0, spatial=s,
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
    # posenet keypoint-MSE component when keypoint annotations exist
    # (reference _test_step_metrics, second_stage_video.py:692-754)
    dset = experiment.datamodule.dset_test
    est = None
    if getattr(dset, "keypoints", None) is not None:
        from ..eval.pose import pose_estimator_from_env

        est = pose_estimator_from_env(
            experiment.config["data"]["spatial_size"][0])
        for k in ("keypoints_rel",):
            if k not in dset.datakeys:
                dset.datakeys.append(k)
    kps_errs = []
    best_ssim, best_lpips, best_psnr = [], [], []
    pf_ssim, pf_psnr, pf_lpips, pf_kps = [], [], [], []
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
                if est is not None and "keypoints_rel" in batch:
                    # same per-axis normalization as the keypoints_rel
                    # datakey (kps / spatial_size), so non-square sizes
                    # compare consistently
                    norm = np.asarray(
                        experiment.config["data"]["spatial_size"],
                        np.float32)
                    kps_pred = est(np.asarray(b)) / norm
                    kps_gt = np.asarray(
                        batch["keypoints_rel"][:, 1:]).reshape(
                        -1, *batch["keypoints_rel"].shape[2:])
                    kp, kg = _aligned_joints(kps_pred, kps_gt)
                    kps_errs.append(np.mean((kp - kg) ** 2))
                    # per-frame kps MSE rows feeding the reference's
                    # errorbar artifact set (second_stage_video_fc.py
                    # :125-133)
                    pf_kps.extend(
                        ((kp - kg) ** 2).mean(axis=(1, 2)).reshape(B, T))
        best_ssim.append(np.max(per_sample["ssim"], axis=0))
        best_psnr.append(np.max(per_sample["psnr"], axis=0))
        best_lpips.append(np.min(per_sample["lpips"], axis=0))
    result = {
        "ssim_best_of_n": float(np.mean(np.concatenate(best_ssim))),
        "psnr_best_of_n": float(np.mean(np.concatenate(best_psnr))),
        "lpips_best_of_n": float(np.mean(np.concatenate(best_lpips))),
    }
    if kps_errs:
        result["kps_mse"] = float(np.mean(kps_errs))
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
    if pf_kps:
        # the reference's keypoint-error artifact set: per-frame dataframe
        # csv + seaborn-style errorbar pdf + per-Time group csv (reference
        # second_stage_video_fc.py:125-133, utils/logging.py:979-1010)
        from ..utils.plots import _as_df, make_errorbar_plot

        kps = np.stack(pf_kps)  # (N, T)
        Tn = kps.shape[1]
        n_pokes = int(experiment.config["data"].get("n_pokes", 1))
        df = _as_df({
            "Time": np.tile(np.arange(Tn), kps.shape[0]),
            "Mean MSE per Frame": kps.reshape(-1),
            "Std per Frame": np.tile(kps.std(axis=0), kps.shape[0]),
            "Number of Pokes": [n_pokes] * kps.size,
        })
        df.to_csv(os.path.join(d, f"plot_data_{n_spp}pokes_kps-"
                                  "aggregated.csv"))
        make_errorbar_plot(
            os.path.join(d, f"keypoint_err_plot_{n_spp}samples-"
                            "aggregated.pdf"),
            df, xid="Time", yid="Mean MSE per Frame",
            hueid="Number of Pokes", varid="Std per Frame")
        df.groupby("Time", as_index=False).mean(numeric_only=True).to_csv(
            os.path.join(d, "plot_data_kps_group.csv"))
    return result


def test_diversity(experiment) -> Dict[str, float]:
    from ..eval.metrics import (
        diversity_score_lpips,
        diversity_score_mse,
        diversity_score_vgg,
    )
    from ..nn.lpips import init_lpips_params, load_torch_lpips_npz
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
    # learned LPIPS variant (reference compute_div_score_lpips); real heads
    # via IPOKE_LPIPS_WEIGHTS (acquisition recipe in nn/lpips.py)
    lp = os.environ.get("IPOKE_LPIPS_WEIGHTS")
    lpips_params = load_torch_lpips_npz(lp) if lp else init_lpips_params(0)
    result = {
        "divscore_mse": diversity_score_mse(samples),
        "divscore_vgg": diversity_score_vgg(init_vgg_params(0), samples),
        "divscore_lpips": diversity_score_lpips(lpips_params, samples),
    }
    d = _out_dir(experiment, "diversity")
    with open(os.path.join(d, "metrics.json"), "w") as f:
        json.dump(result, f)
    return result


def _u8(img: np.ndarray) -> np.ndarray:
    from ..utils.video import to_uint8

    return to_uint8(np.asarray(img, np.float32))


def _generated_motion_direction(x0_u8, xT_u8, y, x, win: int = 8):
    """Mean Farneback-flow vector of the generated clip around (y, x) —
    the measured response direction to a poke."""
    import cv2

    g0 = cv2.cvtColor(x0_u8, cv2.COLOR_RGB2GRAY)
    gT = cv2.cvtColor(xT_u8, cv2.COLOR_RGB2GRAY)
    fl = cv2.calcOpticalFlowFarneback(g0, gT, None, 0.5, 3, 9, 3, 5, 1.2, 0)
    h, w = g0.shape
    patch = fl[max(0, y - win): y + win + 1, max(0, x - win): x + win + 1]
    return patch.reshape(-1, 2).mean(0)  # (dx, dy)


def test_control_sensitivity(experiment) -> Dict[str, float]:
    """Re-poke the same pixel with rotated directions and measure whether the
    generated motion FOLLOWS the poke direction (reference
    ``_control_sensitivity``, second_stage_video.py:797-902: per element,
    ``n_control_sensitivity_pokes`` direction-randomized pokes — phase from a
    random high-amplitude flow location — placed at the original poke coords;
    one sample per poke; multipoke overview grids + per-poke videos +
    enrollments).

    Beyond the reference's artifact-only test, this also reports
    ``direction_correlation``: the mean cosine similarity between each poke
    direction and the Farneback-estimated motion of the generated clip at
    the poke location (evenly-spaced angles over 2pi instead of the
    reference's random [0, pi) draw, so the metric covers all directions
    deterministically).  A model that ignores poke direction scores ~0."""
    from ..utils.video import make_multipoke_grid, save_enrollment, save_video

    _restore_trained(experiment)
    n_dirs = 4 if experiment.debug else int(
        experiment.config.get("testing", {}).get(
            "n_control_sensitivity_pokes", 8))
    half = int(experiment.config["data"].get("poke_size", 5)) // 2
    sample = _sample_fn(experiment)
    d = _out_dir(experiment, "control_sensitivity")
    cos_sims, responses = [], []
    rng = np.random.default_rng(experiment.config["general"].get("seed", 42))
    for batch in experiment.datamodule.test_loader(n_batches=1):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        poke = np.asarray(batch["poke"])
        B, H, W = poke.shape[:3]
        flow = np.asarray(batch["flow"]) if "flow" in batch else poke
        coords = np.asarray(batch["poke_coords"]) if "poke_coords" in batch \
            else None
        mag = np.linalg.norm(poke, axis=-1)
        flat = mag.reshape(B, -1).argmax(-1)
        ys, xs = np.unravel_index(flat, (H, W))
        ys, xs = np.asarray(ys), np.asarray(xs)
        if coords is not None:
            # zero-poke elements carry (-1, -1) centers — keep the argmax
            # fallback for those
            valid = coords[:, 0, 0] >= 0
            ys = np.where(valid, coords[:, 0, 0], ys)
            xs = np.where(valid, coords[:, 0, 1], xs)
        # phase per element: |flow| at a random above-mean-amplitude location
        # (reference :809-828)
        amp = np.linalg.norm(flow, axis=-1)
        phases = np.empty(B, np.float32)
        for b in range(B):
            valid = np.argwhere(amp[b] > amp[b].mean())
            if valid.shape[0] == 0:
                valid = np.asarray([[ys[b], xs[b]]])
            vy, vx = valid[rng.integers(valid.shape[0])]
            phases[b] = amp[b, vy, vx]
        all_pokes, all_vids = [poke], []
        vid0 = np.asarray(sample(experiment.state.params, experiment.frozen,
                                 batch, experiment.next_rng()))
        all_vids.append(vid0)
        for k in range(n_dirs):
            ang = 2 * np.pi * k / n_dirs
            d_vec = np.stack([np.cos(ang) * phases, np.sin(ang) * phases], -1)
            new_poke = np.zeros_like(poke)
            for b in range(B):
                y, x = int(ys[b]), int(xs[b])
                new_poke[b, max(0, y - half): y + half + 1,
                         max(0, x - half): x + half + 1] = d_vec[b]
            nb = dict(batch)
            nb["poke"] = jnp.asarray(new_poke)
            vid = np.asarray(sample(experiment.state.params,
                                    experiment.frozen, nb,
                                    experiment.next_rng()))
            all_pokes.append(new_poke)
            all_vids.append(vid)
            for b in range(B):
                y, x = int(ys[b]), int(xs[b])
                move = _generated_motion_direction(
                    _u8(np.asarray(batch["images"])[b, 0]), _u8(vid[b, -1]),
                    y, x)
                n_move = np.linalg.norm(move)
                responses.append(float(n_move))
                if n_move > 1e-3:
                    u = d_vec[b] / (phases[b] + 1e-8)
                    # channel order is KNOWN, not guessed: pokes copy flow
                    # values verbatim (data/poke.py simulate_poke) and both
                    # the flow files (data/prep.py estimators) and the
                    # Farneback response above are (dx, dy) — so dot(move, u)
                    # is the aligned correlation; the swapped order is kept
                    # only as a debug field
                    cos_sims.append((float(np.dot(move / n_move, u)),
                                     float(np.dot(move[::-1] / n_move, u))))
        # reference artifact set: overview grid + per-poke singles +
        # enrollments under sid_<start_id> dirs (:875-900)
        pokes_np = np.stack(all_pokes, axis=1)   # (B, n_dirs+1, H, W, 2)
        vids_np = np.stack(all_vids, axis=1)     # (B, n_dirs+1, T, H, W, 3)
        sids = np.asarray(batch["sample_ids"])[:, 0] if "sample_ids" in batch \
            else np.arange(B)
        x0s = np.asarray(batch["images"])[:, 0]
        tgts = np.asarray(batch["images"])[:, 1:]
        for b in range(min(B, 4)):
            sd = os.path.join(d, f"sid_{int(sids[b])}")
            os.makedirs(sd, exist_ok=True)
            singles = make_multipoke_grid(
                x0s[b], pokes_np[b], tgts[b], vids_np[b],
                os.path.join(sd, "overview.mp4"))
            for i, sv in enumerate(singles):
                tag = "groundtruth_poke" if i == 0 else f"sample_{i}"
                save_video(sv, os.path.join(sd, f"{tag}.mp4"))
                save_enrollment(sv, os.path.join(sd, f"{tag}_enrollment.png"))
    if cos_sims:
        m_xy = float(np.mean([c[0] for c in cos_sims]))
        m_yx = float(np.mean([c[1] for c in cos_sims]))
    else:
        m_xy = m_yx = 0.0
    result = {
        "direction_correlation": m_xy,
        "direction_correlation_swapped_debug": m_yx,
        "poke_region_response": float(np.mean(responses)),
        "n_directions": float(n_dirs),
    }
    with open(os.path.join(d, "metrics.json"), "w") as f:
        json.dump(result, f)
    return result


def test_transfer(experiment) -> Dict[str, float]:
    """Kinematics transfer (reference ``_test_transfer``,
    second_stage_video.py:959-1045): retrieve each clip's kinematics nearest
    neighbor (the ``nn`` datakey — keypoint-NN on iPER, random-other-video
    fallback elsewhere), encode video A to its residual under its own
    conditioning, then invert that residual under the NEIGHBOR's conditioning
    (neighbor start frame + A's poke) and decode on the neighbor — plus a
    random-residual control, like the reference's ``vid_random_cond2``.

    Artifacts: ``transfer_grid-<b>.mp4`` (src | tgt x0 | transfer | random)
    and per-pair enrollment PNGs + row mp4s keyed by both sample ids."""
    from ..utils.video import make_transfer_grid, save_enrollment, save_video

    _restore_trained(experiment)
    model = experiment.model
    T = experiment.config["data"]["max_frames"]

    @jax.jit
    def transfer(params, frozen, batch, rng):
        r1, _ = model.forward_density(params, frozen, batch, rng)
        # neighbor conditioning: X_2's start image with A's poke (reference
        # poke1_src2 / cond_2 assembly, :976-1013)
        batch_b = {"images": batch["nn_images"], "poke": batch["poke"]}
        cond_b = model.embed_conditioning(frozen, batch_b, params)

        def decode(residual):
            motion = model.flow.inverse(params["flow"], residual, cond_b)
            if model.augment_input:
                motion = motion[..., : model.first_stage.z_dim]
            return model.decode_first_stage(frozen, motion,
                                            batch_b["images"][:, 0], T)

        z_rand = jax.random.normal(rng, r1.shape, r1.dtype)
        return decode(r1), decode(z_rand)

    d = _out_dir(experiment, "transfer")
    n_batches = 1 if experiment.debug else 2
    # ensure the dataset yields the nn payload
    dset = experiment.datamodule.dset_test
    if "nn" not in dset.datakeys:
        dset.datakeys.append("nn")
    n_done = 0
    for bi, batch in enumerate(
            experiment.datamodule.test_loader(n_batches=n_batches)):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        vid, vid_rand = transfer(experiment.state.params, experiment.frozen,
                                 batch, experiment.next_rng())
        vid, vid_rand = np.asarray(vid), np.asarray(vid_rand)
        np.save(os.path.join(d, f"transfer_batch{bi}.npy"), vid)
        src = np.asarray(batch["images"][:, 1:])
        tgt_x0 = np.asarray(batch["nn_images"][:, 0])
        make_transfer_grid(
            src, tgt_x0, vid, os.path.join(d, f"transfer_grid-{bi}.mp4"),
            extra=[vid_rand])
        sids1 = np.asarray(batch["sample_ids"])[:, 0] if "sample_ids" in batch \
            else np.arange(vid.shape[0])
        sids2 = np.asarray(batch["nn_sample_ids"])[:, 0]
        for b in range(min(vid.shape[0], 4)):
            tag = f"ids_m{int(sids1[b])}_src{int(sids2[b])}"
            save_video(vid[b], os.path.join(d, f"transfer_row-{tag}.mp4"))
            save_enrollment(vid[b], os.path.join(d, f"transfer_grid-{tag}.png"))
        n_done += vid.shape[0]
    return {"n_transferred": float(n_done)}


def test_kps_acc(experiment) -> Dict[str, float]:
    """Targeted keypoint error with keypoint pokes: poke a keypoint with its
    true displacement, estimate keypoints on the generated video, compare to
    the target trajectory (reference ``_test_step_kps_acc``,
    second_stage_video.py:772-794).  Needs keypoint metadata (pose prep) —
    falls back to the standard poke key when absent."""
    from ..eval.pose import keypoint_mse, pose_estimator_from_env

    _restore_trained(experiment)
    # real COCO pose_resnet152 weights when IPOKE_POSE_WEIGHTS is set
    # (acquisition recipe in eval/pose.py::load_torch_pose_resnet_npz)
    est = pose_estimator_from_env(
        experiment.config["data"]["spatial_size"][0])
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


# ---------------------------------------------------------------------------
# Third-stage (fork) test modes: realism + accuracy
# (reference models/third_stage_video_fc.py:61-67,280-293,404-453; CLI
# choice `realism` at reference main.py:87)
# ---------------------------------------------------------------------------

def _require_third_stage(experiment):
    assert getattr(experiment, "evaluates_hallucinated_flow", False), (
        f"--test realism / third-stage accuracy evaluate the fork's "
        f"hallucinated-flow pipeline (run them on third_stage_fc runs); "
        f"{type(experiment).__name__} has no flow-hallucination pipeline")


def _third_stage_fns(experiment):
    """Jitted closures over the third-stage pipeline:

    * ``extract`` — seed the INN inverse with the SECOND stage's residual and
      decode the first z_flow channels = the flow the second stage "saw"
      (reference ``forward_sample(None, 1, None, out_hat)``,
      third_stage_video_fc.py:341,405);
    * ``sample`` — base-sampled hallucinated flow;
    * ``recon`` — AE reconstruction of the ground-truth flow (the accuracy
      comparison target, reference ``:389-395``)."""
    model, ss_model, ss_params = (experiment.model, experiment.ss_model,
                                  experiment.ss_params)
    cond_fn = getattr(experiment, "cond_fn", None)

    @jax.jit
    def extract(params, frozen, batch, rng):
        h = cond_fn(frozen, batch) if cond_fn else None
        out_hat, _ = ss_model.forward_density(ss_params, frozen, batch, rng)
        z = out_hat.reshape(out_hat.shape[0], -1)
        flow, _ = model.forward_sample_flow(params, frozen, batch, rng, h,
                                            z=z)
        return flow

    @jax.jit
    def sample(params, frozen, batch, rng):
        h = cond_fn(frozen, batch) if cond_fn else None
        flow, _ = model.forward_sample_flow(params, frozen, batch, rng, h)
        return flow

    @jax.jit
    def recon(frozen, batch):
        mu, _ = model.encode_flow(frozen, batch["flow"])
        return model.decode_flow_latent(frozen, mu)

    return extract, sample, recon


def test_realism(experiment) -> Dict[str, float]:
    """Third-stage ``realism``: FID between colorized hallucinated flow
    (second-stage-residual-seeded INN inverse -> flow decode) and colorized
    real flow maps, over ``testing.n_samples_fid`` samples (reference
    third_stage_video_fc.py:61-67,404-415,448-453).  The feature net is the
    framework's VGG19 (real weights via ``IPOKE_VGG_WEIGHTS``) replacing
    InceptionV3 — a valid relative FID."""
    from ..eval.metrics import compute_fid
    from ..nn.vgg import init_vgg_params
    from ..utils.video import flow_to_rgb

    _require_third_stage(experiment)
    _restore_trained(experiment, require_sampler=False)
    tcfg = experiment.config.get("testing", {})
    bs = experiment.datamodule.config.get("test_batch_size",
                                          experiment.datamodule.batch_size)
    n_batches = 2 if experiment.debug else max(
        1, -(-int(tcfg.get("n_samples_fid", 1000)) // bs))
    extract, _, _ = _third_stage_fns(experiment)
    reals, fakes = [], []
    for batch in experiment.datamodule.test_loader(n_batches=n_batches):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        flow_hat = np.asarray(extract(
            experiment.state.params, experiment.frozen, batch,
            experiment.next_rng()))
        reals.append(np.stack([flow_to_rgb(f)
                               for f in np.asarray(batch["flow"])]))
        fakes.append(np.stack([flow_to_rgb(f) for f in flow_hat]))
    real = np.concatenate(reals).astype(np.float32) / 127.5 - 1.0
    fake = np.concatenate(fakes).astype(np.float32) / 127.5 - 1.0
    fid = compute_fid(init_vgg_params(0), real, fake,
                      batch_size=min(32, real.shape[0]))
    result = {"FID": float(fid), "n_samples": float(real.shape[0])}
    d = _out_dir(experiment, "realism")
    with open(os.path.join(d, "metrics.json"), "w") as f:
        json.dump(result, f)
    return result


def test_accuracy_third_stage(experiment) -> Dict[str, float]:
    """Third-stage ``accuracy`` (reference third_stage_video_fc.py:280-293,
    371-398,421-447): ratio-of-error categories between the residual-
    extracted flow and the AE-reconstructed ground truth (angular
    R5/R10/R15 degrees, endpoint R1/R2/R3/R5 px), plus the reference's
    diversity artifact set — a colorized
    ``[ground truth | extracted | sample x n]`` category stack, the pokes
    and start frames, and the per-batch error yaml, all keyed by the poke
    count (NHWC uint8 instead of the reference's CHW floats)."""
    import yaml as _yaml

    from ..eval.metrics import optical_flow_metrics
    from ..utils.video import flow_to_rgb

    _require_third_stage(experiment)
    _restore_trained(experiment, require_sampler=False)
    tcfg = experiment.config.get("testing", {})
    n_spp = int(tcfg.get("n_samples_per_data_point", 5))
    n_log = int(experiment.config.get("logging", {}).get("n_log_images", 8))
    n_batches = 2 if experiment.debug else 10
    n_pokes = int(experiment.config["data"].get("n_pokes", 1))
    extract, sample, recon = _third_stage_fns(experiment)

    P, F = experiment.state.params, experiment.frozen
    errs, cats, pokes, x0s = [], [], [], []
    for batch in experiment.datamodule.test_loader(n_batches=n_batches):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        flow_ex = np.asarray(extract(P, F, batch, experiment.next_rng()))
        flow_ref = np.asarray(recon(F, batch))
        # the reference caps the metric at 64 elements per batch (:392)
        m = optical_flow_metrics(jnp.asarray(flow_ex[:64]),
                                 jnp.asarray(flow_ref[:64]))
        errs.append({k: float(v) for k, v in m.items()})
        samples = [np.asarray(sample(P, F, batch, experiment.next_rng()))
                   for _ in range(n_spp)]
        gt = np.asarray(batch["flow"])
        cat = [gt[:n_log], flow_ex[:n_log]] + [s[:n_log] for s in samples]
        cats.append(np.stack(
            [np.stack([flow_to_rgb(f) for f in c]) for c in cat]))
        pokes.append(np.asarray(batch["poke"])[:n_log])
        x0s.append(np.asarray(batch["images"])[:n_log, 0])
    result = {k: float(np.mean([e[k] for e in errs])) for k in errs[0]}
    d = _out_dir(experiment, "accuracy")
    np.save(os.path.join(d, f"samples_diversity_{n_pokes}_pokes.npy"),
            np.concatenate(cats, axis=1))
    np.save(os.path.join(d, f"pokes_diversity_{n_pokes}_pokes.npy"),
            np.concatenate(pokes))
    np.save(os.path.join(d, f"starting_frame_{n_pokes}_pokes.npy"),
            np.concatenate(x0s))
    with open(os.path.join(d, f"error_result_{n_pokes}_pokes.yaml"),
              "w") as f:
        _yaml.safe_dump(errs, f)
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
    "realism": test_realism,
}


def run_test(experiment, mode: str) -> Dict[str, float]:
    assert mode in _MODES, f"unknown test mode {mode!r} ({sorted(_MODES)})"
    fn = _MODES[mode]
    # `--test accuracy` on a third-stage run means the fork's flow-error
    # fan-out, not the video-sample metrics (reference dispatches inside
    # ThirdStageFlowFC.test_step, third_stage_video_fc.py:371-415)
    if mode == "accuracy" and getattr(experiment,
                                      "evaluates_hallucinated_flow", False):
        fn = test_accuracy_third_stage
    result = fn(experiment)
    experiment.logger.info(f"--test {mode}: {result}")
    return result
