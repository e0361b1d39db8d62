"""Full-pipeline integration test through the CLI surface:

synthetic on-disk dataset -> train img_encoder, poke_encoder, first_stage
(debug mode) -> train second_stage composing the frozen checkpoints ->
``--test samples`` + ``--test fvd``.  This is the reference's 3-stage
``main.py`` workflow end to end.
"""

import os
import sys

import numpy as np
import pytest
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ipoke_tpu.data.prep import make_synthetic_dataset

S = 32  # spatial size for the tiny pipeline

DATA = {
    "dataset": "PlantDataset", "poke_size": 3, "max_frames": 3,
    "batch_size": 2, "n_workers": 2, "yield_videos": True,
    "spatial_size": [S, S], "augment": False, "n_pokes": 2,
    "zero_poke": True, "zero_poke_amount": 6, "scale_poke_to_res": True,
}


def _write_cfg(path, cfg):
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return str(path)


@pytest.fixture(scope="module")
def pipeline_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("pipeline")
    data_root = str(root / "data")
    make_synthetic_dataset(data_root, n_videos=4, n_frames=14,
                           spatial_size=S, flow_delta=4)
    base = str(root / "logs")
    return {"root": root, "data_root": data_root, "base": base}


def _run_main(argv, base):
    import main as cli

    os.environ["DATAPATH_BASE"] = base
    try:
        assert cli.main(argv) == 0
    finally:
        os.environ.pop("DATAPATH_BASE", None)


def test_full_three_stage_pipeline(pipeline_env):
    root, data_root, base = (pipeline_env["root"], pipeline_env["data_root"],
                             pipeline_env["base"])

    img_cfg = {
        "general": {"experiment": "img_encoder", "seed": 1, "debug": True},
        "data": DATA,
        "architecture": {"nf_in": 3, "nf_max": 16, "min_spatial_size": 4,
                         "deterministic": True},
        "training": {"lr": 2e-4, "n_epochs": 1, "perc_weight": 1.0},
        "disc": {"ndf": 16, "n_layers": 2, "start": 0},
    }
    poke_cfg = {
        "general": {"experiment": "poke_encoder", "seed": 1, "debug": True},
        "data": DATA,
        "architecture": {"nf_in": 2, "nf_max": 16, "min_spatial_size": 4,
                         "deterministic": True},
        "training": {"lr": 2e-4, "n_epochs": 1, "perc_weight": 1.0},
    }
    fs_cfg = {
        "general": {"experiment": "first_stage", "seed": 1, "debug": True},
        "data": DATA,
        "architecture": {
            "z_dim": 8, "ENC_M_channels": [16, 16, 32, 32],
            "dec_channels": [32, 32, 16, 16], "n_gru_layers": 2,
            "min_spatial_size": 4, "norm": "group", "spectral_norm": True,
            "motion_bias": True,
        },
        "training": {"lr": 2e-4, "n_epochs": 1, "w_kl": 1e-6, "w_l1": 10,
                     "w_vgg": 1, "gamma": 0.98, "full_sequence": True},
        "d_t": {"use": True, "pretrain": 0, "max_frames": 3, "gp_weight": 0.5,
                "gen_weight": 1.0, "fmap_weight": 1.0, "layers": [1, 1, 1, 1]},
        "d_s": {"use": True, "pretrain": 0, "n_examples": 4, "ndf": 16,
                "n_layers": 2},
    }

    for name, cfg in (("img", img_cfg), ("poke", poke_cfg), ("fs", fs_cfg)):
        path = _write_cfg(root / f"{name}.yaml", cfg)
        _run_main(["--config", path, "--model_name", "tiny",
                   "--data_root", data_root], base)

    # checkpoints exist with best_k manifests
    for exp in ("img_encoder", "poke_encoder", "first_stage"):
        vdir = os.path.join(base, exp, "ckpt", "tiny", "0")
        assert os.path.isdir(os.path.join(vdir, "last")), exp
        assert os.path.exists(os.path.join(vdir, "best_k_models.yaml")), exp

    # the image AE validates with FID like the reference
    # (first_stage_image_conv.py:223-256)
    import json as _json

    with open(os.path.join(base, "img_encoder/log/tiny/0/"
                           "metrics.jsonl")) as f:
        vals = [_json.loads(line) for line in f]
    fid_vals = [v["val/fid-val"] for v in vals if "val/fid-val" in v]
    assert fid_vals and all(np.isfinite(v) for v in fid_vals), (
        "img_encoder validation must log fid-val")

    ss_cfg = {
        "general": {"experiment": "second_stage", "seed": 1, "debug": True},
        "first_stage": {
            "config": os.path.join(base, "first_stage/config/tiny/0.yaml"),
            "ckpt": os.path.join(base, "first_stage/ckpt/tiny/0"),
        },
        "conditioner": {
            "use": True,
            "config": os.path.join(base, "img_encoder/config/tiny/0.yaml"),
            "ckpt": os.path.join(base, "img_encoder/ckpt/tiny/0"),
        },
        "poke_embedder": {
            "config": os.path.join(base, "poke_encoder/config/tiny/0.yaml"),
            "ckpt": os.path.join(base, "poke_encoder/ckpt/tiny/0"),
        },
        "data": dict(DATA, test_batch_size=2),
        "architecture": {
            "flow_mid_channels_factor": 2, "kernel_size": [2, 3],
            "num_steps": [1, 1], "factor": 4, "activation": "elu",
            "transform": "affine", "prior_transform": "affine",
            "condition_nice": False, "augmented_input": False,
        },
        "training": {"lr": 1e-3, "n_epochs": 1, "lr_scaling_max_it": 5,
                     "custom_lr_decrease": True, "spatial_mean": False},
        "testing": {"n_samples_per_data_point": 2, "test_batch_size": 2},
    }
    ss_path = _write_cfg(root / "ss.yaml", ss_cfg)
    _run_main(["--config", ss_path, "--model_name", "tiny",
               "--data_root", data_root], base)
    assert os.path.isdir(
        os.path.join(base, "second_stage/ckpt/tiny/0/last"))

    # --test samples on the trained second stage
    _run_main(["--config", ss_path, "--model_name", "tiny",
               "--data_root", data_root, "--test", "samples"], base)
    gen = os.path.join(base, "second_stage/generated/tiny/samples")
    files = os.listdir(gen)
    assert any(f.endswith(".npy") for f in files)
    assert any(f.endswith(".mp4") for f in files)
    samples = np.load(os.path.join(gen, "samples_batch0.npy"))
    assert samples.ndim == 6 and samples.shape[2] == 3  # (B,S,T,H,W,3)
    assert np.isfinite(samples).all()

    # --test fvd
    _run_main(["--config", ss_path, "--model_name", "tiny",
               "--data_root", data_root, "--test", "fvd"], base)
    import json

    with open(os.path.join(
            base, "second_stage/generated/tiny/fvd/fvd.json")) as f:
        fvd = json.load(f)
    assert np.isfinite(fvd["FVD"])

    # --test transfer: NN-retrieved kinematics transfer with the reference's
    # artifact set (grid mp4 + per-pair enrollment PNG + row mp4)
    _run_main(["--config", ss_path, "--model_name", "tiny",
               "--data_root", data_root, "--test", "transfer"], base)
    tdir = os.path.join(base, "second_stage/generated/tiny/transfer")
    tfiles = os.listdir(tdir)
    assert any(f.startswith("transfer_grid-") and f.endswith(".mp4")
               for f in tfiles)
    assert any(f.startswith("transfer_row-ids_m") for f in tfiles)
    assert any(f.startswith("transfer_grid-ids_m") and f.endswith(".png")
               for f in tfiles)

    # --test control_sensitivity: rotated pokes -> multipoke grids +
    # direction-correlation metric
    _run_main(["--config", ss_path, "--model_name", "tiny",
               "--data_root", data_root, "--test", "control_sensitivity"],
              base)
    cdir = os.path.join(base,
                        "second_stage/generated/tiny/control_sensitivity")
    with open(os.path.join(cdir, "metrics.json")) as f:
        cs = json.load(f)
    assert "direction_correlation" in cs and np.isfinite(
        cs["direction_correlation"])
    sid_dirs = [f for f in os.listdir(cdir) if f.startswith("sid_")]
    assert sid_dirs, "per-element multipoke sample dirs must exist"
    inner = os.listdir(os.path.join(cdir, sid_dirs[0]))
    assert "overview.mp4" in inner
    assert any(f.endswith("_enrollment.png") for f in inner)

    # --test diversity: MSE + VGG + LPIPS variants
    _run_main(["--config", ss_path, "--model_name", "tiny",
               "--data_root", data_root, "--test", "diversity"], base)
    with open(os.path.join(
            base, "second_stage/generated/tiny/diversity/metrics.json")) as f:
        div = json.load(f)
    for key in ("divscore_mse", "divscore_vgg", "divscore_lpips"):
        assert np.isfinite(div[key]), key

    # --test accuracy: best-of-n SSIM/PSNR/LPIPS + per-frame CSV
    _run_main(["--config", ss_path, "--model_name", "tiny",
               "--data_root", data_root, "--test", "accuracy"], base)
    adir = os.path.join(base, "second_stage/generated/tiny/accuracy")
    with open(os.path.join(adir, "metrics.json")) as f:
        acc = json.load(f)
    for key in ("ssim_best_of_n", "psnr_best_of_n", "lpips_best_of_n"):
        assert np.isfinite(acc[key]), key
    assert os.path.exists(os.path.join(adir, "per_frame_metrics.csv"))

    # --test kps_acc (no keypoint metadata -> posenet on real vs fake)
    _run_main(["--config", ss_path, "--model_name", "tiny",
               "--data_root", data_root, "--test", "kps_acc"], base)
    with open(os.path.join(
            base, "second_stage/generated/tiny/kps_acc/metrics.json")) as f:
        kps = json.load(f)
    assert np.isfinite(kps["kps_mse"])
    assert kps["annotated_keypoints"] == 0.0


def test_fc_flow_encoder_and_third_stage(pipeline_env):
    """Fork pipeline: flow_encoder_fc (BigGAN-AE) + flow_motion third stage
    on top of the stage-1/2 artifacts produced by the previous test."""
    root, data_root, base = (pipeline_env["root"], pipeline_env["data_root"],
                             pipeline_env["base"])
    assert os.path.isdir(os.path.join(base, "second_stage/ckpt/tiny/0")), (
        "run the 3-stage test first")

    fcae_cfg = {
        "general": {"experiment": "flow_encoder_fc", "seed": 1, "debug": True},
        "data": DATA,
        "architecture": {"z_dim": 8, "n_out_channels": 2, "gen_ch": 8},
        "training": {"lr": 2e-4, "n_epochs": 1, "perc_weight": 1.0,
                     "kl_weight": 1e-6, "disc_weight": 1.0},
        "disc": {"ndf": 16, "n_layers": 2, "start": 0},
    }
    path = _write_cfg(root / "fcae.yaml", fcae_cfg)
    _run_main(["--config", path, "--model_name", "tiny",
               "--data_root", data_root], base)
    assert os.path.isdir(
        os.path.join(base, "flow_encoder_fc/ckpt/tiny/0/last_weights"))

    # train the ConvFlowVAE so flow_motion composes a REAL frozen VAE
    fv_cfg = {
        "general": {"experiment": "flow_vae", "seed": 1, "debug": True},
        "data": DATA,
        # min_spatial_size must match the second stage's (4) — flow_motion
        # rebuilds the VAE at ss_model.min_spatial_size before restoring
        "architecture": {"flow_vae_channels": 4, "flow_vae_nf_max": 16,
                         "min_spatial_size": 4},
        "training": {"lr": 1e-3, "n_epochs": 1, "kl_weight": 1e-6},
    }
    path = _write_cfg(root / "fv.yaml", fv_cfg)
    _run_main(["--config", path, "--model_name", "tiny",
               "--data_root", data_root], base)
    fv_ckpt = os.path.join(base, "flow_vae/ckpt/tiny/0")
    assert os.path.isdir(os.path.join(fv_ckpt, "last_weights"))

    fm_cfg = {
        "general": {"experiment": "flow_motion", "seed": 1, "debug": True},
        "first_stage": {
            "config": os.path.join(base, "first_stage/config/tiny/0.yaml"),
            "ckpt": os.path.join(base, "first_stage/ckpt/tiny/0")},
        "conditioner": {
            "use": True,
            "config": os.path.join(base, "img_encoder/config/tiny/0.yaml"),
            "ckpt": os.path.join(base, "img_encoder/ckpt/tiny/0")},
        "poke_embedder": {
            "config": os.path.join(base, "poke_encoder/config/tiny/0.yaml"),
            "ckpt": os.path.join(base, "poke_encoder/ckpt/tiny/0")},
        "second_stage": {
            "config": os.path.join(base, "second_stage/config/tiny/0.yaml"),
            "ckpt": os.path.join(base, "second_stage/ckpt/tiny/0")},
        "flow_vae": {"ckpt": fv_ckpt},
        "data": DATA,
        "architecture": {"num_steps": [1], "flow_mid_channels_factor": 2,
                         "factor": 4, "flow_vae_channels": 4,
                         "flow_vae_nf_max": 16},
        "training": {"lr": 1e-3, "n_epochs": 1, "lr_scaling_max_it": 5,
                     "weight_recon": 1.0, "recon_scaling": False},
    }
    path = _write_cfg(root / "fm.yaml", fm_cfg)
    _run_main(["--config", path, "--model_name", "tiny",
               "--data_root", data_root], base)
    import yaml as _y

    manifest = os.path.join(base, "flow_motion/ckpt/tiny/0/best_k_models.yaml")
    assert os.path.exists(manifest)
    with open(os.path.join(
            base, "flow_motion/log/tiny/0/metrics.jsonl")) as f:
        lines = [l for l in f if "EE-val" in l]
    assert lines, "validation EE metric not logged"
