"""Runnable demo: the full 3-stage pipeline trained end-to-end on one TPU via
the CLI (small real run, not debug mode): synthetic dataset -> img/poke
encoders -> first stage -> second stage -> --test samples + fvd.

Observed on TPU v5e (see /tmp logs of the round-1 run): first stage L1
0.75 -> 0.025 over 300 steps; second-stage flow loss 1875 -> 443 with NLL
below the reference Gaussian; all 7 --test modes produce the reference
artifact tree.  Takes ~30 min end to end (mostly one-time compiles)."""
import json, os, sys, time

# runnable via `python examples/train_synthetic_pipeline.py`: python puts
# examples/ (not the repo root) on sys.path, and PYTHONPATH breaks the axon
# TPU registration (CLAUDE.md) — so bootstrap the root here
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import yaml
import numpy as np

from ipoke_tpu.data.prep import make_synthetic_dataset
import main as cli
ROOT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ipoke_demo"
DATA = os.path.join(ROOT, "data")
BASE = os.path.join(ROOT, "logs")
os.environ["DATAPATH_BASE"] = BASE
if not os.path.exists(os.path.join(DATA, "meta.p")):
    make_synthetic_dataset(DATA, n_videos=12, n_frames=40, spatial_size=64,
                           flow_delta=5)

D = {"dataset": "PlantDataset", "poke_size": 5, "max_frames": 10,
     "batch_size": 8, "n_workers": 8, "yield_videos": True,
     "spatial_size": [64, 64], "augment": False, "n_pokes": 2,
     "zero_poke": True, "zero_poke_amount": 12, "scale_poke_to_res": True,
     "test_batch_size": 8}

def run(name, cfg, extra=None):
    p = os.path.join(ROOT, f"{name}.yaml")
    with open(p, "w") as f:
        yaml.safe_dump(cfg, f)
    t0 = time.time()
    argv = ["--config", p, "--model_name", "demo", "--data_root", DATA]
    if extra:
        argv += extra
    assert cli.main(argv) == 0
    print(f"== {name} done in {time.time()-t0:.0f}s ==", flush=True)

run("img", {
    "general": {"experiment": "img_encoder", "seed": 1},
    "data": D,
    "architecture": {"nf_in": 3, "nf_max": 64, "min_spatial_size": 8,
                     "deterministic": True},
    "training": {"lr": 2e-4, "n_epochs": 2, "max_batches_per_epoch": 120,
                 "max_val_batches": 3, "perc_weight": 1.0,
                 "disc_weight": 0.2},
    "disc": {"ndf": 32, "n_layers": 3, "start": 0},
})
run("poke", {
    "general": {"experiment": "poke_encoder", "seed": 1},
    "data": D,
    "architecture": {"nf_in": 2, "nf_max": 64, "min_spatial_size": 8,
                     "deterministic": True},
    "training": {"lr": 2e-4, "n_epochs": 2, "max_batches_per_epoch": 120,
                 "max_val_batches": 3, "perc_weight": 1.0},
})
run("fs", {
    "general": {"experiment": "first_stage", "seed": 1},
    "data": D,
    "architecture": {"z_dim": 32, "ENC_M_channels": [32, 64, 128, 128],
                     "dec_channels": [128, 128, 64, 32], "n_gru_layers": 2,
                     "min_spatial_size": 8, "norm": "group",
                     "spectral_norm": True, "motion_bias": True},
    "training": {"lr": 2e-4, "n_epochs": 2, "max_batches_per_epoch": 150,
                 "max_val_batches": 3, "w_kl": 1e-7, "w_l1": 10, "w_vgg": 2,
                 "gamma": 0.98, "full_sequence": True},
    "d_t": {"use": True, "pretrain": 0, "max_frames": 8, "gp_weight": 1.0,
            "gen_weight": 0.5, "fmap_weight": 0.5, "layers": [1, 1, 1, 1]},
    "d_s": {"use": True, "pretrain": 0, "n_examples": 16, "ndf": 32,
            "n_layers": 3},
    "logging": {"n_saved_ckpt": 2},
})
ss_cfg = {
    "general": {"experiment": "second_stage", "seed": 1},
    "first_stage": {"config": f"{BASE}/first_stage/config/demo/0.yaml",
                    "ckpt": f"{BASE}/first_stage/ckpt/demo/0"},
    "conditioner": {"use": True,
                    "config": f"{BASE}/img_encoder/config/demo/0.yaml",
                    "ckpt": f"{BASE}/img_encoder/ckpt/demo/0"},
    "poke_embedder": {"config": f"{BASE}/poke_encoder/config/demo/0.yaml",
                      "ckpt": f"{BASE}/poke_encoder/ckpt/demo/0"},
    "data": D,
    "architecture": {"flow_mid_channels_factor": 8, "kernel_size": [2, 3],
                     "num_steps": [4, 3, 2], "factor": 16,
                     "activation": "elu", "transform": "affine",
                     "prior_transform": "affine", "augmented_input": False},
    "training": {"lr": 5e-4, "n_epochs": 2, "max_batches_per_epoch": 150,
                 "max_val_batches": 3, "lr_scaling_max_it": 100,
                 "custom_lr_decrease": True,
                 # the shipped TPU recipe (config/second_stage.yaml r5
                 # default) exercised end-to-end at demo scale
                 "mixed_prec_master": True, "fused_nice_train": True},
    "testing": {"n_samples_per_data_point": 3, "test_batch_size": 8,
                "n_samples_vis": 8, "n_samples_fvd": 64},
    "logging": {"n_saved_ckpt": 2},
}
run("ss", ss_cfg)
run("ss", ss_cfg, extra=["--test", "samples"])
run("ss", ss_cfg, extra=["--test", "fvd"])
print("PIPELINE COMPLETE", flush=True)
