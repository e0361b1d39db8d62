"""FC-tower pipeline end-to-end through the CLI (debug mode):
img/poke FC encoders -> first_stage_fc -> second_stage_fc."""

import os

import yaml


def test_fc_pipeline_through_cli(tmp_path):
    import main as cli
    from ipoke_tpu.data.prep import make_synthetic_dataset

    ROOT = str(tmp_path)
    DATA, BASE = f"{ROOT}/data", f"{ROOT}/logs"
    os.environ["DATAPATH_BASE"] = BASE
    try:
        make_synthetic_dataset(DATA, n_videos=4, n_frames=14,
                               spatial_size=32, flow_delta=4)
        D = {"dataset": "PlantDataset", "poke_size": 3, "max_frames": 3,
             "batch_size": 2, "n_workers": 2, "yield_videos": True,
             "spatial_size": [32, 32], "augment": False, "n_pokes": 2,
             "zero_poke": True, "zero_poke_amount": 6,
             "scale_poke_to_res": True, "test_batch_size": 2}

        def run(name, cfg):
            p = f"{ROOT}/{name}.yaml"
            yaml.safe_dump(cfg, open(p, "w"))
            assert cli.main(["--config", p, "--model_name", "fc",
                             "--data_root", DATA]) == 0

        run("imgfc", {
            "general": {"experiment": "img_encoder_fc", "seed": 1,
                        "debug": True},
            "data": D, "architecture": {"nf_in": 3, "nf_max": 16},
            "training": {"lr": 2e-4, "n_epochs": 1, "perc_weight": 1.0},
            "disc": {"ndf": 16, "n_layers": 2, "start": 0}})
        run("pokefc", {
            "general": {"experiment": "poke_encoder_fc", "seed": 1,
                        "debug": True},
            "data": D, "architecture": {"nf_in": 2, "nf_max": 16},
            "training": {"lr": 2e-4, "n_epochs": 1, "perc_weight": 1.0}})
        run("fsfc", {
            "general": {"experiment": "first_stage_fc", "seed": 1,
                        "debug": True},
            "data": D,
            "architecture": {"fc_baseline": True, "z_dim": 16,
                             "ENC_M_channels": [16, 16, 32, 32],
                             "dec_channels": [32, 32, 16, 16],
                             "n_gru_layers": 2, "CN_content": "spade"},
            "training": {"lr": 2e-4, "n_epochs": 1, "w_kl": 1e-6,
                         "w_l1": 10, "w_vgg": 1, "full_sequence": True},
            "d_t": {"use": True, "pretrain": 0, "max_frames": 3,
                    "gp_weight": 0.0, "gen_weight": 1.0, "fmap_weight": 1.0,
                    "layers": [1, 1, 1, 1]},
            "d_s": {"use": True, "pretrain": 0, "n_examples": 4, "ndf": 16,
                    "n_layers": 2}})
        run("ssfc", {
            "general": {"experiment": "second_stage_fc", "seed": 1,
                        "debug": True},
            "first_stage": {
                "config": f"{BASE}/first_stage_fc/config/fc/0.yaml",
                "ckpt": f"{BASE}/first_stage_fc/ckpt/fc/0"},
            "conditioner": {
                "use": True, "nf_max": 16,
                "config": f"{BASE}/img_encoder_fc/config/fc/0.yaml",
                "ckpt": f"{BASE}/img_encoder_fc/ckpt/fc/0"},
            "poke_embedder": {
                "nf_max": 16,
                "config": f"{BASE}/poke_encoder_fc/config/fc/0.yaml",
                "ckpt": f"{BASE}/poke_encoder_fc/ckpt/fc/0"},
            "data": D,
            "architecture": {"flow_mid_channels_factor": 2,
                             "flow_hidden_depth": 1, "n_flows": 4},
            "training": {"lr": 1e-3, "n_epochs": 1, "lr_scaling_max_it": 5}})
        assert os.path.isdir(f"{BASE}/second_stage_fc/ckpt/fc/0/last_weights")

        # --test transfer on the FC second stage (regression for the round-2
        # advisor finding: SecondStageModelFC.embed_conditioning signature /
        # missing augment_input attribute raised TypeError here)
        assert cli.main(["--config", f"{ROOT}/ssfc.yaml", "--model_name",
                         "fc", "--data_root", DATA,
                         "--test", "transfer"]) == 0
        tfiles = os.listdir(f"{BASE}/second_stage_fc/generated/fc/transfer")
        assert any(f.startswith("transfer_grid-") and f.endswith(".mp4")
                   for f in tfiles)

        # -- flow encoder (BigAE on flow maps) --------------------------------
        run("fcae", {
            "general": {"experiment": "flow_encoder_fc", "seed": 1,
                        "debug": True},
            "data": D,
            "architecture": {"z_dim": 8, "n_out_channels": 2, "gen_ch": 8},
            "training": {"lr": 2e-4, "n_epochs": 1, "perc_weight": 1.0,
                         "kl_weight": 1e-6, "disc_weight": 1.0},
            "disc": {"ndf": 16, "n_layers": 2, "start": 0}})

        # -- third stage FC: unconditional + conditional ---------------------
        ts_cfg = {
            "general": {"experiment": "third_stage_fc", "seed": 1,
                        "debug": True},
            "first_stage": {
                "config": f"{BASE}/first_stage_fc/config/fc/0.yaml",
                "ckpt": f"{BASE}/first_stage_fc/ckpt/fc/0"},
            "conditioner": {
                "use": True, "nf_max": 16,
                "config": f"{BASE}/img_encoder_fc/config/fc/0.yaml",
                "ckpt": f"{BASE}/img_encoder_fc/ckpt/fc/0"},
            "poke_embedder": {
                "nf_max": 16,
                "config": f"{BASE}/poke_encoder_fc/config/fc/0.yaml",
                "ckpt": f"{BASE}/poke_encoder_fc/ckpt/fc/0"},
            "second_stage": {
                "config": f"{BASE}/second_stage_fc/config/fc/0.yaml",
                "ckpt": f"{BASE}/second_stage_fc/ckpt/fc/0"},
            "flow_encoder": {
                "config": f"{BASE}/flow_encoder_fc/config/fc/0.yaml",
                "ckpt": f"{BASE}/flow_encoder_fc/ckpt/fc/0"},
            "data": D,
            "architecture": {"flow_mid_channels_factor": 2,
                             "flow_hidden_depth": 1, "n_flows": 4},
            "training": {"lr": 1e-3, "n_epochs": 1, "lr_scaling_max_it": 5,
                         "weight_recon": 1.0, "recon_scaling": True}}
        run("tsfc", ts_cfg)
        assert os.path.isdir(f"{BASE}/third_stage_fc/ckpt/fc/0/last")
        with open(f"{BASE}/third_stage_fc/log/fc/0/metrics.jsonl") as f:
            assert any("EE_R3-val" in line for line in f), (
                "third stage must log its checkpoint-gating metric")

        # --test realism / accuracy: the fork's third-stage test-mode fan-out
        # (reference third_stage_video_fc.py:280-293,404-453, main.py:87)
        import json

        import numpy as _np

        assert cli.main(["--config", f"{ROOT}/tsfc.yaml", "--model_name",
                         "fc", "--data_root", DATA,
                         "--test", "realism"]) == 0
        with open(f"{BASE}/third_stage_fc/generated/fc/realism/"
                  "metrics.json") as f:
            fid = json.load(f)
        assert _np.isfinite(fid["FID"]) and fid["n_samples"] > 0

        assert cli.main(["--config", f"{ROOT}/tsfc.yaml", "--model_name",
                         "fc", "--data_root", DATA,
                         "--test", "accuracy"]) == 0
        adir = f"{BASE}/third_stage_fc/generated/fc/accuracy"
        with open(f"{adir}/metrics.json") as f:
            acc = json.load(f)
        for key in ("EE_R1", "EE_R3", "AE_R5"):
            assert _np.isfinite(acc[key]), key
        afiles = os.listdir(adir)
        npk = D["n_pokes"]
        for stem in (f"samples_diversity_{npk}_pokes.npy",
                     f"pokes_diversity_{npk}_pokes.npy",
                     f"starting_frame_{npk}_pokes.npy",
                     f"error_result_{npk}_pokes.yaml"):
            assert stem in afiles, stem
        cat = _np.load(f"{adir}/samples_diversity_{npk}_pokes.npy")
        # [ground truth | extracted | sample x n] colorized categories
        assert cat.ndim == 5 and cat.shape[-1] == 3 and cat.shape[0] >= 3

        cond_cfg = dict(ts_cfg, general={"experiment": "third_stage_fc",
                                         "seed": 1, "debug": True,
                                         "conditional": True})
        run("tsfc_cond", cond_cfg)
        assert os.path.isdir(f"{BASE}/third_stage_fc/ckpt/fc/1/last")

        # -- sample a video from measured flow (no GT poke content) ----------
        import jax
        import jax.numpy as jnp
        import numpy as np

        from ipoke_tpu.cli.experiments import select_experiment
        from ipoke_tpu.core.config import load_config

        cfg = load_config(f"{ROOT}/tsfc.yaml")
        cfg["general"]["test"] = "samples"  # attach to existing version
        # pin version 0 (the unconditional run) — the latest version is the
        # conditional variant with a different INN param structure
        cfg["general"]["target_version"] = 0
        exp = select_experiment(cfg)(cfg, dirs={
            "ckpt": f"{BASE}/third_stage_fc/ckpt/fc",
            "config": f"{BASE}/third_stage_fc/config/fc",
            "generated": f"{BASE}/third_stage_fc/generated/fc",
            "log": f"{BASE}/third_stage_fc/log/fc"}, data_root=DATA)
        exp.build()
        exp.state = exp.store.restore(exp.state, "last")
        batch = next(iter(exp.datamodule.test_loader(n_batches=1)))
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        vid = exp.sample_video(batch, jax.random.PRNGKey(0), length=3)
        assert vid.shape[1] == 3 and vid.shape[-1] == 3
        assert np.isfinite(np.asarray(vid)).all()

        # hallucinated flow from a base sample
        flow_hat, residual_rest = jax.jit(
            lambda p, f, b, r: exp.model.forward_sample_flow(
                p, f, b, r,
                h=exp.cond_fn(f, b) if exp.cond_fn else None)
        )(exp.state.params, exp.frozen, batch, jax.random.PRNGKey(1))
        assert flow_hat.shape[-1] == 2
        assert np.isfinite(np.asarray(flow_hat)).all()

        # -- FCAE_eval fork CLI on the trained flow encoder ------------------
        import FCAE_eval
        import sys

        argv = sys.argv
        sys.argv = ["FCAE_eval.py", "--config", f"{ROOT}/fcae.yaml",
                    "--model_name", "fc", "--data_root", DATA,
                    "--n_batches", "2"]
        try:
            FCAE_eval.main()
        finally:
            sys.argv = argv
    finally:
        os.environ.pop("DATAPATH_BASE", None)


def test_flow_vae_experiment(tmp_path):
    """ConvFlowVAE trainer (frozen VAE provider for flow_motion)."""
    import main as cli
    from ipoke_tpu.data.prep import make_synthetic_dataset

    ROOT = str(tmp_path)
    DATA, BASE = f"{ROOT}/data", f"{ROOT}/logs"
    os.environ["DATAPATH_BASE"] = BASE
    try:
        make_synthetic_dataset(DATA, n_videos=3, n_frames=10,
                               spatial_size=32, flow_delta=4)
        cfg = {
            "general": {"experiment": "flow_vae", "seed": 1, "debug": True},
            "data": {"dataset": "PlantDataset", "poke_size": 3,
                     "max_frames": 3, "batch_size": 2, "n_workers": 2,
                     "yield_videos": True, "spatial_size": [32, 32],
                     "augment": False, "n_pokes": 2, "zero_poke": False,
                     "scale_poke_to_res": True},
            "architecture": {"flow_vae_channels": 4, "flow_vae_nf_max": 16,
                             "min_spatial_size": 4},
            "training": {"lr": 1e-3, "n_epochs": 1, "kl_weight": 1e-6}}
        p = f"{ROOT}/fv.yaml"
        yaml.safe_dump(cfg, open(p, "w"))
        assert cli.main(["--config", p, "--model_name", "fv",
                         "--data_root", DATA]) == 0
        assert os.path.isdir(f"{BASE}/flow_vae/ckpt/fv/0/last_weights")
        with open(f"{BASE}/flow_vae/log/fv/0/metrics.jsonl") as f:
            assert any("EE-val" in line for line in f)
    finally:
        os.environ.pop("DATAPATH_BASE", None)
