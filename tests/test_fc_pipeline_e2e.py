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
    finally:
        os.environ.pop("DATAPATH_BASE", None)
