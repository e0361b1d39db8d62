"""Shipped data-preparation configs drive the L0 chain end-to-end.

The reference ships per-dataset prep YAMLs consumed by
``python -m data.prepare_dataset --config config/data_preparation/<ds>.yaml``
(ref data/prepare_dataset.py:518-572).  These tests check (a) all four
shipped configs load with the reference schema, and (b) the iper config runs
the extract -> prepare -> pose_estimation chain on a synthetic video tree.
"""

import glob
import os
import pickle

import numpy as np
import pytest

from ipoke_tpu.data.datasets import __datasets__
from ipoke_tpu.data.prep import load_prep_config, run

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(
    glob.glob(os.path.join(REPO, "config", "data_preparation", "*.yaml")))


def test_all_four_prep_configs_ship():
    names = {os.path.basename(p) for p in CONFIGS}
    assert names == {"plants.yaml", "iper.yaml", "human36m.yaml",
                     "taichi.yaml"}


@pytest.mark.parametrize("path", CONFIGS, ids=os.path.basename)
def test_prep_config_schema(path):
    cfg = load_prep_config(path)
    for key in ("processed_dir", "flow_delta", "flow_max", "mode",
                "video_format", "spatial_size", "frames_discr",
                "num_workers", "data"):
        assert key in cfg, key
    assert cfg["mode"] in ("all", "extract", "prepare", "pose_estimation")
    data = cfg["data"]
    assert data["dataset"] in __datasets__  # resolves in the registry
    assert tuple(data["spatial_size"]) == (64, 64)
    for key in ("poke_size", "n_pokes", "split", "max_frames",
                "aug_deg", "aug_trans", "p_col", "p_geom"):
        assert key in data, key


def test_datapath_reroots_prep_dirs(monkeypatch, tmp_path):
    monkeypatch.setenv("DATAPATH", str(tmp_path))
    cfg = load_prep_config(os.path.join(
        REPO, "config", "data_preparation", "iper.yaml"))
    assert cfg["raw_dir"].startswith(str(tmp_path))
    assert cfg["processed_dir"].startswith(str(tmp_path))


def _write_synthetic_videos(raw_dir, n_videos=2, n_frames=14, size=48):
    """Tiny mp4 tree: a moving square per video."""
    import cv2

    os.makedirs(raw_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    for v in range(n_videos):
        path = os.path.join(raw_dir, f"vid_{v}.mp4")
        wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                             (size, size))
        assert wr.isOpened(), "cv2 mp4 writer unavailable"
        x0, y0 = int(rng.integers(4, 20)), int(rng.integers(4, 20))
        for t in range(n_frames):
            img = np.zeros((size, size, 3), np.uint8)
            x = min(x0 + 2 * t, size - 12)
            img[y0 : y0 + 12, x : x + 12] = (0, 128, 255)
            wr.write(img)
        wr.release()


def test_iper_config_runs_full_prep_chain(tmp_path):
    """extract -> prepare -> pose_estimation on a synthetic tree, driven by
    the shipped iper.yaml with test-sized overrides (the documented CLI
    override path)."""
    cfg = load_prep_config(os.path.join(
        REPO, "config", "data_preparation", "iper.yaml"))
    raw = str(tmp_path / "raw")
    processed = str(tmp_path / "processed")
    _write_synthetic_videos(raw)
    cfg.update(raw_dir=raw, processed_dir=processed, spatial_size=48,
               flow_delta=2, flow_max=4, num_workers=1,
               flow_estimator="farneback", pose_input_size=32)
    run(cfg)  # mode: all (+ pose, since data.dataset == IperDataset)

    # extract: frames + the full 2-lag grid (i->i+2, i->i+4)
    frames = glob.glob(os.path.join(processed, "vid_0", "frame_*.png"))
    assert len(frames) == 14
    assert os.path.exists(
        os.path.join(processed, "vid_0", "prediction_0_2.flow.npy"))
    assert os.path.exists(
        os.path.join(processed, "vid_0", "prediction_0_4.flow.npy"))
    flow = np.load(
        os.path.join(processed, "vid_0", "prediction_0_2.flow.npy"))
    assert flow.shape == (2, 48, 48)

    # prepare: rectangular multi-lag meta index
    with open(os.path.join(processed, "meta.p"), "rb") as f:
        meta = pickle.load(f)
    assert meta["flow_paths"].shape[1] == 2  # both lags, ascending
    gaps = [int(p.split("_")[-1].split(".")[0]) - int(p.split("_")[-2])
            for p in meta["flow_paths"][0]]
    assert gaps == [2, 4]

    # pose_estimation: keypoints + NN ids landed in meta_kp_nn.p
    with open(os.path.join(processed, "meta_kp_nn.p"), "rb") as f:
        meta_kp = pickle.load(f)
    assert meta_kp["keypoints"].shape[0] == len(meta["img_path"])
    assert meta_kp["kp_nn"].shape[0] == len(meta["img_path"])


def test_test_config_ships_with_reference_schema():
    import yaml

    class _Loader(yaml.SafeLoader):
        pass

    _Loader.add_constructor(
        "tag:yaml.org,2002:python/tuple",
        lambda loader, node: tuple(loader.construct_sequence(node)))
    with open(os.path.join(REPO, "config", "test_config.yaml")) as f:
        cfg = yaml.load(f, Loader=_Loader)
    assert cfg["general"]["experiment"] == "dummy"
    assert cfg["data"]["dataset"] in __datasets__
    assert tuple(cfg["data"]["spatial_size"]) == (128, 128)
