"""Dataset fidelity vs the reference's split/lag/filter logic
(reference data/flow_dataset.py): lag selection from flow-filename frame
gaps, the iPER official train.txt split, per-dataset constants, action
filters, and the h36m lag rule — each checked against an independent
re-computation of the reference's own expressions.
"""

import os

import numpy as np
import pytest

from ipoke_tpu.data.datasets import (
    Human36mDataset,
    IperDataset,
    PlantDataset,
    TaichiDataset,
    VegetationDataset,
    flow_path_frame_gaps,
)


def _meta(n_videos=3, frames_per_video=12, gaps=(4,), prefix="vid"):
    img_path, flow_paths, fid, vid, object_id, train = [], [], [], [], [], []
    for v in range(n_videos):
        for f in range(frames_per_video):
            img_path.append(f"{prefix}{v:03d}_x/frame_{f}.png")
            flow_paths.append([
                f"{prefix}{v:03d}_x/prediction_{f}_{f + g}.flow.npy"
                for g in gaps
            ])
            fid.append(f)
            vid.append(v)
            object_id.append(v % 2)
            train.append(v < n_videos - 1)
    return {"img_path": img_path, "flow_paths": flow_paths, "fid": fid,
            "vid": vid, "object_id": object_id, "train": train}


CFG = {"spatial_size": [32, 32], "max_frames": 3, "poke_size": 3,
       "n_pokes": 2, "augment": False}


def test_lag_selection_matches_reference_rule():
    """Reference flow_dataset.py:103-109: valid lag = argwhere(gaps ==
    max_frames * subsample_step)."""
    gaps = (4, 6, 10)
    ds = PlantDataset(dict(CFG), ["images"], train=True, meta=_meta(gaps=gaps))
    # reference expression, computed independently
    available = np.asarray(gaps)
    right_lag = int(np.argwhere(available == 3 * PlantDataset.subsample_step))
    assert ds.valid_lags == [right_lag] == [1]


def test_lag_selection_orders_shuffled_flow_columns():
    """Columns are natsorted by gap before lag selection (reference :73-74)."""
    meta = _meta(gaps=(10, 6, 4))  # shuffled on disk
    ds = PlantDataset(dict(CFG), ["images"], train=True, meta=meta)
    sel = os.path.basename(str(ds.datadict["flow_paths"][0, ds.valid_lags[0]]))
    assert sel.endswith("_0_6.flow.npy")  # 3 frames * subsample 2


def test_lag_selection_n_ref_frames_override():
    """Reference :110-116: n_ref_frames overrides max_frames."""
    cfg = dict(CFG, n_ref_frames=2)
    ds = PlantDataset(cfg, ["images"], train=True, meta=_meta(gaps=(4, 6, 10)))
    assert ds.valid_lags == [0]  # 2 * subsample 2 = gap 4


def test_lag_selection_falls_back_on_single_lag_synthetic():
    ds = PlantDataset(dict(CFG), ["images"], train=True, meta=_meta(gaps=(4,)))
    assert ds.valid_lags == [0]


def test_h36m_lag_rule():
    """Reference :124-127: h36m lag = 0 for subsample 1, 1 for subsample 2."""
    ds = Human36mDataset(dict(CFG), ["images"], train=True,
                         meta=_meta(gaps=(4, 8)))
    assert ds.subsample_step == 2 and ds.valid_lags == [1]


def test_iper_official_split_train_txt(tmp_path):
    """Reference :430-450: train videos are those whose img_path contains a
    train.txt name with '/' replaced by '_'."""
    meta = _meta(n_videos=4, prefix="")
    # name video dirs like the official iPER layout: 001_1_1 etc
    meta["img_path"] = [p.replace("vid", "").replace(
        f"{v:03d}_x", f"{v + 1:03d}_1_{v % 2 + 1}")
        for p, v in zip(meta["img_path"], meta["vid"])]
    meta["img_path"] = [f"{(v + 1):03d}_1_{v % 2 + 1}/frame_{f}.png"
                        for v, f in zip(meta["vid"], meta["fid"])]
    meta["flow_paths"] = [
        [f"{(v + 1):03d}_1_{v % 2 + 1}/prediction_{f}_{f + 4}.flow.npy"]
        for v, f in zip(meta["vid"], meta["fid"])]
    (tmp_path / "train.txt").write_text("001/1/1\n003/1/1\n")

    cfg = dict(CFG, split="official", filter_flow=False)
    tr = IperDataset(cfg, ["images"], train=True, meta=meta,
                     data_root=str(tmp_path))
    te = IperDataset(cfg, ["images"], train=False, meta=meta,
                     data_root=str(tmp_path))

    # reference expression, independently: np.char.find on raw paths
    paths = np.asarray([str(p) for p in meta["img_path"]])
    expected_train = np.sort(np.unique(np.concatenate([
        np.flatnonzero(np.char.find(paths, n) != -1)
        for n in ("001_1_1", "003_1_1")])))
    expected_test = np.setdiff1d(np.arange(paths.shape[0]), expected_train)

    got_train = np.asarray(
        [os.path.relpath(p, str(tmp_path)) for p in tr.datadict["img_path"]])
    assert set(got_train) == set(paths[expected_train])
    got_test = np.asarray(
        [os.path.relpath(p, str(tmp_path)) for p in te.datadict["img_path"]])
    assert set(got_test) == set(paths[expected_test])
    assert len(tr) + len(te) == len(paths)


def test_iper_action_filter():
    """Reference :133-138: filter 'action' keeps action_id==2 only."""
    meta = _meta(n_videos=4)
    meta["action_id"] = [2 if v < 2 else 1 for v in meta["vid"]]
    cfg = dict(CFG, split="videos", filter="action", filter_flow=False)
    ds = IperDataset(cfg, ["images"], train=True, meta=meta)
    # only videos 0/1 survive; 80/20 per video
    assert set(np.unique(ds.datadict["vid"])) == {0, 1}


def test_per_dataset_constants_match_reference():
    """flow_cutoff / subsample / filter defaults (reference
    _set_instance_specific_values per class)."""
    m = _meta(gaps=(4,))
    plant = PlantDataset(dict(CFG), ["images"], meta=m)
    assert (plant.flow_cutoff, plant.subsample_step,
            plant.obj_weighting) == (0.4, 2, True)
    taichi = TaichiDataset(dict(CFG), ["images"], meta=m)
    assert (taichi.flow_cutoff, taichi.subsample_step,
            taichi.filter_flow, taichi.obj_weighting) == (0.1, 2, True, False)
    iper = IperDataset(dict(CFG), ["images"], meta=m)
    assert (iper.flow_cutoff, iper.subsample_step, iper.filter_flow,
            iper.use_flow_for_weights) == (0.6, 1, True, False)
    h36m = Human36mDataset(dict(CFG), ["images"], meta=m)
    assert (h36m.flow_cutoff, h36m.use_lanczos,
            h36m.use_flow_for_weights) == (0.3, True, True)
    veg = VegetationDataset(dict(CFG), ["images"], meta=m)
    assert (veg.flow_cutoff, veg.filter_flow) == (0.3, False)
    # seq_len_T_chunk parity (reference flow_dataset.py:161-163)
    chunk = plant.seq_len_T_chunk
    ref = {l: c for l, c in enumerate(
        np.linspace(0, 0.4, 3, endpoint=False))}
    ref[3] = 0.4
    assert chunk.keys() == ref.keys()
    np.testing.assert_allclose(
        [chunk[k] for k in ref], [ref[k] for k in ref])


def test_flag_split_taichi():
    meta = _meta(n_videos=3)  # videos 0,1 train; 2 test
    tr = TaichiDataset(dict(CFG), ["images"], train=True, meta=meta)
    te = TaichiDataset(dict(CFG), ["images"], train=False, meta=meta)
    assert set(np.unique(tr.datadict["vid"])) == {0, 1}
    assert set(np.unique(te.datadict["vid"])) == {2}


def test_flow_path_frame_gaps_parser():
    gaps = flow_path_frame_gaps(
        ["a/prediction_3_13.flow.npy", "a/prediction_0_4.flow.npy"])
    np.testing.assert_array_equal(gaps, [10, 4])


def test_iper_nn_index_is_split_local():
    """The kinematics NN must be computed WITHIN the split from split-local
    keypoints (reference flow_dataset.py:790-808); meta['kp_nn'] from prep
    indexes the pre-split frame list and must not leak through."""
    meta = _meta(n_videos=4, frames_per_video=6)
    n = len(meta["img_path"])
    rng = np.random.default_rng(0)
    kps = rng.normal(size=(n, 5, 2)).astype(np.float32)
    meta["keypoints"] = kps
    # poisoned global nn ids: out of range for any split
    meta["kp_nn"] = np.full(n, n + 100, np.int64)

    cfg = dict(CFG, filter_flow=False)
    tr = IperDataset(cfg, ["images"], train=True, meta=meta)
    idx_rng = np.random.default_rng(1)
    got = tr._get_nn_index((0, 0), idx_rng)
    assert 0 <= got < len(tr), "nn index must be split-local"
    # matches an independent recomputation over the split's keypoints
    from ipoke_tpu.eval.pose import keypoint_nearest_neighbors

    expected = keypoint_nearest_neighbors(
        np.asarray(tr.keypoints, np.float32),
        np.asarray(tr.datadict["vid"]))
    assert got == int(expected[0])
    # and the retrieved neighbor is in a different video
    assert tr.datadict["vid"][got] != tr.datadict["vid"][0]
