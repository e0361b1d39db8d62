"""Data layer tests: poke simulation semantics, on-disk pipeline end-to-end,
samplers, loaders."""

import os
import numpy as np
import pytest

from ipoke_tpu.data import (
    FixedLengthSampler,
    FlowError,
    StaticDataModule,
    simulate_poke,
)
from ipoke_tpu.data.prep import make_synthetic_dataset, prepare


def _flow_with_blob(S=64, vx=3.0, vy=-2.0):
    flow = np.zeros((S, S, 2), np.float32)
    flow[20:36, 24:40, 0] = vx
    flow[20:36, 24:40, 1] = vy
    return flow


def test_poke_stamps_flow_values_at_high_motion_pixels():
    flow = _flow_with_blob()
    rng = np.random.default_rng(0)
    poke, centers = simulate_poke(flow, rng, n_pokes_max=1, poke_size=5)
    assert poke.shape == flow.shape
    (r, c) = centers[0]
    assert 20 <= r < 36 and 24 <= c < 40  # center on the moving blob
    # window carries the flow value
    np.testing.assert_allclose(poke[r, c], flow[r, c])
    window = poke[r - 2 : r + 3, c - 2 : c + 3]
    assert np.all(window == flow[r, c])
    # outside the window: zero
    assert np.count_nonzero(np.linalg.norm(poke, axis=-1)) == 25


def test_poke_n_pokes_range_and_centers_fill():
    flow = _flow_with_blob()
    rng = np.random.default_rng(1)
    ns = set()
    for _ in range(20):
        poke, centers = simulate_poke(flow, rng, n_pokes_max=5, poke_size=3)
        n = int((centers[:, 0] >= 0).sum())
        ns.add(n)
        assert 1 <= n <= 5
    assert len(ns) > 1  # actually random in [1, 5]


def test_zero_poke_locations_are_background():
    flow = _flow_with_blob()
    rng = np.random.default_rng(2)
    poke, centers = simulate_poke(
        flow, rng, n_pokes_max=2, poke_size=5, zero_poke=True
    )
    for r, c in centers:
        if r < 0:
            continue
        # background location: zero flow at the poked pixel in the real field
        assert np.linalg.norm(flow[r, c]) == 0.0
    # but values stamped are foreground magnitudes
    assert np.abs(poke).max() > 0


def test_poke_raises_on_constant_flow():
    flow = np.zeros((32, 32, 2), np.float32)
    with pytest.raises(FlowError):
        simulate_poke(flow, np.random.default_rng(0), 1, 5)


def test_fixed_length_sampler_zero_poke_rate():
    s = FixedLengthSampler(120, 10, zero_poke=True, zero_poke_amount=12, seed=3)
    ids = [i for batch in s for i in batch]
    assert len(ids) == 120
    assert ids.count(-1) == 10  # 120/12
    # new epoch -> different permutation
    s.set_epoch(1)
    ids2 = [i for batch in s for i in batch]
    assert ids2 != ids


def test_on_disk_pipeline_end_to_end(tmp_path):
    root = str(tmp_path / "plants")
    meta = make_synthetic_dataset(root, n_videos=4, n_frames=16,
                                  spatial_size=64, flow_delta=5)
    assert len(meta["img_path"]) > 0
    cfg = {
        "dataset": "PlantDataset", "spatial_size": (32, 32), "max_frames": 3,
        "batch_size": 2, "n_workers": 2, "poke_size": 3, "n_pokes": 2,
        "zero_poke": True, "zero_poke_amount": 4, "augment": True,
        "p_col": 0.5, "p_geom": 0.5, "augment_b": 0.2, "augment_c": 0.2,
        "augment_h": 0.1, "augment_s": 0.2, "aug_deg": 10,
        "aug_trans": (0.1, 0.1), "scale_poke_to_res": True,
        "yield_videos": True,
    }
    dm = StaticDataModule(cfg, ["images", "poke", "flow"], data_root=root)
    batches = list(dm.train_loader(epoch=0, n_batches=3))
    assert len(batches) >= 1
    b = batches[0]
    assert b["images"].shape == (2, 4, 32, 32, 3)
    assert b["flow"].shape == (2, 32, 32, 2)
    assert b["poke"].shape == (2, 32, 32, 2)
    assert b["poke_coords"].shape == (2, 2, 2)
    assert b["images"].min() >= -1.0 and b["images"].max() <= 1.0
    # determinism: same epoch -> identical batches
    b2 = next(iter(dm.train_loader(epoch=0, n_batches=1)))
    np.testing.assert_allclose(b["images"], b2["images"])
    # flow magnitudes rescaled for the 64->32 resize
    assert np.abs(b["flow"]).max() <= 16.0


def test_val_split_disjoint(tmp_path):
    root = str(tmp_path / "ds")
    make_synthetic_dataset(root, n_videos=5, n_frames=12, spatial_size=32,
                           flow_delta=4)
    cfg = {"dataset": "PlantDataset", "spatial_size": (32, 32),
           "max_frames": 2, "batch_size": 2, "yield_videos": True,
           "poke_size": 3, "n_pokes": 1}
    dm = StaticDataModule(cfg, ["images"], data_root=root)
    train_vids = set(dm.dset_train.datadict["vid"].tolist())
    val_vids = set(dm.dset_val.datadict["vid"].tolist())
    assert train_vids and val_vids
    assert train_vids.isdisjoint(val_vids)


def test_fancy_aug_recolors_background_only(tmp_path, monkeypatch):
    """fancy_aug (reference base_dataset.py:405-440): img_aT's first/last
    frames get an independent BACKGROUND color transform while foreground
    pixels stay untouched."""
    import ipoke_tpu.data.datasets as D

    root = str(tmp_path / "d")
    make_synthetic_dataset(root, n_videos=2, n_frames=10, spatial_size=32,
                           flow_delta=4)
    # deterministic half-image "foreground"
    half = np.zeros((32, 32), bool)
    half[:, :16] = True
    monkeypatch.setattr(D, "compute_grabcut_mask", lambda img, **kw: half)

    cfg = {"spatial_size": [32, 32], "max_frames": 3, "poke_size": 3,
           "n_pokes": 1, "augment": True, "p_col": 1.0, "augment_b": 0.4,
           "fancy_aug": True}
    ds = D.PlantDataset(dict(cfg), ["images", "img_aT"], train=True,
                        data_root=root)
    rng = np.random.default_rng(0)
    item = ds.get_item(0, rng)
    imgs, imgs_at = item["images"], item["img_aT"]
    assert imgs_at.shape == imgs.shape
    # background of the first frame was re-colored vs an un-fb run
    ds.fancy_aug = False
    item2 = ds.get_item(0, np.random.default_rng(0))
    at_plain = item2["img_aT"]
    bg0 = np.abs(imgs_at[0][:, 16:] - at_plain[0][:, 16:]).max()
    fg0 = np.abs(imgs_at[0][:, :16] - at_plain[0][:, :16]).max()
    assert bg0 > 1e-3, "background of frame 0 must be re-colored"
    assert fg0 < 1e-6, "foreground must be untouched"
    # middle frames identical in both runs
    assert np.allclose(imgs_at[1], at_plain[1])


def test_color_apply_clip_matches_per_frame():
    """The vectorized clip-level color jitter (augment.apply_clip) is
    numerically identical to the per-frame path (per-image contrast mean,
    one exact (T*H, W, C) HSV reshape)."""
    from ipoke_tpu.data.augment import _ColorTransform

    rng = np.random.default_rng(3)
    clip = rng.integers(0, 256, (5, 24, 20, 3), dtype=np.uint8)
    for b, c, h, s in [(1.2, 0.8, 0.05, 1.3), (0.7, 1.4, 0.0, 1.0),
                       (1.0, 1.0, 0.1, 0.6)]:
        t = _ColorTransform(b, c, h, s)
        batched = t.apply_clip(clip)
        per_frame = np.stack([t.apply_clip(f[None])[0] for f in clip])
        np.testing.assert_array_equal(batched, per_frame)
        assert batched.dtype == np.uint8
        # LUT brightness/contrast matches the straight float pipeline to
        # <= 1 gray level (mean summation order is the only difference)
        if h == 0.0 and s == 1.0:
            ref = clip.astype(np.float32)
            ref = np.clip(ref * b, 0, 255)
            m = ref.mean(axis=(1, 2, 3), keepdims=True)
            ref = np.clip((ref - m) * c + m, 0, 255).astype(np.uint8)
            diff = np.abs(batched.astype(np.int16) - ref.astype(np.int16))
            assert diff.max() <= 1, diff.max()


def test_identity_augment_is_skipped_exactly():
    """A probability-gated identity transform must return the input
    bit-exactly (the reference applies NO transform when the gate fails;
    the old float round-trip could shift pixels by one via truncation)."""
    from ipoke_tpu.data.augment import _ColorTransform, _GeomTransform

    rng = np.random.default_rng(4)
    clip = rng.integers(0, 256, (3, 16, 16, 3), dtype=np.uint8)
    ct = _ColorTransform(1.0, 1.0, 0.0, 1.0)
    assert ct.is_identity
    assert ct.apply_clip(clip) is clip
    gt = _GeomTransform(0.0, 0, 0)
    assert gt.is_identity
    img = clip[0].astype(np.float32)
    np.testing.assert_array_equal(gt(img), img)
    flow = rng.standard_normal((16, 16, 2)).astype(np.float32)
    np.testing.assert_array_equal(gt.apply_flow(flow), flow)


def test_frame_cache_bit_exact_and_stale_invalidation(tmp_path):
    """`frame_cache: raw` must return byte-identical frames to the direct
    decode path (it stores the decoder's own output), survive concurrent
    worker writes, and refuse a cache entry older than its source frame."""
    root = str(tmp_path / "plants")
    make_synthetic_dataset(root, n_videos=2, n_frames=10, spatial_size=64,
                           flow_delta=5)
    cfg = {
        "dataset": "PlantDataset", "spatial_size": (32, 32), "max_frames": 3,
        "batch_size": 2, "n_workers": 0, "poke_size": 3, "n_pokes": 1,
        "yield_videos": True,
    }
    plain = StaticDataModule(cfg, ["images"], data_root=root).dset_train
    cached_cfg = dict(cfg, frame_cache="raw",
                      frame_cache_dir=str(tmp_path / "fc"))
    cached = StaticDataModule(cached_cfg, ["images"],
                              data_root=root).dset_train
    n = cached.populate_frame_cache()
    assert n == len(np.unique(cached.datadict["img_path"]))
    for p in np.unique(plain.datadict["img_path"])[:4]:
        a = plain._load_img(str(p))
        b = cached._load_img(str(p))   # served from cache
        assert a.dtype == b.dtype == np.uint8
        np.testing.assert_array_equal(a, b)
    # stale invalidation: touching the source forces a re-decode (and the
    # refreshed entry must again match)
    p = str(np.unique(plain.datadict["img_path"])[0])
    cpath = cached._frame_cache_path(p, False)
    os.utime(p, None)  # source newer than cache now
    before = os.path.getmtime(cpath)
    b = cached._load_img(p)
    np.testing.assert_array_equal(plain._load_img(p), b)
    assert os.path.getmtime(cpath) >= before
