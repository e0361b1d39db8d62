"""Metric-integrity + reference-config-compatibility regressions (round-2
judge findings): derived (not post-hoc) direction-correlation order, explicit
keypoint-layout alignment instead of silent truncation, lanczos gating, and
case-tolerant experiment-registry lookup."""

import numpy as np
import pytest


def test_aligned_joints_passthrough_and_refusal():
    from ipoke_tpu.cli.testing import _JOINT_LAYOUT_MAPS, _aligned_joints

    a = np.random.default_rng(0).normal(size=(4, 17, 2))
    b = np.random.default_rng(1).normal(size=(4, 17, 2))
    kp, kg = _aligned_joints(a, b)
    np.testing.assert_array_equal(kp, a)
    np.testing.assert_array_equal(kg, b)

    # mismatched joint counts must REFUSE (no silent common-prefix MSE)
    with pytest.raises(ValueError, match="layout mismatch"):
        _aligned_joints(a, b[:, :13])

    # ... unless an explicit index map is registered
    _JOINT_LAYOUT_MAPS[(17, 13)] = (tuple(range(13)), tuple(range(13)))
    try:
        kp, kg = _aligned_joints(a, b[:, :13])
        assert kp.shape == kg.shape == (4, 13, 2)
    finally:
        del _JOINT_LAYOUT_MAPS[(17, 13)]


def test_direction_correlation_is_single_derived_number():
    """The reported correlation must be the (dx, dy)-order one — pokes copy
    flow values verbatim and both the flow files and the Farneback response
    are (dx, dy) — not a post-hoc max over both orders."""
    import inspect

    from ipoke_tpu.cli import testing

    src = inspect.getsource(testing.test_control_sensitivity)
    assert "max(m_xy, m_yx)" not in src
    assert '"direction_correlation": m_xy' in src


def test_registry_accepts_reference_casing():
    """The reference registry key `poke_encoder_FC`
    (ref experiments/__init__.py:19) must resolve."""
    from ipoke_tpu.cli.experiments import select_experiment
    from ipoke_tpu.core.config import Config

    cls_upper = select_experiment(
        Config({"general": {"experiment": "poke_encoder_FC"}}))
    cls_lower = select_experiment(
        Config({"general": {"experiment": "poke_encoder_fc"}}))
    assert cls_upper is cls_lower

    with pytest.raises(AssertionError, match="unknown experiment"):
        select_experiment(Config({"general": {"experiment": "nope"}}))


def test_h36m_lanczos_gated_on_64(tmp_path, monkeypatch):
    """Reference base_dataset.py:411: lanczos only when spatial_size == 64."""
    import cv2

    from ipoke_tpu.data.datasets import Human36mDataset

    img_path = str(tmp_path / "frame_0.png")
    cv2.imwrite(img_path, np.zeros((96, 96, 3), np.uint8))
    meta = {"img_path": ["frame_0.png"] * 4,
            "flow_paths": [["prediction_0_4.flow.npy"]] * 4,
            "fid": [0, 1, 2, 3], "vid": [0] * 4, "object_id": [0] * 4,
            "train": [True] * 4}

    used = []
    real_resize = cv2.resize

    def spy(img, size, interpolation=None, **kw):
        used.append(interpolation)
        return real_resize(img, size, interpolation=interpolation, **kw)

    monkeypatch.setattr(cv2, "resize", spy)
    for size, expect in ((64, cv2.INTER_LANCZOS4), (128, cv2.INTER_LINEAR)):
        cfg = {"spatial_size": [size, size], "max_frames": 3, "poke_size": 3,
               "n_pokes": 1, "augment": False, "data_root": str(tmp_path)}
        ds = Human36mDataset(cfg, ["images"], meta=meta)
        used.clear()
        ds._load_img(img_path)
        assert used == [expect], (size, used)
