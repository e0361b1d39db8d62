"""Native (C++) runtime component tests: NMS and fused flow loading,
checked against the pure numpy fallbacks."""

import os

import numpy as np
import pytest

from ipoke_tpu.ops import native


@pytest.fixture(scope="module", autouse=True)
def built():
    assert native.build_native(), "native build failed"
    assert native.native_available()


def test_nms_boxes_matches_fallback():
    rng = np.random.default_rng(0)
    n = 50
    xy = rng.uniform(0, 100, (n, 2))
    wh = rng.uniform(5, 30, (n, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    keep_native = native.nms_boxes(boxes, scores, 0.5)
    # force fallback
    lib, native._LIB = native._LIB, None
    tried, native._TRIED = native._TRIED, True
    try:
        keep_np = native.nms_boxes(boxes, scores, 0.5)
    finally:
        native._LIB, native._TRIED = lib, tried
    np.testing.assert_array_equal(keep_native, keep_np)
    assert len(keep_native) < n  # something suppressed


def test_nms_oks_suppresses_duplicates():
    rng = np.random.default_rng(1)
    base = rng.uniform(0, 64, (17, 2))
    kps = np.stack([
        np.concatenate([base, np.ones((17, 1))], -1),                 # A
        np.concatenate([base + 0.5, np.ones((17, 1))], -1),           # ~A dup
        np.concatenate([base + 40.0, np.ones((17, 1))], -1),          # far B
    ]).astype(np.float32)
    scores = np.asarray([0.9, 0.8, 0.7], np.float32)
    areas = np.full(3, 64.0 * 64.0, np.float32)
    keep = native.nms_oks(kps, scores, areas, thresh=0.5)
    assert 0 in keep and 2 in keep and 1 not in keep


def test_native_flow_loader_matches_python(tmp_path):
    rng = np.random.default_rng(2)
    flow = rng.normal(0, 3, (2, 48, 40)).astype(np.float32)
    p = str(tmp_path / "f.flow.npy")
    np.save(p, flow)
    out = native.load_flow(p, 32, 32, scale_to_res=True)
    assert out is not None and out.shape == (32, 32, 2)

    import cv2

    ref = flow / (flow.shape[1] / 32.0)
    ref = cv2.resize(np.transpose(ref, (1, 2, 0)), (32, 32),
                     interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_native_flow_loader_rejects_bad_file(tmp_path):
    p = str(tmp_path / "bad.npy")
    np.save(p, np.zeros((3, 4), np.float64))
    assert native.load_flow(p, 8, 8) is None
    with open(str(tmp_path / "junk.npy"), "wb") as f:
        f.write(b"not an npy")
    assert native.load_flow(str(tmp_path / "junk.npy"), 8, 8) is None
