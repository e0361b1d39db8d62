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


def test_decode_png_same_size_bit_exact(tmp_path):
    """No-resize decode must equal cv2.imread+cvtColor exactly (PNG is
    lossless)."""
    import cv2

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (64, 48, 3), np.uint8)
    p = str(tmp_path / "img.png")
    assert cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    out = native.decode_png(p, 64, 48)
    assert out is not None, "native PNG decode unavailable"
    np.testing.assert_array_equal(out, img)


def test_decode_png_resize_matches_cv2(tmp_path):
    """Fused decode+resize vs cv2.resize INTER_LINEAR: same half-pixel
    sampling; fixed-point rounding may differ by at most 1 uint8 level."""
    import cv2

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (256, 256, 3), np.uint8)
    p = str(tmp_path / "img.png")
    assert cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    # the shipped prep layout (stored 256px -> train 128px) is BIT-EXACT;
    # non-dyadic scales differ by <=1 uint8 level on ~11% of pixels (cv2
    # quantizes interpolation weights to 11-bit fixed point, we use float)
    out = native.decode_png(p, 128, 128)
    ref = cv2.resize(img, (128, 128), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_array_equal(out, ref)
    out = native.decode_png(p, 96, 80)
    ref = cv2.resize(img, (80, 96), interpolation=cv2.INTER_LINEAR)
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.max() <= 1, diff.max()
    assert (diff == 0).mean() > 0.85, (diff == 0).mean()


def test_color_jitter_native_matches_python():
    """Fused native jitter vs the numpy/cv2 path across the full transform
    grid (brightness/contrast only, hue/sat only, both)."""
    from unittest import mock

    from ipoke_tpu.data.augment import _ColorTransform

    rng = np.random.default_rng(5)
    clip = rng.integers(0, 256, (3, 32, 40, 3), np.uint8)
    cases = [
        (1.3, 0.7, 0.0, 1.0),    # brightness+contrast only (pure LUT)
        (1.0, 1.0, 0.08, 1.3),   # hue+sat only (integer HSV both ways)
        (0.7, 1.4, -0.1, 0.6),   # everything
        (1.0, 1.0, 0.3, 1.0),    # hue wrap
    ]
    for b, c, h, s in cases:
        tr = _ColorTransform(b, c, h, s)
        got = native.color_jitter_clip(clip, b, c, h, s)
        assert got is not None, "native jitter unavailable"
        with mock.patch("ipoke_tpu.ops.native.color_jitter_clip",
                        return_value=None):
            want = tr.apply_clip(clip.copy())
        diff = np.abs(got.astype(int) - want.astype(int))
        # tolerance: <=1 uint8 level.  Exactness to cv2 is ill-defined at
        # this magnitude: cv2's OWN u8 HSV2RGB differs by 1 between its SIMD
        # (clip-level cvtColor) and scalar (1x1 cvtColor) paths — verified
        # while building this test.  b/c-only (pure LUT) is bit-exact.
        assert diff.max() <= 1, (b, c, h, s, diff.max())
        assert (diff == 0).mean() > 0.9, ((b, c, h, s), (diff == 0).mean())
        if h == 0.0 and s == 1.0:
            assert diff.max() == 0, "LUT-only case must be bit-exact"


def test_loader_img_path_uses_native_decode(tmp_path):
    """VideoDataset._load_img returns the same pixels through the native fast
    path as through the cv2 fallback."""
    import cv2
    from unittest import mock

    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (256, 256, 3), np.uint8)
    p = str(tmp_path / "frame_0.png")
    assert cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))

    class Holder:
        use_lanczos = False
        spatial_size = (128, 128)
        frame_cache = "none"
        frame_cache_dir = None

    from ipoke_tpu.data.datasets import VideoDataset

    fast = VideoDataset._decode_img(Holder(), p, False)
    with mock.patch("ipoke_tpu.ops.native.decode_png", return_value=None):
        slow = VideoDataset._decode_img(Holder(), p, False)
    assert np.abs(fast.astype(int) - slow.astype(int)).max() <= 1


def test_native_flow_loader_rejects_bad_file(tmp_path):
    p = str(tmp_path / "bad.npy")
    np.save(p, np.zeros((3, 4), np.float64))
    assert native.load_flow(p, 8, 8) is None
    with open(str(tmp_path / "junk.npy"), "wb") as f:
        f.write(b"not an npy")
    assert native.load_flow(str(tmp_path / "junk.npy"), 8, 8) is None
