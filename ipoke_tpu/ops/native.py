"""ctypes bindings for the C++ runtime components (``native/``), with pure
numpy fallbacks so the framework works before ``make -C native`` has run.

Provides: box NMS, OKS keypoint NMS (pose-eval path; replaces the reference's
Cython/CUDA NMS), and the fused .npy flow load+resize used by the input
pipeline.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB = None
_TRIED = False


def _repo_root():
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def build_native(quiet: bool = True) -> bool:
    """Compile the shared library (g++); returns success."""
    d = os.path.join(_repo_root(), "native")
    try:
        subprocess.run(["make", "-C", d],
                       check=True,
                       capture_output=quiet)
        return True
    except Exception:
        return False


def _load():
    global _LIB, _TRIED
    if os.environ.get("IPOKE_NATIVE", "1") == "0":
        return None  # kill switch: forces the numpy/cv2 fallbacks (A/B + CI)
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    d = os.path.join(_repo_root(), "native")
    path = os.path.join(d, "libipoke_native.so")
    src = os.path.join(d, "ipoke_native.cpp")
    stale = (not os.path.exists(path)
             or (os.path.exists(src)
                 and os.path.getmtime(src) > os.path.getmtime(path)))
    if stale:  # also rebuilds a lib older than the source (new symbols)
        build_native()
    if os.path.exists(path):
        lib = ctypes.CDLL(path)
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int)
        lib.nms_boxes.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_float,
                                  i32p, i32p]
        lib.nms_oks.argtypes = [f32p, f32p, f32p, ctypes.c_int, ctypes.c_int,
                                f32p, ctypes.c_float, i32p, i32p]
        lib.load_flow_npy.argtypes = [ctypes.c_char_p, f32p, ctypes.c_int,
                                      ctypes.c_int, ctypes.c_int]
        lib.load_flow_npy.restype = ctypes.c_int
        lib.flow_amplitude_stats.argtypes = [f32p, ctypes.c_int, ctypes.c_int,
                                             ctypes.c_int, f32p, f32p, f32p,
                                             f32p]
        u8p = ctypes.POINTER(ctypes.c_ubyte)
        lib.decode_png_rgb_resize.argtypes = [ctypes.c_char_p, u8p,
                                              ctypes.c_int, ctypes.c_int]
        lib.decode_png_rgb_resize.restype = ctypes.c_int
        lib.color_jitter_clip.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                          ctypes.c_int, ctypes.c_float,
                                          ctypes.c_float, ctypes.c_float,
                                          ctypes.c_float]
        lib.color_jitter_clip.restype = ctypes.c_int
        _LIB = lib
    return _LIB


def native_available() -> bool:
    return _load() is not None


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ip(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def nms_boxes(boxes: np.ndarray, scores: np.ndarray,
              iou_thresh: float = 0.5) -> np.ndarray:
    """Greedy box NMS; returns kept indices (descending score order)."""
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    n = boxes.shape[0]
    lib = _load()
    if lib is not None:
        keep = np.empty(n, np.int32)
        n_keep = np.zeros(1, np.int32)
        lib.nms_boxes(_fp(boxes), _fp(scores), n, ctypes.c_float(iou_thresh),
                      _ip(keep), _ip(n_keep))
        return keep[: n_keep[0]].copy()
    # numpy fallback
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(n, bool)
    areas = np.maximum(0, boxes[:, 2] - boxes[:, 0]) * np.maximum(
        0, boxes[:, 3] - boxes[:, 1])
    for i in order:
        if suppressed[i]:
            continue
        keep.append(int(i))
        xx1 = np.maximum(boxes[i, 0], boxes[:, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[:, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[:, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.maximum(0, xx2 - xx1) * np.maximum(0, yy2 - yy1)
        iou = inter / (areas[i] + areas - inter + 1e-10)
        suppressed |= iou > iou_thresh
        suppressed[i] = True
    return np.asarray(keep, np.int32)


def nms_oks(kps: np.ndarray, scores: np.ndarray, areas: np.ndarray,
            thresh: float = 0.9,
            sigmas: Optional[np.ndarray] = None) -> np.ndarray:
    """OKS NMS over pose candidates; kps (n, k, 3)."""
    kps = np.ascontiguousarray(kps, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    areas = np.ascontiguousarray(areas, np.float32)
    n, k = kps.shape[:2]
    lib = _load()
    if lib is not None:
        keep = np.empty(n, np.int32)
        n_keep = np.zeros(1, np.int32)
        sp = _fp(np.ascontiguousarray(sigmas, np.float32)) if sigmas is not None \
            else ctypes.cast(None, ctypes.POINTER(ctypes.c_float))
        lib.nms_oks(_fp(kps), _fp(scores), _fp(areas), n, k, sp,
                    ctypes.c_float(thresh), _ip(keep), _ip(n_keep))
        return keep[: n_keep[0]].copy()
    # numpy fallback
    if sigmas is None:
        base = np.asarray([0.026, 0.025, 0.025, 0.035, 0.035, 0.079, 0.079,
                           0.072, 0.072, 0.062, 0.062, 0.107, 0.107, 0.087,
                           0.087, 0.089, 0.089], np.float32)
        sigmas = base[np.arange(k) % 17]

    def oks(a, b, area):
        d2 = (a[:, 0] - b[:, 0]) ** 2 + (a[:, 1] - b[:, 1]) ** 2
        e = d2 / (2 * area * (2 * sigmas) ** 2 + 1e-10)
        return float(np.mean(np.exp(-e)))

    order = np.argsort(-scores)
    suppressed = np.zeros(n, bool)
    keep = []
    for oi, i in enumerate(order):
        if suppressed[i]:
            continue
        keep.append(int(i))
        for j in order[oi + 1:]:
            if not suppressed[j] and oks(kps[i], kps[j], areas[i]) > thresh:
                suppressed[j] = True
    return np.asarray(keep, np.int32)


def decode_png(path: str, out_h: int, out_w: int) -> Optional[np.ndarray]:
    """Fused PNG decode + RGB + bilinear resize to (out_h, out_w, 3) uint8 —
    the loader's hottest leg (replaces cv2.imread + cvtColor + resize, three
    full-image passes).  Returns None if the native lib is unavailable or the
    file is unsupported (caller falls back to cv2).  Resize convention is
    half-pixel centers like cv2.INTER_LINEAR; fixed-point rounding can differ
    from cv2 by at most 1 uint8 level (tests/test_native_ops.py)."""
    lib = _load()
    if lib is None or not hasattr(lib, "decode_png_rgb_resize"):
        return None
    out = np.empty((out_h, out_w, 3), np.uint8)
    rc = lib.decode_png_rgb_resize(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        out_h, out_w)
    return out if rc == 0 else None


def color_jitter_clip(clip_u8: np.ndarray, b: float, c: float, h: float,
                      s: float) -> Optional[np.ndarray]:
    """Single-pass fused brightness/contrast LUT + HSV hue/sat jitter over a
    (T, H, W, 3) uint8 clip, cv2-semantics-compatible (OpenCV fixed-point u8
    HSV both ways, numpy-style uint8 truncation after the float jitter).
    Returns a new array, or None when the native lib is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "color_jitter_clip"):
        return None
    out = np.ascontiguousarray(clip_u8, np.uint8).copy()
    t, hh, ww, cc = out.shape
    assert cc == 3, out.shape
    # hue offset pre-scaled in float64 THEN rounded to f32 — numpy's scalar
    # promotion order in the fallback path (f32(h*180.0), not f32(h)*180)
    rc = lib.color_jitter_clip(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), t, hh, ww,
        ctypes.c_float(b), ctypes.c_float(c), ctypes.c_float(h * 180.0),
        ctypes.c_float(s))
    return out if rc == 0 else None


def load_flow(path: str, out_h: int, out_w: int,
              scale_to_res: bool = False) -> Optional[np.ndarray]:
    """Fused .npy (2,H,W) load + bilinear resize to (out_h, out_w, 2).
    Returns None if the native lib is unavailable or the file is unsupported
    (caller falls back to np.load + cv2)."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((out_h, out_w, 2), np.float32)
    rc = lib.load_flow_npy(path.encode(), _fp(out), out_h, out_w,
                           int(scale_to_res))
    return out if rc == 0 else None
