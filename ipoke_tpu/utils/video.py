"""Video/flow visualization and export (reference ``utils/logging.py``).

Grid builders + mp4 writers for sample logging; flow colorization for
inspecting pokes.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def to_uint8(video: np.ndarray) -> np.ndarray:
    """[-1, 1] float -> uint8."""
    return np.clip((video + 1.0) * 127.5, 0, 255).astype(np.uint8)


def flow_to_rgb(flow: np.ndarray, max_mag: Optional[float] = None) -> np.ndarray:
    """HSV flow colorization (reference ``utils/logging.py`` vis_flow)."""
    import cv2

    mag = np.linalg.norm(flow, axis=-1)
    ang = np.arctan2(flow[..., 1], flow[..., 0])
    max_mag = max_mag or max(mag.max(), 1e-6)
    hsv = np.zeros((*flow.shape[:-1], 3), np.uint8)
    hsv[..., 0] = ((ang + np.pi) / (2 * np.pi) * 180).astype(np.uint8)
    hsv[..., 1] = 255
    hsv[..., 2] = np.clip(mag / max_mag * 255, 0, 255).astype(np.uint8)
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)


def make_grid(frames: np.ndarray, n_per_row: int) -> np.ndarray:
    """(N, H, W, 3) -> one tiled image."""
    n, h, w, c = frames.shape
    rows = -(-n // n_per_row)
    pad = rows * n_per_row - n
    if pad:
        frames = np.concatenate(
            [frames, np.zeros((pad, h, w, c), frames.dtype)])
    return (frames.reshape(rows, n_per_row, h, w, c)
            .transpose(0, 2, 1, 3, 4).reshape(rows * h, n_per_row * w, c))


def save_video(video: np.ndarray, path: str, fps: int = 3):
    """(T, H, W, 3) float [-1,1] or uint8 -> mp4 (cv2 VideoWriter, reference
    ``utils/logging.py:797``)."""
    import cv2

    if video.dtype != np.uint8:
        video = to_uint8(video)
    t, h, w, _ = video.shape
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for frame in video:
        writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
    writer.release()


def save_video_grid(videos: np.ndarray, path: str, fps: int = 3):
    """(B, S, T, H, W, 3) -> one mp4, B rows x S columns."""
    b, s, t, h, w, c = videos.shape
    frames = []
    for ti in range(t):
        frame = videos[:, :, ti].reshape(b * s, h, w, c)
        frames.append(make_grid(frame, n_per_row=s))
    save_video(np.stack(frames), path, fps=fps)
