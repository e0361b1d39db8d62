"""Pose estimation for keypoint metrics and iPER metadata.

JAX port of the reference's vendored SimpleBaselines pose-ResNet inference
(``models/pose_estimator/lib/models/pose_resnet.py``: torch-BatchNorm ResNet
bottleneck backbone + 3 ConvTranspose(k4,s2,p1) deconv layers + 1x1 head ->
K heatmaps) and the heatmap decoding ``get_max_preds``
(``lib/core/inference.py``), used by ``utils/posenet_wrapper.py`` for the
keypoint accuracy metrics and by data prep for iPER keypoint/NN metadata.
Candidate suppression uses the native OKS NMS (``ipoke_tpu.ops.native``)
instead of the reference's Cython/CUDA kernels.

The backbone uses frozen inference-mode BatchNorm (running stats as
``batch_stats`` leaves, like ``eval/i3d.py``) so the reference's
pose_resnet152 COCO weights drop in unchanged via
``load_torch_pose_resnet_npz`` (oracle heatmap parity:
tests/test_pose.py::test_pose_resnet_torch_parity).  Without a weight file
the net is fixed-seed random — the keypoint *machinery* stays exact.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

_BN = dict(use_running_average=True, epsilon=1e-5)


class _Bottleneck(nn.Module):
    """torch Bottleneck (pose_resnet.py:62-105): 1x1 -> 3x3(stride) -> 1x1
    with BN after each conv; 1x1-BN downsample when shape changes."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = jax.nn.relu(nn.BatchNorm(**_BN, name="bn1")(out))
        out = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = jax.nn.relu(nn.BatchNorm(**_BN, name="bn2")(out))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = nn.BatchNorm(**_BN, name="bn3")(out)
        residual = x
        if self.downsample:
            residual = nn.Conv(self.planes * 4, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = nn.BatchNorm(**_BN, name="downsample_bn")(residual)
        return jax.nn.relu(out + residual)


class PoseResNet(nn.Module):
    """Weight-compatible SimpleBaselines pose net: ResNet bottleneck backbone
    + deconv head -> (B, H/4, W/4, n_joints) heatmaps.

    layers (3,8,36,3) = the reference's pose_resnet152
    (config/posenet.yaml: NUM_LAYERS 152, 3 deconvs of 256 k4, final k1)."""

    n_joints: int = 17
    layers: Sequence[int] = (3, 4, 6, 3)  # resnet50; (3,8,36,3) = resnet152
    deconv_channels: int = 256
    n_deconv: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        h = jax.nn.relu(nn.BatchNorm(**_BN, name="bn1")(h))
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, (planes, n) in enumerate(zip((64, 128, 256, 512), self.layers)):
            for j in range(n):
                stride = 2 if (i > 0 and j == 0) else 1
                down = j == 0  # first block always projects (64 -> 256 too)
                h = _Bottleneck(planes, stride, downsample=down,
                                dtype=self.dtype,
                                name=f"layer{i + 1}_{j}")(h)
        for m in range(self.n_deconv):
            # torch ConvTranspose2d(k4, s2, p1, op0) == flax VALID transpose
            # + crop 1 px on every side (proven in tests/test_pose.py)
            h = nn.ConvTranspose(
                self.deconv_channels, (4, 4), strides=(2, 2),
                padding="VALID", transpose_kernel=True, use_bias=False,
                dtype=self.dtype, name=f"deconv{m}")(h)
            h = h[:, 1:-1, 1:-1, :]
            h = jax.nn.relu(nn.BatchNorm(**_BN, name=f"deconv_bn{m}")(h))
        return nn.Conv(self.n_joints, (1, 1), dtype=self.dtype,
                       name="final")(h)


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
                 variables: Optional[Any] = None, input_size: int = 64,
                 layers: Sequence[int] = (3, 4, 6, 3)):
        self.model = PoseResNet(n_joints=n_joints, layers=tuple(layers))
        self.input_size = input_size
        if variables is None:
            variables = self.model.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, input_size, input_size, 3)))
        self.variables = variables
        self._fn = jax.jit(lambda v, x: self.model.apply(v, x))

    def __call__(self, frames: jnp.ndarray) -> np.ndarray:
        """frames (B, H, W, 3) -> keypoints (B, K, 2) in (x, y) pixels."""
        H = frames.shape[1]
        hm = self._fn(self.variables, frames)
        coords, _ = get_max_preds(hm)
        scale = H / hm.shape[1]
        return np.asarray(coords) * scale


def keypoint_mse(kps_a: np.ndarray, kps_b: np.ndarray,
                 norm: float = 1.0) -> np.ndarray:
    """Per-sample mean squared keypoint distance (reference ``KPSMetric``,
    utils/metrics.py:324-396)."""
    d = (np.asarray(kps_a) - np.asarray(kps_b)) / norm
    return np.mean(np.sum(d**2, axis=-1), axis=-1)


def pose_estimator_from_env(input_size: int,
                            variables: Optional[Any] = None
                            ) -> "PoseEstimator":
    """The one place that resolves pose weights: explicit ``variables``, else
    ``IPOKE_POSE_WEIGHTS`` (converted pose_resnet152 npz), else fixed-seed
    resnet50.  The stage plan is INFERRED from the param tree, so a
    mismatched default can never silently truncate the network (flax apply
    only looks up the submodules it uses)."""
    import os

    if variables is None:
        wpath = os.environ.get("IPOKE_POSE_WEIGHTS")
        if wpath:
            variables = load_torch_pose_resnet_npz(wpath)
    if variables is not None:
        p = variables["params"]
        layers = tuple(
            max(int(k.split("_")[1]) for k in p if k.startswith(f"layer{s}_"))
            + 1 for s in (1, 2, 3, 4))
    else:
        layers = (3, 4, 6, 3)
    return PoseEstimator(variables=variables, input_size=input_size,
                         layers=layers)


def keypoint_nearest_neighbors(kps: np.ndarray, exclude_same: np.ndarray,
                               chunk: int = 1024) -> np.ndarray:
    """For each sample, the index of its keypoint-space nearest neighbor with
    a different group id (reference data prep ``meta_kp_nn.p``,
    prepare_dataset.py:461-516; the reference chunks this per-id over 70
    workers, flow_dataset.py:780-808).

    Row-chunked: memory is O(chunk * n) instead of the dense (n, n, 2K)
    difference tensor (which is petabytes at real iPER scale)."""
    flat = kps.reshape(kps.shape[0], -1).astype(np.float64)
    n = flat.shape[0]
    sq = np.sum(flat**2, axis=1)
    out = np.empty(n, np.int64)
    groups = np.asarray(exclude_same)
    for i0 in range(0, n, chunk):
        i1 = min(i0 + chunk, n)
        # |a-b|^2 = |a|^2 + |b|^2 - 2ab
        d2 = sq[i0:i1, None] + sq[None, :] - 2.0 * (flat[i0:i1] @ flat.T)
        d2[groups[i0:i1, None] == groups[None, :]] = np.inf
        out[i0:i1] = np.argmin(d2, axis=1)
    return out


# ---------------------------------------------------------------------------
# torch weight conversion
# ---------------------------------------------------------------------------

def _conv_w(w):  # torch (out, in, kh, kw) -> flax (kh, kw, in, out)
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _convT_w(w):  # torch (in, out, kh, kw) -> flax transpose_kernel (kh, kw, out, in)
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def convert_torch_pose_resnet(state: dict, layers: Sequence[int],
                              n_deconv: int = 3) -> dict:
    """torch pose_resnet state_dict (numpy leaves) -> flax variables
    {params, batch_stats}; key layout per pose_resnet.py."""
    P, S = {}, {}

    def bn(dst, src):
        P[dst] = {"scale": np.asarray(state[f"{src}.weight"]),
                  "bias": np.asarray(state[f"{src}.bias"])}
        S[dst] = {"mean": np.asarray(state[f"{src}.running_mean"]),
                  "var": np.asarray(state[f"{src}.running_var"])}

    P["conv1"] = {"kernel": _conv_w(state["conv1.weight"])}
    bn("bn1", "bn1")
    for i, n in enumerate(layers):
        for j in range(n):
            t = f"layer{i + 1}.{j}"
            d = f"layer{i + 1}_{j}"
            blk = {f"conv{k}": {"kernel": _conv_w(state[f"{t}.conv{k}.weight"])}
                   for k in (1, 2, 3)}
            blk_s = {}
            for k in (1, 2, 3):
                blk[f"bn{k}"] = {
                    "scale": np.asarray(state[f"{t}.bn{k}.weight"]),
                    "bias": np.asarray(state[f"{t}.bn{k}.bias"])}
                blk_s[f"bn{k}"] = {
                    "mean": np.asarray(state[f"{t}.bn{k}.running_mean"]),
                    "var": np.asarray(state[f"{t}.bn{k}.running_var"])}
            if f"{t}.downsample.0.weight" in state:
                blk["downsample_conv"] = {
                    "kernel": _conv_w(state[f"{t}.downsample.0.weight"])}
                blk["downsample_bn"] = {
                    "scale": np.asarray(state[f"{t}.downsample.1.weight"]),
                    "bias": np.asarray(state[f"{t}.downsample.1.bias"])}
                blk_s["downsample_bn"] = {
                    "mean": np.asarray(
                        state[f"{t}.downsample.1.running_mean"]),
                    "var": np.asarray(state[f"{t}.downsample.1.running_var"])}
            P[d] = blk
            S[d] = blk_s
    for m in range(n_deconv):
        P[f"deconv{m}"] = {
            "kernel": _convT_w(state[f"deconv_layers.{3 * m}.weight"])}
        bn(f"deconv_bn{m}", f"deconv_layers.{3 * m + 1}")
    P["final"] = {"kernel": _conv_w(state["final_layer.weight"]),
                  "bias": np.asarray(state["final_layer.bias"])}
    return {"params": P, "batch_stats": S}


def load_torch_pose_resnet_npz(path: str, layers: Sequence[int] = (3, 8, 36, 3)
                               ) -> dict:
    """Load a dumped torch pose-resnet state_dict (.npz; produce with
    tools/convert_torch_checkpoint.py) -> flax variables.

    Acquisition recipe (no egress here): download the reference's COCO
    pose_resnet152 checkpoint per its README, then
    ``python tools/convert_torch_checkpoint.py --ckpt pose_resnet_152.pth
    --out pose_resnet_152.npz`` on any machine with torch, and point
    ``IPOKE_POSE_WEIGHTS`` at the npz."""
    raw = np.load(path)
    state = {k: raw[k] for k in raw.files}
    return convert_torch_pose_resnet(state, layers)
