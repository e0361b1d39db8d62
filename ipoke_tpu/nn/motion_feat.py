"""MotionFeatureNet — a small 3D-conv video feature extractor trained
in-repo on synthetic motion (no egress), shipped as the DEFAULT FVD/feature
backbone when no real kinetics I3D weights are provided.

Rationale: the reference computes its in-training FVD with a kinetics I3D
checkpoint it ships out-of-band (``utils/metrics.py:919-1170``,
``logs/I3D/i3d_kinetics_rgb.pth``); this environment has no egress, so round
1/2 fell back to a fixed-seed random I3D — a valid *relative* signal but a
noisy checkpoint gate.  This net is trained (``tools/train_motion_feat.py``)
to (a) regress per-clip motion statistics (mean flow vector, magnitude,
moving-area fraction) and (b) detect temporal shuffling — exactly the
motion-coherence sensitivity Frechet video distances need — and its ~0.6 MB
of weights are committed (``ipoke_tpu/eval/weights/motion_feat_v1.npz``), so
the default gate is deterministic and trained rather than random.

Input: videos (B, T, H, W, 3) in [-1, 1], any spatial size (features are
globally pooled); features are the 128-d penultimate embedding.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

FEAT_DIM = 128
# regression targets: (mean_dx, mean_dy, mean |flow|, moving-area fraction)
N_MOTION_TARGETS = 4


class MotionFeatureNet(nn.Module):
    """3 conv3d stages (stride-2 spatial, stride (1,2,2)/(2,2,2) pooling)
    -> global average pool -> 128-d feature; two heads used only during
    pretext training."""

    widths: Sequence[int] = (32, 64, 128)
    dtype: Any = None

    @nn.compact
    def __call__(self, v, return_heads: bool = False):
        x = v.astype(self.dtype or v.dtype)
        for i, w in enumerate(self.widths):
            x = nn.Conv(w, (3, 3, 3), strides=(1, 2, 2), dtype=self.dtype,
                        name=f"conv{i}")(x)
            x = nn.GroupNorm(num_groups=8, dtype=self.dtype,
                             name=f"gn{i}")(x)
            x = jax.nn.relu(x)
            if i > 0:  # keep early temporal resolution for order sensitivity
                x = nn.avg_pool(x, (2, 1, 1), strides=(2, 1, 1),
                                padding="SAME")
        x = jnp.mean(x, axis=(1, 2, 3))  # global spatio-temporal pool
        feat = nn.Dense(FEAT_DIM, dtype=self.dtype, name="feat")(x)
        if not return_heads:
            return feat
        h = jax.nn.relu(feat)
        motion = nn.Dense(N_MOTION_TARGETS, dtype=self.dtype,
                          name="motion_head")(h)
        order_logit = nn.Dense(1, dtype=self.dtype, name="order_head")(h)
        return feat, motion, order_logit[..., 0]


def motion_targets(flow: np.ndarray) -> np.ndarray:
    """Per-clip regression targets from the ground-truth flow map
    (B, H, W, 2), normalized to O(1) by the spatial size."""
    s = float(flow.shape[1])
    mag = np.linalg.norm(flow, axis=-1)  # (B, H, W)
    moving = mag > 1e-3
    area = moving.mean(axis=(1, 2))
    denom = np.maximum(moving.sum(axis=(1, 2)), 1)[:, None]
    mean_vec = (flow * moving[..., None]).sum(axis=(1, 2)) / denom
    mean_mag = (mag * moving).sum(axis=(1, 2)) / denom[:, 0]
    return np.stack(
        [mean_vec[:, 0] / s, mean_vec[:, 1] / s, mean_mag / s, area],
        axis=-1).astype(np.float32)


def init_motion_feat(rng, frames: int = 10, spatial: int = 64):
    model = MotionFeatureNet()
    x = jnp.zeros((1, frames, spatial, spatial, 3))
    # init through the heads so the pretext-training params exist; plain
    # feature-extraction apply simply never touches them
    return model.init(rng, x, return_heads=True)


def motion_feat_activations(params, videos, batch_size: int = 16
                            ) -> np.ndarray:
    """Feature matrix for Frechet distances (same contract as
    ``eval.i3d.i3d_activations``)."""
    model = MotionFeatureNet()
    fn = jax.jit(lambda v: model.apply(params, v))
    n = videos.shape[0]
    outs = []
    step = batch_size
    # every clip contributes: the final short slice goes through too (jit
    # compiles one extra shape), so Frechet stats cover all n samples
    for i in range(0, n, step):
        outs.append(np.asarray(fn(jnp.asarray(videos[i : i + step]))))
    return np.concatenate(outs, axis=0)


def save_motion_feat(params, path: str) -> None:
    flat = {"/".join(k): np.asarray(v, np.float16)
            for k, v in _flat_keys(jax.device_get(params))}
    np.savez_compressed(path, **flat)


def _flat_keys(params, prefix=()):
    for k, v in params.items():
        if isinstance(v, dict):
            yield from _flat_keys(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def load_motion_feat(path: str, frames: int = 10, spatial: int = 64):
    """Load committed fp16 weights into the init structure (fp32)."""
    data = np.load(path)
    params = jax.tree_util.tree_map(
        np.zeros_like, jax.device_get(
            init_motion_feat(jax.random.PRNGKey(0), frames, spatial)))

    def fill(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            key = f"{prefix}{k}"
            if isinstance(v, dict):
                out[k] = fill(v, key + "/")
            else:
                assert key in data.files, f"missing weight {key}"
                arr = data[key].astype(np.float32)
                assert arr.shape == v.shape, (key, arr.shape, v.shape)
                out[k] = arr
        return out

    return fill(params)
