"""I3D (Inflated Inception-3D, Kinetics-400) for FVD — on-device JAX port of
the reference's PyTorch I3D (``utils/metrics.py:919-1170``: ``Unit3Dpy``,
``MaxPool3dTFPadding``, ``Mixed``, ``I3D``).

Weights: the reference loads ``logs/I3D/i3d_kinetics_rgb.pth``; with no
checkpoint available the net is fixed-seed random — FVD over random I3D
features is still a valid *relative* metric (the reference itself calls its
in-training FVD only "correlated" with the real one, README.md:244).
``load_torch_i3d_npz`` converts real kinetics weights when provided.

Layout: videos (B, T, H, W, 3); TF-SAME padding == flax 'SAME'.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class Unit3D(nn.Module):
    out_channels: int
    kernel: Tuple[int, int, int] = (1, 1, 1)
    stride: Tuple[int, int, int] = (1, 1, 1)
    use_bn: bool = True
    activation: bool = True
    use_bias: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.out_channels, self.kernel, strides=self.stride,
            padding="SAME", use_bias=self.use_bias, dtype=self.dtype,
            name="conv3d",
        )(x)
        if self.use_bn:
            # frozen inference BN: scale/bias/mean/var are plain params
            x = nn.BatchNorm(
                use_running_average=True, epsilon=1e-3, dtype=self.dtype,
                name="batch3d",
            )(x)
        if self.activation:
            x = jax.nn.relu(x)
        return x


def _maxpool_tf(x, kernel, stride):
    return nn.max_pool(x, kernel, strides=stride, padding="SAME")


class Mixed(nn.Module):
    out_channels: Sequence[int]  # [b0, b1a, b1b, b2a, b2b, b3]
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        oc = self.out_channels
        b0 = Unit3D(oc[0], (1, 1, 1), dtype=self.dtype, name="branch_0")(x)
        b1 = Unit3D(oc[1], (1, 1, 1), dtype=self.dtype, name="branch_1a")(x)
        b1 = Unit3D(oc[2], (3, 3, 3), dtype=self.dtype, name="branch_1b")(b1)
        b2 = Unit3D(oc[3], (1, 1, 1), dtype=self.dtype, name="branch_2a")(x)
        b2 = Unit3D(oc[4], (3, 3, 3), dtype=self.dtype, name="branch_2b")(b2)
        b3 = _maxpool_tf(x, (3, 3, 3), (1, 1, 1))
        b3 = Unit3D(oc[5], (1, 1, 1), dtype=self.dtype, name="branch_3b")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class I3D(nn.Module):
    num_classes: int = 400
    dtype: Any = None

    @nn.compact
    def __call__(self, x, return_features: bool = False):
        """x: (B, T, H, W, 3) in [-1, 1] (kinetics convention).

        Returns logits (B, num_classes); with ``return_features`` also the
        1024-d pre-logit features."""
        d = self.dtype
        out = Unit3D(64, (7, 7, 7), (2, 2, 2), dtype=d, name="conv3d_1a_7x7")(x)
        out = _maxpool_tf(out, (1, 3, 3), (1, 2, 2))
        out = Unit3D(64, (1, 1, 1), dtype=d, name="conv3d_2b_1x1")(out)
        out = Unit3D(192, (3, 3, 3), dtype=d, name="conv3d_2c_3x3")(out)
        out = _maxpool_tf(out, (1, 3, 3), (1, 2, 2))
        out = Mixed([64, 96, 128, 16, 32, 32], d, name="mixed_3b")(out)
        out = Mixed([128, 128, 192, 32, 96, 64], d, name="mixed_3c")(out)
        out = _maxpool_tf(out, (3, 3, 3), (2, 2, 2))
        out = Mixed([192, 96, 208, 16, 48, 64], d, name="mixed_4b")(out)
        out = Mixed([160, 112, 224, 24, 64, 64], d, name="mixed_4c")(out)
        out = Mixed([128, 128, 256, 24, 64, 64], d, name="mixed_4d")(out)
        out = Mixed([112, 144, 288, 32, 64, 64], d, name="mixed_4e")(out)
        out = Mixed([256, 160, 320, 32, 128, 128], d, name="mixed_4f")(out)
        out = _maxpool_tf(out, (2, 2, 2), (2, 2, 2))
        out = Mixed([256, 160, 320, 32, 128, 128], d, name="mixed_5b")(out)
        out = Mixed([384, 192, 384, 48, 128, 128], d, name="mixed_5c")(out)
        # global avg pool over remaining T,H,W (reference: AvgPool3d (2,7,7)
        # then temporal mean — equivalent to a full mean for 224^2/64-ish in)
        feats = jnp.mean(out, axis=(1, 2, 3))
        logits = nn.Dense(self.num_classes, name="logits", dtype=d)(
            feats
        )
        if return_features:
            return logits, feats
        return logits


def init_i3d_params(seed: int = 0, spatial: int = 64, frames: int = 10):
    """Fixed-seed variables, or real kinetics weights when
    ``IPOKE_I3D_WEIGHTS`` points at a converted npz (upgrades both the
    in-training FVD monitor and the --test fvd mode)."""
    import os

    wpath = os.environ.get("IPOKE_I3D_WEIGHTS")
    if wpath:
        return load_torch_i3d_npz(wpath)
    model = I3D()
    x = jnp.zeros((1, frames, spatial, spatial, 3))
    return model.init(jax.random.PRNGKey(seed), x)


def i3d_activations(params, videos, batch_size: int = 8,
                    use_logits: bool = True) -> np.ndarray:
    """Feature matrix for FVD (reference uses the 400-d logits,
    ``utils/metrics.py:780-793``)."""
    model = I3D()
    n = videos.shape[0]
    fn = jax.jit(lambda v: model.apply(params, v, return_features=True))
    outs = []
    # every clip contributes: the final short slice goes through too (jit
    # compiles one extra shape), so Frechet stats cover all n samples
    for i in range(0, n, batch_size):
        chunk = jnp.asarray(videos[i : i + batch_size])
        logits, feats = fn(chunk)
        outs.append(np.asarray(logits if use_logits else feats))
    return np.concatenate(outs, axis=0)


def load_torch_i3d_npz(path: str):
    """Convert a dumped PyTorch kinetics I3D state dict (.npz) to flax params.

    Expected keys mirror the reference module names, e.g.
    ``conv3d_1a_7x7.conv3d.weight`` (O, I, kT, kH, kW) and batch3d
    weight/bias/running_mean/running_var.
    """
    raw = dict(np.load(path))
    params: dict = {}
    bstats: dict = {}

    def put(tree, path_keys, leaf):
        node = tree
        for k in path_keys[:-1]:
            node = node.setdefault(k, {})
        node[path_keys[-1]] = jnp.asarray(leaf)

    # torch Mixed uses Sequential branches (branch_1.0, branch_1.1, ...,
    # metrics.py:1028-1054); our flax Mixed names them branch_1a/branch_1b
    branch_map = {("branch_1", "0"): "branch_1a",
                  ("branch_1", "1"): "branch_1b",
                  ("branch_2", "0"): "branch_2a",
                  ("branch_2", "1"): "branch_2b",
                  ("branch_3", "1"): "branch_3b"}

    def rename(parts):
        out = []
        i = 0
        while i < len(parts):
            if i + 1 < len(parts) and (parts[i], parts[i + 1]) in branch_map:
                out.append(branch_map[(parts[i], parts[i + 1])])
                i += 2
            else:
                out.append(parts[i])
                i += 1
        return out

    for key, val in raw.items():
        parts = rename(key.split("."))
        if parts[0] == "conv3d_0c_1x1":
            # reference head: 1x1x1 conv (with bias, no BN) == our Dense
            # 'logits' over the pooled features (metrics.py:1155-1168)
            if parts[-1] == "weight":
                put(params, ["logits", "kernel"],
                    np.transpose(val[:, :, 0, 0, 0], (1, 0)))
            elif parts[-1] == "bias":
                put(params, ["logits", "bias"], val)
            continue
        if parts[-2] == "conv3d" and parts[-1] == "weight":
            w = np.transpose(val, (2, 3, 4, 1, 0))  # OIkTkHkW -> kTkHkWIO
            put(params, parts[:-1] + ["kernel"], w)
        elif parts[-2] == "conv3d" and parts[-1] == "bias":
            put(params, parts[:-1] + ["bias"], val)
        elif parts[-2] == "batch3d":
            if parts[-1] == "num_batches_tracked":
                continue
            name = {"weight": "scale", "bias": "bias"}.get(parts[-1])
            if name:
                put(params, parts[:-1] + [name], val)
            else:
                name = {"running_mean": "mean", "running_var": "var"}[parts[-1]]
                put(bstats, parts[:-1] + [name], val)
    return {"params": params, "batch_stats": bstats}
