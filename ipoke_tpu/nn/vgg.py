"""VGG19 feature extractor + perceptual loss (reference ``utils/losses.py:6-83``).

The reference downloads torchvision's pretrained VGG19; this environment has
no egress, so by default the net is initialized from a *fixed seed* and used
as a random multi-scale projection — a valid relative perceptual distance
(random VGG features are an established perceptual baseline) that keeps the
training objective's structure intact.  If converted pretrained weights are
available, pass them via ``params`` / ``load_npz``.

Feature taps match the reference slices: relu1_1, relu2_1, relu3_1, relu4_1,
relu5_1 (``losses.py:17-26``).
"""

from __future__ import annotations

from typing import Any, List

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# (out_channels, n_convs) per VGG19 block, truncated at conv5_1 — the last
# tap the reference uses (losses.py slices end at feature idx 29); convs
# past relu5_1 would be dead compute and their weights aren't in the
# reference's VGG state_dict
_CFG = ((64, 2), (128, 2), (256, 4), (512, 4), (512, 1))


class VGG19Features(nn.Module):
    """Returns the 5 tap activations for input in [-1, 1], NHWC.

    ``imagenet_norm=False`` by default: the reference's VGG.forward feeds the
    [-1, 1] input straight into vgg19 (its ``normalize`` is commented out,
    losses.py:31-40) — kept exact for checkpoint/loss parity."""

    dtype: Any = None
    imagenet_norm: bool = False

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        if self.imagenet_norm:
            x = (x + 1.0) * 0.5
            mean = jnp.asarray([0.485, 0.456, 0.406], x.dtype)
            std = jnp.asarray([0.229, 0.224, 0.225], x.dtype)
            x = (x - mean) / std
        taps = []
        for b, (ch, n_convs) in enumerate(_CFG):
            for c in range(n_convs):
                x = nn.Conv(
                    ch, (3, 3), padding=1, dtype=self.dtype,
                    name=f"conv{b + 1}_{c + 1}",
                )(x)
                x = jax.nn.relu(x)
                if c == 0:
                    taps.append(x)  # relu{b}_1
            if b < len(_CFG) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


def init_vgg_params(seed: int = 0, dtype=jnp.float32):
    """Fixed-seed params, or real torchvision weights when
    ``IPOKE_VGG_WEIGHTS`` points at a converted npz (every call site —
    training perceptual loss, accuracy/diversity test modes — upgrades
    automatically)."""
    import os

    wpath = os.environ.get("IPOKE_VGG_WEIGHTS")
    if wpath:
        return load_torch_vgg19_npz(wpath)
    model = VGG19Features()
    dummy = jnp.zeros((1, 64, 64, 3), dtype)
    return model.init(jax.random.PRNGKey(seed), dummy)


def vgg_loss(vgg_params, x, y, weighted: bool = False):
    """Mean L1 over the 5 feature taps (reference VGGLoss, losses.py:69-83)."""
    model = VGG19Features()
    fx = model.apply(vgg_params, x)
    fy = model.apply(vgg_params, y)
    weights = (1 / 32, 1 / 16, 1 / 8, 1 / 4, 1.0) if weighted else (1.0,) * 5
    total = 0.0
    for w, a, b in zip(weights, fx, fy):
        total += w * jnp.mean(jnp.abs(a - b))
    return total if weighted else total / len(fx)


def load_torch_vgg19_npz(path: str):
    """Load converted torchvision vgg19 weights from an .npz with keys
    ``features.{i}.weight`` / ``features.{i}.bias`` (OIHW) into flax params."""
    raw = np.load(path)
    params = {}
    idx = 0
    for b, (ch, n_convs) in enumerate(_CFG):
        for c in range(n_convs):
            w = raw[f"features.{idx}.weight"]  # (O, I, kH, kW)
            bias = raw[f"features.{idx}.bias"]
            params[f"conv{b + 1}_{c + 1}"] = {
                "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                "bias": jnp.asarray(bias),
            }
            idx += 2  # conv + relu
        idx += 1  # pool
    return {"params": params}
