"""LPIPS perceptual metric with learned linear heads (reference
``models/modules/autoencoders/LPIPS.py:12-60`` + ``vgg16.py``).

Structure-exact JAX port: ScalingLayer -> torchvision-vgg16 feature slices
(relu1_2, relu2_2, relu3_3, relu4_3, relu5_3) -> channel-normalize ->
squared diff -> 1x1 lin heads -> spatial average -> sum.  2-channel flow
inputs are zero-padded to 3 channels like the reference (:44-46).

Weights: the reference downloads the ``vgg_lpips`` checkpoint (heibox);
without egress the net is fixed-seed random (a valid *relative* metric).
``load_torch_lpips_npz`` converts a dumped torch LPIPS state_dict
(torchvision layout ``net.slice{s}.{i}.weight`` + ``lin{k}.model.1.weight``);
parity proven in tests/test_lpips.py against the reference's own forward
math run in torch.
"""

from __future__ import annotations

from typing import Any, List

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# torchvision vgg16.features layout: conv indices per slice and tap points
# slice1 = layers 0..3 (relu1_2), slice2 = 4..8 (relu2_2),
# slice3 = 9..15 (relu3_3), slice4 = 16..22 (relu4_3), slice5 = 23..29
_VGG16_CFG = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
_CHNS = (64, 128, 256, 512, 512)
# torch feature-module index of each conv (for weight conversion)
_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)

_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


class VGG16Features(nn.Module):
    """Tap activations after the LAST conv of each block (relu{b}_{last})."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        taps = []
        for b, (ch, n_convs) in enumerate(_VGG16_CFG):
            for c in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                            name=f"conv{b + 1}_{c + 1}")(x)
                x = jax.nn.relu(x)
            taps.append(x)
            if b < len(_VGG16_CFG) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


def _normalize(x, eps: float = 1e-10):
    """reference vgg16.py normalize_tensor (channel-last here)."""
    n = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True))
    return x / (n + eps)


def _pad3(x):
    if x.shape[-1] == 2:
        return jnp.concatenate(
            [x, jnp.zeros((*x.shape[:-1], 1), x.dtype)], axis=-1)
    return x


def lpips_features(params, x):
    """Channel-normalized VGG16 tap stack for one image batch — compute once
    per sample, pair up with ``lpips_from_features`` (the full VGG forward is
    the expensive part; pairwise metrics like the diversity score would
    otherwise rerun it O(pairs) times)."""
    model = VGG16Features()
    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)
    taps = model.apply({"params": params["vgg"]}, (_pad3(x) - shift) / scale)
    return [_normalize(t) for t in taps]


def lpips_from_features(params, fa, fb) -> jnp.ndarray:
    total = 0.0
    for k, (xa, xb) in enumerate(zip(fa, fb)):
        diff = (xa - xb) ** 2
        w = params["lins"][k]  # (C,) 1x1 conv to 1 channel, no bias
        head = jnp.einsum("bhwc,c->bhw", diff, w)
        total = total + jnp.mean(head, axis=(1, 2))
    return total


def lpips(params, a, b) -> jnp.ndarray:
    """(B,) learned perceptual distance; inputs (B, H, W, C) in [-1, 1],
    C in {2 (flow; zero-padded), 3}."""
    return lpips_from_features(params, lpips_features(params, a),
                               lpips_features(params, b))


def init_lpips_params(seed: int = 0):
    model = VGG16Features()
    v = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 64, 64, 3)))
    rng = np.random.default_rng(seed)
    lins = [jnp.asarray(np.abs(rng.normal(size=c)) / c, jnp.float32)
            for c in _CHNS]
    return {"vgg": v["params"], "lins": lins}


def load_torch_lpips_npz(path: str):
    """Dumped torch LPIPS state_dict (.npz) -> params.

    Expected keys (reference LPIPS state_dict layout):
      ``net.slice{s}.{i}.weight/bias`` with torchvision feature indices, and
      ``lin{k}.model.1.weight`` (1, C, 1, 1)."""
    raw = np.load(path)
    state = {k: raw[k] for k in raw.files}
    vgg = {}
    conv_iter = iter(_CONV_IDX)
    slice_bounds = (0, 4, 9, 16, 23, 30)
    for b, (ch, n_convs) in enumerate(_VGG16_CFG):
        for c in range(n_convs):
            idx = next(conv_iter)
            s = int(np.searchsorted(slice_bounds, idx, side="right"))
            w = state[f"net.slice{s}.{idx}.weight"]
            bias = state[f"net.slice{s}.{idx}.bias"]
            vgg[f"conv{b + 1}_{c + 1}"] = {
                "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                "bias": jnp.asarray(bias),
            }
    lins = [jnp.asarray(state[f"lin{k}.model.1.weight"][0, :, 0, 0])
            for k in range(5)]
    return {"vgg": vgg, "lins": lins}
