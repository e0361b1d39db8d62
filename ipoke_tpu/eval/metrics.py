"""Evaluation metrics (reference ``utils/metrics.py``).

On-device JAX implementations of SSIM / PSNR / perceptual distance /
diversity / optical-flow errors, plus host-side Fréchet distance (scipy
sqrtm) for FVD/FID.  Per-sample metric *states* are plain arrays so
multi-host reduction is a psum/concat over the mesh (replacing PL Metric's
``dist_sync_on_step``).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.vgg import VGG19Features

# ---------------------------------------------------------------------------
# Image metrics (inputs in [-1, 1], NHWC)
# ---------------------------------------------------------------------------

def psnr(a, b, data_range: float = 2.0):
    """Per-image PSNR (reference wraps PL functional, metrics.py:532)."""
    mse = jnp.mean((a - b) ** 2, axis=(-3, -2, -1))
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-10))


def _gaussian_kernel(size=11, sigma=1.5):
    g = jnp.exp(-0.5 * ((jnp.arange(size) - size // 2) / sigma) ** 2)
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim(a, b, data_range: float = 2.0):
    """Per-image SSIM with the standard 11x11 Gaussian window."""
    k = _gaussian_kernel()[:, :, None, None]
    c = a.shape[-1]
    kern = jnp.tile(k, (1, 1, 1, c))

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, kern, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_a, mu_b = filt(a), filt(b)
    # clamp variances: on flat regions the filtered second moment minus mu^2
    # can go slightly negative numerically, inflating SSIM past 1
    va = jnp.maximum(filt(a * a) - mu_a**2, 0.0)
    vb = jnp.maximum(filt(b * b) - mu_b**2, 0.0)
    vab = filt(a * b) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * vab + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (va + vb + c2)
    )
    return jnp.mean(s, axis=(-3, -2, -1))


def perceptual_distance(vgg_params, a, b):
    """LPIPS-style distance over unit-normalized VGG19 features, mean over
    taps (the reference uses pip ``lpips``; without pretrained lin heads this
    uses uniform channel weights — valid for relative comparison)."""
    model = VGG19Features()
    fa = model.apply(vgg_params, a)
    fb = model.apply(vgg_params, b)
    total = 0.0
    for x, y in zip(fa, fb):
        xn = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-10)
        yn = y / (jnp.linalg.norm(y, axis=-1, keepdims=True) + 1e-10)
        total = total + jnp.mean((xn - yn) ** 2, axis=(-3, -2, -1))
    return total / len(fa)


# ---------------------------------------------------------------------------
# Optical flow errors (reference utils/metrics.py:20-83; flow NHWC (.., 2))
# ---------------------------------------------------------------------------

def angular_error(f1, f2):
    """Angle between flow vectors extended with a unit 3rd component."""
    ones = jnp.ones((*f1.shape[:-1], 1), f1.dtype)
    a = jnp.concatenate([f1, ones], axis=-1)
    b = jnp.concatenate([f2, ones], axis=-1)
    cos = jnp.sum(a * b, axis=-1) / (
        jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1)
    )
    return jnp.arccos(jnp.clip(cos, -1.0, 1.0))


def endpoint_error(f1, f2):
    return jnp.linalg.norm(f1 - f2, axis=-1)


def optical_flow_metrics(f1, f2) -> Dict[str, jnp.ndarray]:
    """Fractions of pixels above angular (5/10/15 deg) and endpoint
    (1/2/3/5 px) thresholds (reference ``optical_flow_metric``)."""
    ae = angular_error(f1, f2)
    ee = endpoint_error(f1, f2)
    out = {}
    for deg in (5.0, 10.0, 15.0):
        out[f"AE_R{deg:g}"] = jnp.mean(ae > deg * jnp.pi / 180.0)
    for px in (1.0, 2.0, 3.0, 5.0):
        out[f"EE_R{px:g}"] = jnp.mean(ee > px)
    return out


# ---------------------------------------------------------------------------
# Frechet distances (FVD / FID)
# ---------------------------------------------------------------------------

def calculate_moments(acts: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Mean + covariance of the activation matrix.  When N << D the full
    covariance is rank-deficient and the Fréchet distance degenerates to ~0
    regardless of the distributions (the in-training monitor then can't rank
    checkpoints); fall back to a diagonal covariance, which stays a valid
    relative metric at any sample count."""
    mu = np.mean(acts, axis=0)
    n, d = acts.shape
    if n < d:
        sigma = np.diag(np.var(acts, axis=0, ddof=1) + 1e-8)
    else:
        sigma = np.cov(acts, rowvar=False)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Stable Fréchet distance (reference metrics.py:690-743)."""
    from scipy import linalg

    diff = mu1 - mu2
    covmean = linalg.sqrtm(sigma1.dot(sigma2))
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(
        diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
        - 2.0 * np.trace(covmean)
    )


def compute_fid(vgg_params, real_images, fake_images,
                batch_size: int = 32) -> float:
    """Fréchet distance over pooled VGG19 features (reference ``FID`` +
    ``FIDInceptionModel``, metrics.py:445-653; InceptionV3 is replaced by the
    framework's egress-free feature net — a valid relative FID)."""
    model = VGG19Features()

    @jax.jit
    def feats(x):
        return jnp.mean(model.apply(vgg_params, x)[-1], axis=(1, 2))

    def collect(images):
        out = []
        n = images.shape[0]
        for i in range(0, n, batch_size):
            out.append(np.asarray(feats(jnp.asarray(images[i:i + batch_size]))))
        return np.concatenate(out)

    a, b = collect(real_images), collect(fake_images)
    return frechet_distance(*calculate_moments(a), *calculate_moments(b))


def compute_fvd(backbone, real_videos, fake_videos,
                batch_size: int = 8) -> float:
    """FVD over feature-backbone activations (reference ``calculate_FVD``,
    metrics.py:838-845 — I3D logits there; here either the real converted
    I3D, the in-repo-trained MotionFeatureNet, or a random I3D, see
    ``eval/backbone.py``).  ``backbone`` is a bundle from
    ``init_fvd_backbone`` or raw I3D variables (legacy).

    videos: (N, T, H, W, 3) in [-1, 1]."""
    from .backbone import backbone_activations

    a_real = backbone_activations(backbone, real_videos, batch_size)
    a_fake = backbone_activations(backbone, fake_videos, batch_size)
    return frechet_distance(*calculate_moments(a_real),
                            *calculate_moments(a_fake))


# ---------------------------------------------------------------------------
# Diversity (reference compute_div_score*, metrics.py:139-212)
# ---------------------------------------------------------------------------

def diversity_score_mse(samples) -> float:
    """Mean pairwise MSE across n samples per datapoint.

    samples: (N, S, T, H, W, 3) — N datapoints, S samples each."""
    samples = np.asarray(samples)
    n, s = samples.shape[:2]
    total, cnt = 0.0, 0
    for i in range(s):
        for j in range(i + 1, s):
            total += float(np.mean((samples[:, i] - samples[:, j]) ** 2))
            cnt += 1
    return total / max(cnt, 1)


def diversity_score_lpips(lpips_params, samples) -> float:
    """Mean pairwise LPIPS across n samples per datapoint (reference
    ``compute_div_score_lpips``, metrics.py:192-209: mean over ordered pairs
    j != k of per-frame LPIPS).

    samples: (N, S, T, H, W, 3) in [-1, 1]."""
    from ..nn.lpips import lpips_features, lpips_from_features

    samples = np.asarray(samples)
    n, s = samples.shape[:2]
    frames = samples.reshape(n, s, -1, *samples.shape[3:])
    n_frames = frames.shape[2]

    feats_fn = jax.jit(lambda x: lpips_features(lpips_params, x))
    head_fn = jax.jit(lambda fa, fb: jnp.sum(
        lpips_from_features(lpips_params, fa, fb)))

    # One VGG pass per (sample index, frame chunk) — O(s) passes like the
    # factored form, but only `s` CHUNK-sized feature stacks are resident at
    # once (holding all full-length stacks would be ~GBs at 128px).
    chunk = max(1, 256 // max(n, 1))
    pair_sums = np.zeros((s, s))
    count = 0
    for f0 in range(0, n_frames, chunk):
        f1 = min(f0 + chunk, n_frames)
        block = frames[:, :, f0:f1]
        feats = [feats_fn(jnp.asarray(
            block[:, i].reshape(-1, *samples.shape[3:]))) for i in range(s)]
        for i in range(s):
            for j in range(i + 1, s):
                pair_sums[i, j] += float(head_fn(feats[i], feats[j]))
        count += (f1 - f0) * n
    total, cnt = 0.0, 0
    for i in range(s):
        for j in range(i + 1, s):
            total += pair_sums[i, j] / max(count, 1)
            cnt += 1
    return total / max(cnt, 1)


def diversity_score_vgg(vgg_params, samples, batch_frames: int = 64) -> float:
    """Mean pairwise VGG cosine distance (reference ``compute_div_score``)."""
    samples = jnp.asarray(samples)
    n, s, t = samples.shape[:3]
    model = VGG19Features()

    @jax.jit
    def feats(frames):
        taps = model.apply(vgg_params, frames)
        f = taps[-1].reshape(frames.shape[0], -1)
        return f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-10)

    total, cnt = 0.0, 0
    for i in range(s):
        for j in range(i + 1, s):
            fi = feats(samples[:, i].reshape(-1, *samples.shape[3:]))
            fj = feats(samples[:, j].reshape(-1, *samples.shape[3:]))
            total += float(jnp.mean(1.0 - jnp.sum(fi * fj, axis=-1)))
            cnt += 1
    return total / max(cnt, 1)
