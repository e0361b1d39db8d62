"""Metric correctness tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ipoke_tpu.eval import (
    angular_error,
    compute_fvd,
    diversity_score_mse,
    endpoint_error,
    frechet_distance,
    init_i3d_params,
    optical_flow_metrics,
    perceptual_distance,
    psnr,
    ssim,
)
from ipoke_tpu.nn.vgg import init_vgg_params

K = jax.random.PRNGKey


def test_psnr_ssim_identity():
    x = jax.random.uniform(K(0), (2, 32, 32, 3), minval=-1, maxval=1)
    assert float(psnr(x, x).min()) > 80
    np.testing.assert_allclose(np.asarray(ssim(x, x)), 1.0, atol=1e-5)
    y = jnp.clip(x + 0.2 * jax.random.normal(K(1), x.shape), -1, 1)
    assert float(ssim(x, y).max()) < 0.99
    assert float(psnr(x, y).max()) < 30


def test_perceptual_distance_orders_correctly():
    vgg = init_vgg_params(0)
    x = jax.random.uniform(K(0), (2, 32, 32, 3), minval=-1, maxval=1)
    near = jnp.clip(x + 0.05 * jax.random.normal(K(1), x.shape), -1, 1)
    far = jax.random.uniform(K(2), x.shape, minval=-1, maxval=1)
    d_same = float(perceptual_distance(vgg, x, x).mean())
    d_near = float(perceptual_distance(vgg, x, near).mean())
    d_far = float(perceptual_distance(vgg, x, far).mean())
    assert d_same < 1e-8
    assert d_same < d_near < d_far


def test_flow_metrics():
    f = jax.random.normal(K(0), (2, 16, 16, 2)) * 3
    m = optical_flow_metrics(f, f)
    for k, v in m.items():
        assert float(v) == 0.0, k
    # rotate flow by 90 deg -> all angular errors above any threshold
    f90 = jnp.stack([-f[..., 1], f[..., 0]], axis=-1)
    ae = angular_error(f, f90)
    assert float(jnp.median(ae)) > 5 * np.pi / 180
    ee = endpoint_error(f, f + 2.0)
    np.testing.assert_allclose(np.asarray(ee), np.sqrt(8.0), rtol=1e-5)


def test_frechet_distance_zero_and_positive():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(500, 16))
    mu, sig = a.mean(0), np.cov(a, rowvar=False)
    assert frechet_distance(mu, sig, mu, sig) == pytest.approx(0.0, abs=1e-6)
    b = a + 3.0
    d = frechet_distance(mu, sig, b.mean(0), np.cov(b, rowvar=False))
    assert d == pytest.approx(9.0 * 16, rel=0.05)


def test_fvd_separates_matched_from_shifted():
    i3d = init_i3d_params(0, spatial=32, frames=6)
    rng = np.random.default_rng(1)
    real = rng.uniform(-1, 1, size=(16, 6, 32, 32, 3)).astype(np.float32)
    similar = real + rng.normal(0, 0.05, real.shape).astype(np.float32)
    different = np.clip(real * 0.2 + 0.7, -1, 1).astype(np.float32)
    fvd_close = compute_fvd(i3d, real, similar, batch_size=8)
    fvd_far = compute_fvd(i3d, real, different, batch_size=8)
    assert np.isfinite(fvd_close) and np.isfinite(fvd_far)
    assert fvd_close < fvd_far


def test_diversity_score():
    rng = np.random.default_rng(0)
    same = np.repeat(rng.normal(size=(4, 1, 3, 8, 8, 3)), 3, axis=1)
    varied = rng.normal(size=(4, 3, 3, 8, 8, 3))
    assert diversity_score_mse(same) == 0.0
    assert diversity_score_mse(varied) > 0.1


def test_fid_separates():
    from ipoke_tpu.eval.metrics import compute_fid

    vgg = init_vgg_params(0)
    rng = np.random.default_rng(3)
    real = rng.uniform(-1, 1, (32, 32, 32, 3)).astype(np.float32)
    close = np.clip(real + rng.normal(0, 0.05, real.shape), -1,
                    1).astype(np.float32)
    far = np.clip(real * 0.1 + 0.8, -1, 1).astype(np.float32)
    fid_close = compute_fid(vgg, real, close)
    fid_far = compute_fid(vgg, real, far)
    assert np.isfinite(fid_close) and fid_close < fid_far


def test_metric_errorbars(tmp_path):
    import os

    from ipoke_tpu.utils.latent_viz import plot_metric_errorbars

    rng = np.random.default_rng(0)
    p = plot_metric_errorbars(
        {"ssim": rng.uniform(0, 1, (16, 10)),
         "lpips": rng.uniform(0, 1, (16, 10))},
        str(tmp_path / "eb.png"), csv_path=str(tmp_path / "eb.csv"))
    assert os.path.getsize(p) > 0
    lines = open(tmp_path / "eb.csv").read().strip().splitlines()
    assert lines[0] == "metric,frame,mean,std"
    assert len(lines) == 1 + 2 * 10


def test_ssim_bounded_on_flat_images():
    # flat regions used to push SSIM past 1 via negative variance estimates
    x = jnp.ones((2, 32, 32, 3)) * 0.5
    y = x + 1e-4
    s = ssim(x, y)
    assert float(s.max()) <= 1.0 + 1e-6
    assert float(s.min()) > 0.9
