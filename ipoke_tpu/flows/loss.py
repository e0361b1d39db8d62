"""Flow NLL losses (reference ``models/modules/INN/loss.py:8-97``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def nll(sample, spatial_mean: bool = False, radial: bool = False):
    """Per-sample negative log-likelihood under N(0, I) (up to const).

    sample: (B, H, W, C) or (B, D).  Mirrors reference ``loss.py:86-97``.
    """
    if sample.ndim == 2:
        sample = sample[:, None, None, :]
    if radial:
        b = sample.shape[0]
        flat = sample.reshape(b, -1)
        r = jnp.linalg.norm(flat, axis=1)
        dim = flat.shape[1]
        # reference uses sum(shape[1:]) - 1 (a quirk kept for parity: the sum
        # of the dims, not their product)
        dof = sum(sample.shape[1:]) - 1.0
        return dof * jnp.log(r) + 0.5 * r**2
    if spatial_mean:
        return 0.5 * jnp.sum(jnp.mean(sample**2, axis=(1, 2)), axis=-1)
    return 0.5 * jnp.sum(sample.reshape(sample.shape[0], -1) ** 2, axis=1)


def flow_loss(
    sample,
    logdet,
    rng=None,
    spatial_mean: bool = False,
    logdet_weight: float = 1.0,
    nll_weight: float = 1.0,
    radial: bool = False,
):
    """NLL + negative-logdet objective; returns (loss, log_dict).

    ``rng`` enables the reference-matched ``reference_nll_loss`` diagnostic
    on a fresh Gaussian sample (reference ``loss.py:28-33``).
    """
    nll_loss = jnp.mean(nll(sample, spatial_mean=spatial_mean, radial=radial))
    if spatial_mean and sample.ndim == 4:
        h, w = sample.shape[1], sample.shape[2]
        nlogdet = -jnp.mean(logdet) / (h * w)
    else:
        nlogdet = -jnp.mean(logdet)
    loss = nll_weight * nll_loss + logdet_weight * nlogdet

    log = {
        "flow_loss": loss,
        "nlogdet_loss": nlogdet,
        "nll_loss": nll_loss,
    }
    if rng is not None:
        ref = jax.random.normal(rng, sample.shape, sample.dtype)
        if radial:
            b = sample.shape[0]
            flat = ref.reshape(b, -1)
            flat = flat / (jnp.linalg.norm(flat, axis=1, keepdims=True) + 1e-12)
            r = jnp.abs(jax.random.normal(jax.random.fold_in(rng, 1), (b, 1)))
            ref = (flat * r).reshape(sample.shape)
        log["reference_nll_loss"] = jnp.mean(
            nll(ref, spatial_mean=spatial_mean, radial=radial)
        )
    return loss, log
