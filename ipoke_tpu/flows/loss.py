"""Flow NLL losses (reference ``models/modules/INN/loss.py:8-97``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def nll(sample, spatial_mean: bool = False, radial: bool = False):
    """Per-sample negative log-likelihood under N(0, I) (up to const).

    sample: (B, H, W, C) or (B, D).  Mirrors reference ``loss.py:86-97``.
    """
    # reductions in fp32: under bf16 mixed precision a 2048-element ||z||^2
    # sum in bf16 loses ~3 decimal digits; harmless no-op for fp32 inputs
    sample = sample.astype(jnp.float32)
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
    logdet = jnp.asarray(logdet, jnp.float32)
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


def flow_loss_alternative(sample, logdet):
    """Channel-sum NLL variant (reference ``FlowLossAlternative``,
    loss.py:44-64)."""
    flat = sample.reshape(sample.shape[0], -1)
    nll_loss = jnp.mean(jnp.sum(0.5 * flat**2, axis=1))
    nlogdet = -jnp.mean(logdet)
    loss = nll_loss + nlogdet
    return loss, {"flow_loss": loss, "nll_loss": nll_loss,
                  "nlogdet_loss": nlogdet}


def gaussian_logp(z, logdet):
    """Exact Gaussian log-likelihood incl. the 2*pi constant (reference
    ``GaussianLogP``, loss.py:100-118); returns (bits-per-dim loss, log)."""
    dim = int(np.prod(z.shape[1:]))
    log_p = -0.5 * jnp.sum(z.reshape(z.shape[0], -1) ** 2, axis=1) \
        - 0.5 * dim * jnp.log(2 * jnp.pi)
    ll = jnp.mean(log_p + logdet)
    loss = -ll / (dim * jnp.log(2.0))  # bits per dim
    return loss, {"flow_loss": loss, "log_likelihood": ll}


def nll_with_typicality(sample, logdet, step, fade_steps: int = 10000,
                        typicality_weight: float = 1.0):
    """NLL + an entropy-matching (typicality) regularizer with linear fade-in
    (reference ``NLLWithTypicality``, loss.py:120-178): penalize the gap
    between the batch's average energy and the Gaussian entropy rate."""
    dim = int(np.prod(sample.shape[1:]))
    energy = jnp.mean(
        0.5 * jnp.sum(sample.reshape(sample.shape[0], -1) ** 2, axis=1))
    entropy_rate = 0.5 * dim  # E[0.5 ||z||^2] under N(0, I)
    typicality = (energy - entropy_rate) ** 2 / dim
    base, log = flow_loss(sample, logdet)
    w = typicality_weight * jnp.clip(step / fade_steps, 0.0, 1.0)
    loss = base + w * typicality
    log = dict(log)
    log.update({"typicality": typicality, "typicality_w": w,
                "flow_loss": loss})
    return loss, log
