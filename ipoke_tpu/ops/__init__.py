"""Kernel layer: Pallas TPU kernels + native C++ runtime components.

``pallas_enabled()`` gates the Pallas fast paths: on by default on real TPU
backends, off elsewhere (the portable ``lax`` implementations are used).
Override with ``set_pallas(True/False)`` or env ``IPOKE_TPU_PALLAS=0/1``.
"""

import os

import jax

_FORCE = None
_FORCE_FUSED = None


def set_pallas(enabled: bool):
    global _FORCE
    _FORCE = bool(enabled)


def set_fused_unit(enabled):
    """Force the fused MaCowUnit-inverse gate independently of ``set_pallas``
    (``None`` restores the env/backend default).  The two kernels have
    opposite measured outcomes at shipped scale (fused unit wins, per-MCF
    kernel loses), so disabling one must not silently disable the other."""
    global _FORCE_FUSED
    _FORCE_FUSED = None if enabled is None else bool(enabled)


def fused_unit_enabled() -> bool:
    """Gate for the fused MaCowUnit inverse kernel
    (``masked_conv.macow_unit_inverse_pallas``).  Defaults to the TPU
    backend being active (the kernel targets real TPU VMEM; on CPU the
    portable lax path is used).  Override with ``set_fused_unit`` or env
    ``IPOKE_TPU_FUSED_UNIT=0/1`` (falls back to ``IPOKE_TPU_PALLAS``)."""
    if _FORCE_FUSED is not None:
        return _FORCE_FUSED
    env = os.environ.get("IPOKE_TPU_FUSED_UNIT",
                         os.environ.get("IPOKE_TPU_PALLAS"))
    if env is not None:
        return env not in ("0", "false", "False")
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


_FORCE_NICE = None


def set_fused_nice(enabled):
    """Force the fused NICE-net kernel gate (``None`` restores the env
    default)."""
    global _FORCE_NICE
    _FORCE_NICE = None if enabled is None else bool(enabled)


def fused_nice_enabled() -> bool:
    """Gate for the fused NICE coupling-net kernel
    (``nice_net.nice_net_raw_pallas``): the 3-dot chain of every NICE
    coupling runs in one pallas_call so the (M, 2048) hidden activations
    never round-trip HBM.  Default ON for TPU backends since the r4 A/B
    (``tools/profile_inverse.py --variants full,nice_fused``): 52.2 vs
    60.5 ms/step shipped-scale inverse — the biggest single win of the
    round.  Lowering-time platform dispatch keeps non-TPU backends on the
    portable emitters; ``IPOKE_TPU_FUSED_NICE=0`` or ``set_fused_nice``
    restores them everywhere."""
    if _FORCE_NICE is not None:
        return _FORCE_NICE
    env = os.environ.get("IPOKE_TPU_FUSED_NICE")
    if env is not None:
        return env not in ("0", "false", "False")
    return True


_FORCE_NICE_TRAIN = None


def set_fused_nice_train(enabled):
    """Force the TRAINING-forward fused NICE-net gate (``None`` restores the
    env default)."""
    global _FORCE_NICE_TRAIN
    _FORCE_NICE_TRAIN = None if enabled is None else bool(enabled)


def fused_nice_train_enabled() -> bool:
    """Gate for the differentiable fused NICE-net path
    (``nice_net.nice_net_raw_train``): the density-direction ``forward``
    of every NICE coupling runs the same fused 3-dot kernel as sampling,
    emitting the post-ELU hiddens as residuals for a hand-written backward
    (``custom_vjp``).  bf16-only, so it engages under the master-weights
    mixed-precision recipe (``training.mixed_prec_master``).  Default OFF
    until a shipped-scale TPU A/B lands (the r3 verdict's rule: no
    program-changing default without a measurement); enable with
    ``IPOKE_TPU_FUSED_NICE_TRAIN=1`` or ``set_fused_nice_train``."""
    if _FORCE_NICE_TRAIN is not None:
        return _FORCE_NICE_TRAIN
    env = os.environ.get("IPOKE_TPU_FUSED_NICE_TRAIN")
    if env is not None:
        return env not in ("0", "false", "False")
    return False


_FORCE_SPADE = None


def set_fused_spade(enabled):
    """Force the fused SPADE GN+modulate kernel gate (``None`` restores the
    env default)."""
    global _FORCE_SPADE
    _FORCE_SPADE = None if enabled is None else bool(enabled)


def fused_spade_enabled() -> bool:
    """Gate for the single-read SPADE GroupNorm+modulation kernel
    (``spade_gn.spade_gn_modulate_pallas``): each decode frame stays
    VMEM-resident so the activation is read from HBM once instead of the
    stats/normalize double read (r4 attribution: SPADE = 20.2 ms of the
    51.1 ms render at ~3x its HBM floor).  Default OFF until a
    shipped-scale TPU A/B lands (the r3 verdict's rule: no program-changing
    default without a measurement); enable with ``IPOKE_TPU_FUSED_SPADE=1``
    or ``set_fused_spade`` (platform dispatch keeps non-TPU backends
    portable regardless)."""
    if _FORCE_SPADE is not None:
        return _FORCE_SPADE
    env = os.environ.get("IPOKE_TPU_FUSED_SPADE")
    if env is not None:
        return env not in ("0", "false", "False")
    return False


def pallas_enabled() -> bool:
    """Default OFF: measured on TPU v5e at the shipped 8x8 latent shapes, the
    portable lax row-scan inverse (0.52 ms for a 5-step cINN, B=8) beats the
    per-flow Pallas kernel (2.93 ms) — XLA fuses the tiny row loop well and
    kernel-launch overhead dominates.  The kernel remains available (and
    correct, see tests/test_pallas_ops.py) for larger spatial latents where
    keeping the buffer VMEM-resident pays off."""
    if _FORCE is not None:
        return _FORCE
    env = os.environ.get("IPOKE_TPU_PALLAS")
    if env is not None:
        return env not in ("0", "false", "False")
    return False
