"""Runtime setup helpers.

* ``setup_compilation_cache`` — persistent XLA compile cache.  The shipped
  second stage is a ~1B-param, 50-step flow; on the remote-TPU backend its
  programs take minutes to compile, and the cache makes that a one-time cost
  per program shape.
* ``init_on_cpu`` — run a (possibly huge) parameter-init function eagerly on
  the host CPU backend and transfer the result once.  Compiling the init
  program itself on the accelerator is pure waste (it runs exactly once), and
  eager per-op dispatch over a remote-TPU tunnel is minutes-slow.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional

import jax


def setup_compilation_cache(path: Optional[str] = None):
    path = path or os.environ.get(
        "IPOKE_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/ipoke_jax"))
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - older jax
        pass


def init_on_cpu(init_fn: Callable[[], Any], device=None) -> Any:
    """Run ``init_fn`` on the host CPU backend, then place on ``device``
    (default: the default accelerator)."""
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        # eager: a one-shot init isn't worth compiling (at the shipped 1B-param
        # scale even the CPU compile of the init program takes minutes)
        params = jax.block_until_ready(init_fn())
    if device is None:
        device = jax.devices()[0]
    if device == cpu:
        return params
    return jax.device_put(params, device)
