"""Checkpoint store: versioned run dirs + metric-gated best-k manifest.

Reproduces the reference's checkpoint semantics (SURVEY.md §5.4):

* run layout ``<base>/<experiment>/{ckpt,config,generated,log}/<model>/<ver>``
  with auto-incrementing integer versions (reference ``main.py:10-16``,
  ``experiments/experiment.py:50-60``);
* a ``best_k`` manifest (the ``best_k_models.yaml`` replacement) mapping
  checkpoint path -> monitored metric, pruned to ``save_top_k`` plus ``last``
  (reference ``utils/callbacks.py:10-23`` + ``ModelCheckpoint``);
* ``restore_best`` picks the min-metric checkpoint that still exists
  (reference ``experiments/experiment.py:107-143``).

Storage is orbax (async-capable, sharding-aware) over pytree states.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp
import yaml


def create_dir_structure(base_dir: str, experiment: str, model_name: str) -> Dict[str, str]:
    dirs = {}
    for sub in ("ckpt", "config", "generated", "log"):
        d = os.path.join(base_dir, experiment, sub, model_name)
        os.makedirs(d, exist_ok=True)
        dirs[sub] = d
    return dirs


def next_version(ckpt_dir: str) -> int:
    versions = [
        int(d) for d in os.listdir(ckpt_dir)
        if d.isdigit() and os.path.isdir(os.path.join(ckpt_dir, d))
    ] if os.path.isdir(ckpt_dir) else []
    return max(versions) + 1 if versions else 0


def latest_version(ckpt_dir: str) -> Optional[int]:
    versions = sorted(
        int(d) for d in os.listdir(ckpt_dir)
        if d.isdigit() and os.path.isdir(os.path.join(ckpt_dir, d))
    ) if os.path.isdir(ckpt_dir) else []
    # latest version that actually contains checkpoints
    for v in reversed(versions):
        vd = os.path.join(ckpt_dir, str(v))
        if os.listdir(vd):
            return v
    return None


class CheckpointStore:
    """Orbax-backed store for one run version."""

    def __init__(self, version_dir: str, monitor: str = "loss",
                 save_top_k: int = 3, mode: str = "min"):
        self.dir = os.path.abspath(version_dir)
        os.makedirs(self.dir, exist_ok=True)
        self.monitor = monitor
        self.save_top_k = save_top_k
        self.mode = mode
        self.manifest_path = os.path.join(self.dir, "best_k_models.yaml")
        self._ckptr = ocp.StandardCheckpointer()

    # -- manifest ------------------------------------------------------------
    def _load_manifest(self) -> Dict[str, float]:
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                return yaml.safe_load(f) or {}
        return {}

    def _write_manifest(self, m: Dict[str, float]):
        with open(self.manifest_path, "w") as f:
            yaml.safe_dump(m, f)

    # -- save/restore -----------------------------------------------------------
    def _path(self, name: str) -> str:
        return os.path.join(self.dir, name)

    def _save_one(self, path: str, tree: Any):
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckptr.save(path, tree)
        self._ckptr.wait_until_finished()

    def save(self, state: Any, step: int, metric: Optional[float] = None,
             is_last: bool = True, weights: Any = None) -> Optional[str]:
        """Save ``last``; when ``metric`` is given also save a monitored
        checkpoint and prune to top-k.  ``weights`` is an optional lightweight
        model-only tree saved as a ``*_weights`` sidecar — the cross-stage
        loading contract (the reference instead does state-dict surgery with
        strict=False, second_stage_video.py:224-247)."""
        state = jax.device_get(state)
        if is_last:
            self._save_one(self._path("last"), state)
            if weights is not None:
                self._save_one(self._path("last_weights"),
                               jax.device_get(weights))
        saved = None
        if metric is not None:
            name = f"step={step}-{self.monitor}={metric:.3f}"
            saved = self._path(name)
            self._save_one(saved, state)
            if weights is not None:
                self._save_one(saved + "_weights", jax.device_get(weights))
            m = self._load_manifest()
            m[saved] = float(metric)
            # prune
            reverse = self.mode == "max"
            keep = sorted(m.items(), key=lambda kv: kv[1], reverse=reverse)
            for path, _ in keep[self.save_top_k :]:
                m.pop(path, None)
                for stale in (path, path + "_weights"):
                    if os.path.exists(stale):
                        shutil.rmtree(stale)
            self._write_manifest(m)
        return saved

    def restore(self, target: Any, name: str = "last") -> Any:
        path = name if os.path.isabs(name) else self._path(name)
        abstract = jax.tree_util.tree_map(np.asarray, jax.device_get(target))
        return self._ckptr.restore(path, abstract)

    def best_path(self) -> Optional[str]:
        m = {p: v for p, v in self._load_manifest().items() if os.path.exists(p)}
        if not m:
            last = self._path("last")
            return last if os.path.exists(last) else None
        reverse = self.mode == "max"
        return sorted(m.items(), key=lambda kv: kv[1], reverse=reverse)[0][0]

    def restore_best(self, target: Any, weights: bool = False) -> Any:
        path = self.best_path()
        assert path is not None, f"no checkpoints in {self.dir}"
        if weights:
            path = path + "_weights" if not path.endswith("last") \
                else self._path("last_weights")
        return self.restore(target, path)
