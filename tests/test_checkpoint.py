"""Checkpoint store: round-trip, best-k pruning, versioned dirs."""

import os

import jax.numpy as jnp
import numpy as np

from ipoke_tpu.core.checkpoint import (
    CheckpointStore,
    create_dir_structure,
    latest_version,
    next_version,
)


def _state(v=0.0):
    return {"params": {"w": jnp.full((4, 4), v), "b": jnp.zeros(3)},
            "step": jnp.asarray(7)}


def test_roundtrip(tmp_path):
    store = CheckpointStore(str(tmp_path / "v0"), monitor="fvd", save_top_k=2)
    s = _state(1.5)
    store.save(s, step=10, metric=42.0)
    restored = store.restore_best(_state(0.0))
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]), 1.5)
    assert int(restored["step"]) == 7


def test_best_k_pruning(tmp_path):
    store = CheckpointStore(str(tmp_path / "v0"), monitor="fvd", save_top_k=2)
    for step, metric in [(1, 50.0), (2, 30.0), (3, 40.0), (4, 20.0)]:
        store.save(_state(metric), step=step, metric=metric)
    m = store._load_manifest()
    assert len(m) == 2
    assert sorted(m.values()) == [20.0, 30.0]
    best = store.restore_best(_state(0.0))
    np.testing.assert_allclose(np.asarray(best["params"]["w"]), 20.0)
    # 'last' always points at the most recent save
    last = store.restore(_state(0.0), "last")
    np.testing.assert_allclose(np.asarray(last["params"]["w"]), 20.0)


def test_versioned_dirs(tmp_path):
    dirs = create_dir_structure(str(tmp_path), "second_stage", "iper_64")
    assert os.path.isdir(dirs["ckpt"])
    assert next_version(dirs["ckpt"]) == 0
    v0 = os.path.join(dirs["ckpt"], "0")
    os.makedirs(v0)
    assert next_version(dirs["ckpt"]) == 1
    assert latest_version(dirs["ckpt"]) is None  # v0 is empty
    CheckpointStore(v0).save(_state(), step=0)
    assert latest_version(dirs["ckpt"]) == 0
