"""Device mesh / sharding layer.

This module replaces the reference's implicit PL-DDP+NCCL layer
(SURVEY.md §2.8/§5.8): a ``jax.sharding.Mesh`` over ICI with a ``data`` axis
for batch parallelism and a ``model`` axis for tensor-sharding the cINN's
wide hidden convolutions; XLA inserts the psum/all-gather collectives.
Train steps are ordinary jitted functions — sharded batch + sharded params
in, sharded state out.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh with axes (data, model); data = n_devices / model_parallel."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def shard_batch(batch, mesh: Mesh):
    """Place a host batch on the mesh, sharded over the leading (batch) axis."""
    def put(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def batch_spec(batch) -> Any:
    return jax.tree_util.tree_map(
        lambda x: P("data", *([None] * (x.ndim - 1))), batch
    )


# ---------------------------------------------------------------------------
# Tensor-parallel sharding of flow params: the cINN's FLOPs live in the NICE
# coupling nets' wide hidden convs (w1: 3x3 cin->hid, w2: 1x1 hid->hid,
# out.v: 3x3 hid->out).  Shard the hidden dim over the 'model' axis; XLA
# turns the w1/w2 boundary into sharded matmuls and all-reduces the 'out'
# contraction.  All other (small) leaves stay replicated.
# ---------------------------------------------------------------------------

def flow_param_specs(params) -> Any:
    """PartitionSpec tree for flow params produced by flows/*.init().

    Leaves are matched by their dict key path:
      - NICE2d 'w1' (kh,kw,cin,hid): shard hid (axis -1)
      - NICE2d 'w2' (1,1,hid,hid):   shard input hid (axis 2)
      - wn-conv 'out'/'v' (kh,kw,hid+h,out): shard contraction dim (axis 2)
    Stacked (scanned) step params carry a leading step axis; the rule applies
    to the same trailing axes.
    """

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            t = [walk(v, path + (i,)) for i, v in enumerate(node)]
            return type(node)(t) if isinstance(node, tuple) else t
        keys = tuple(k for k in path if isinstance(k, str))
        nd = node.ndim
        spec = [None] * nd
        if keys and keys[-1] == "w1" and nd >= 4:
            spec[-1] = "model"
        elif keys and keys[-1] == "w2" and nd >= 4:
            spec[nd - 2] = "model"
        elif len(keys) >= 2 and keys[-2] == "out" and keys[-1] == "v" and nd >= 4:
            spec[nd - 2] = "model"
        return P(*spec)

    return walk(params, ())


def shard_params(params, mesh: Mesh, specs=None):
    specs = specs if specs is not None else flow_param_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def tree_shardings(tree, mesh: Mesh, specs) -> Any:
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P),
    )


# ---------------------------------------------------------------------------
# Multi-slice (DCN) meshes: scale past one ICI pod by adding a 'slice' axis.
# Layout rule (scaling-book recipe): pure data parallelism over the
# slow DCN links (one gradient all-reduce per step, latency-tolerant), all
# tensor/model parallelism INSIDE a slice on ICI.  Batch shards over the
# combined ('slice', 'data') super-axis.
# ---------------------------------------------------------------------------

def make_hybrid_mesh(
    n_slices: int,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh with axes (slice, data, model).

    On real multi-slice TPU deployments, uses
    ``mesh_utils.create_hybrid_device_mesh`` so the 'slice' axis maps onto
    DCN and (data, model) onto each slice's ICI torus.  On single-slice or
    virtual platforms it degrades to a logical reshape — same program, same
    collectives, validated on the CPU mesh (tests/test_parallel.py)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % (n_slices * model_parallel) == 0, (n, n_slices, model_parallel)
    dp = n // (n_slices * model_parallel)
    multi_slice = len({getattr(d, "slice_index", 0) for d in devices}) > 1
    if multi_slice:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, dp, model_parallel),
            dcn_mesh_shape=(n_slices, 1, 1),
            devices=devices,
        )
    else:
        arr = np.asarray(devices).reshape(n_slices, dp, model_parallel)
    return Mesh(arr, ("slice", "data", "model"))


def hybrid_batch_spec(batch) -> Any:
    """Batch axis sharded over the (slice, data) super-axis."""
    return jax.tree_util.tree_map(
        lambda x: P(("slice", "data"), *([None] * (x.ndim - 1))), batch
    )


def shard_batch_hybrid(batch, mesh: Mesh):
    def put(x):
        spec = P(("slice", "data"), *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)
