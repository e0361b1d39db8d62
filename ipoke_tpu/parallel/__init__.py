from .mesh import (
    batch_spec,
    flow_param_specs,
    hybrid_batch_spec,
    make_hybrid_mesh,
    make_mesh,
    replicate,
    shard_batch,
    shard_batch_hybrid,
    shard_params,
)
