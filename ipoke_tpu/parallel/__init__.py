from .mesh import (
    batch_spec,
    flow_param_specs,
    make_mesh,
    replicate,
    shard_batch,
    shard_params,
)
