from .mesh import (
    all_gather_host,
    batch_sharding,
    gather_object_lists,
    create_mesh,
    process_local_batch_size,
    replicated,
    shard_batch,
    shard_params,
    spatial_sharding,
)
