from dualpixelface_tpu.parallel.mesh import (
    batch_sharding,
    get_mesh,
    replicated_sharding,
    shard_batch,
    shard_batch_from_local,
)
