from gedepth_tpu.parallel.mesh import (
    create_mesh, create_mesh_for_batch, batch_sharding, replicated_sharding, shard_batch,
    spatial_sharding, create_mesh_2d, shard_batch_2d,
)
