from gedepth_tpu.parallel.mesh import (
    create_mesh, create_mesh_for_batch, batch_sharding, replicated_sharding, shard_batch,
    spatial_sharding, create_mesh_2d, shard_batch_2d,
    create_mesh_3d, tp_param_shardings, shard_state_tp, shard_batch_3d,
)
