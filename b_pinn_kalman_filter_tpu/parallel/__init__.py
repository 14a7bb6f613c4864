from b_pinn_kalman_filter_tpu.parallel.mesh import (
    create_mesh, shard_batch, replicate, data_sharding, get_data_axis_size)
