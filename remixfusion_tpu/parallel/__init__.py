from remixfusion_tpu.parallel.sharding import (  # noqa: F401
    gridsharded_map_train_step, make_mesh, make_sharded_gbq_refresher,
    pad_rows_for_mesh, partition_tiles_by_device, sharded_fuse_frame,
    sharded_fuse_pack_gbq, sharded_map_train_step)
