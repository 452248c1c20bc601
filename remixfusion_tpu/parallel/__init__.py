from remixfusion_tpu.parallel.sharding import (  # noqa: F401
    gridsharded_map_train_step, make_mesh, pad_rows_for_mesh,
    sharded_fuse_frame, sharded_fuse_pack_gbq, sharded_map_train_step)
