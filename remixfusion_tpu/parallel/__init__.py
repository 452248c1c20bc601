from remixfusion_tpu.parallel.sharding import (  # noqa: F401
    make_mesh, sharded_map_train_step, sharded_fuse_frame)
