from radarays_ros_tpu.parallel.sharding import (  # noqa: F401
    make_mesh,
    make_mesh_2d,
    shard_frame_args,
    simulate_frame_sharded,
    simulate_frame_sharded_2d,
    train_step_sharded,
)
