from radarays_ros_tpu.parallel.sharding import (  # noqa: F401
    make_mesh,
    shard_frame_args,
    simulate_frame_sharded,
    train_step_sharded,
)
