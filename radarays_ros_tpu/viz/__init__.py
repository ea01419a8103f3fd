"""Debug visualization: ray-reflection traces (rviz markers -> data)."""

from radarays_ros_tpu.viz.rays import (  # noqa: F401
    segments_to_polylines,
    trace_debug_rays,
)
