from radarays_ros_tpu.trace.api import TraceResult, trace  # noqa: F401
