"""IO layer: YAML configs, trajectories, polar-image files, CLI.

Replaces the reference's ROS plumbing (param server + TF + image_transport +
dynamic_reconfigure presets) with file-based equivalents; see io/config.py,
io/trajectory.py, io/image_io.py, io/cli.py.
"""

from radarays_ros_tpu.io.config import (  # noqa: F401
    SceneConfig,
    flatten_dyncfg,
    load_preset,
    load_scene_config,
    load_yaml,
    save_preset,
    save_scene_config,
    velocity_table,
)
from radarays_ros_tpu.io.image_io import (  # noqa: F401
    polar_to_points,
    read_png_gray,
    save_frame,
    write_png_gray,
)
from radarays_ros_tpu.io.trajectory import Trajectory  # noqa: F401
