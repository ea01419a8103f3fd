from radarays_ros_tpu.geom.scene import Scene, SceneArrays  # noqa: F401
from radarays_ros_tpu.geom.primitives import (  # noqa: F401
    make_box,
    make_plane,
    make_cylinder,
    make_icosphere,
)
from radarays_ros_tpu.geom.mesh import load_mesh, save_ply  # noqa: F401
