from radarays_ros_tpu.wave.types import Waves, make_start_wave_attrs  # noqa: F401
from radarays_ros_tpu.wave.cone import (  # noqa: F401
    sample_cone_dirs,
    sample_cone_local,
    sample_cone_mean,
)
from radarays_ros_tpu.wave.fresnel import (  # noqa: F401
    fresnel_split,
    back_reflection_shader,
    get_incidence_angle,
)
from radarays_ros_tpu.wave.radar_math import (  # noqa: F401
    M_C,
    erfinvf,
    quantile,
)
