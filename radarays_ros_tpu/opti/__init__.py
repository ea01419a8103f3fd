"""Material optimization: metrics, param-vector parity, optimizers, workload.

The native rebuild of the reference's dev/opti track
(scripts/radaray_opti.py): differentiable PSNR/SSIM/MI metrics, the 10-dim
parameter vector with reference bounds, gradient (Adam) and derivative-free
optimizers, and the GenRadarImage/GetRadarParams workload surface.
"""

from radarays_ros_tpu.opti.metrics import (  # noqa: F401
    mse,
    mutual_information,
    normalized_mutual_information,
    psnr,
    ssim,
    variation_of_information,
)
from radarays_ros_tpu.opti.optimize import (  # noqa: F401
    OptResult,
    ParamVector,
    default_objective,
    optimize_black_box,
    optimize_gradient,
    sweep_n_reflections,
)
from radarays_ros_tpu.opti.workload import (  # noqa: F401
    RadarImageServer,
    msg_to_params,
    params_to_msg,
)
