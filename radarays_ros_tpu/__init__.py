"""radarays_ros_tpu — TPU-native rotating-FMCW radar simulation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of uos/radarays_ros
(RadaRays, IEEE RA-L 2025): simulation of a rotating FMCW radar (Navtech-class,
400 azimuth beams x N range cells) by multi-bounce cone ray tracing in triangle
meshes with Snell/Fresnel wave splitting, back-reflection shading, signal
denoising, ambient Perlin noise and per-column normalization.

Design stance (TPU-first, not a port):
  * One whole 400-azimuth frame is ONE jitted XLA program: dense
    (azimuth, sample * 2^bounce) wave tensors with validity masks instead of
    the reference's per-angle dynamic wave lists (RadarCPU.cpp:220-392).
  * Ray-triangle intersection is recast in plane-equation form so the hot
    inner product rides the MXU as two matmuls (trace/planes.py), with a
    Moller-Trumbore oracle (trace/intersect.py) and a chunk-culled Pallas
    kernel for large scenes (trace/pallas_trace.py).
  * Signals are drawn with masked scatter-adds into the polar image
    (image/draw.py), replacing the reference's per-signal splat loops
    (RadarCPU.cpp:402-450, radar_algorithms.cu:730-849).
  * Everything is differentiable -> material optimization (opti/) is
    gradient-based instead of black-box scipy.shgo (scripts/radaray_opti.py).
  * Multi-chip scaling shards the azimuth axis over a jax.sharding.Mesh
    (parallel/), replacing OpenMP-over-angles (RadarCPU.cpp:155).
"""

__version__ = "0.1.0"

from radarays_ros_tpu.sim.config import (  # noqa: F401
    RadarModelConfig,
    RadarParams,
    Materials,
    AmbientNoiseParams,
)
from radarays_ros_tpu.sim.radar import Radar  # noqa: F401
from radarays_ros_tpu.geom.scene import Scene  # noqa: F401
