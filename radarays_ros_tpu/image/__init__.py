from radarays_ros_tpu.image.perlin import perlin_noise, perlin_noise_hilo  # noqa: F401
from radarays_ros_tpu.image.denoise import (  # noqa: F401
    make_denoiser_triangular,
    make_denoiser_gaussian,
    make_denoiser_maxwell_boltzmann,
    build_denoiser,
)
from radarays_ros_tpu.image.draw import draw_signals, apply_ambient_noise  # noqa: F401
