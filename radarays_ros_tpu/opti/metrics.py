"""Image comparison metrics for real-vs-sim evaluation and optimization.

The reference's optimizer scores candidates with skimage PSNR
(scripts/radaray_opti.py:205) and imports (but does not use) SSIM / NMI /
VoI / MI (radaray_opti.py:21-27); its eval harness compares real vs
simulated frames via the external radar_tools compare_radar_images.py
(launch/tests/eval_real_to_sim.launch:10-17). Here the same metrics are
differentiable jnp functions, so they serve both as evaluation numbers and
as gradient-based losses through the jitted simulator.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mse(a, b):
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    return jnp.mean((a - b) ** 2)


def psnr(a, b, data_range: float = 255.0):
    """Peak signal-to-noise ratio [dB]; higher = more similar."""
    m = jnp.maximum(mse(a, b), 1e-12)
    return 10.0 * jnp.log10(data_range * data_range / m)


def _uniform_filter(x, size: int):
    """Mean filter with a (size, size) box, 'same' padding."""
    k = jnp.ones((1, 1, size, size), jnp.float32) / (size * size)
    x4 = x[None, None, :, :]
    pad = size // 2
    out = jax.lax.conv_general_dilated(
        x4, k, window_strides=(1, 1),
        padding=[(pad, size - 1 - pad), (pad, size - 1 - pad)])
    return out[0, 0]


def ssim(a, b, data_range: float = 255.0, win_size: int = 7,
         k1: float = 0.01, k2: float = 0.03):
    """Structural similarity (mean over the image), skimage-compatible
    constants. Differentiable."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_a = _uniform_filter(a, win_size)
    mu_b = _uniform_filter(b, win_size)
    s_aa = _uniform_filter(a * a, win_size) - mu_a * mu_a
    s_bb = _uniform_filter(b * b, win_size) - mu_b * mu_b
    s_ab = _uniform_filter(a * b, win_size) - mu_a * mu_b
    num = (2 * mu_a * mu_b + c1) * (2 * s_ab + c2)
    den = (mu_a**2 + mu_b**2 + c1) * (s_aa + s_bb + c2)
    return jnp.mean(num / den)


def _joint_hist(a, b, bins: int, data_range: float, sigma: float = 1.0):
    """Soft (differentiable) joint histogram via Gaussian binning."""
    centers = jnp.linspace(0.0, data_range, bins)
    aw = jax.nn.softmax(-((a.reshape(-1, 1) - centers) ** 2) / (2 * sigma**2), axis=-1)
    bw = jax.nn.softmax(-((b.reshape(-1, 1) - centers) ** 2) / (2 * sigma**2), axis=-1)
    h = jnp.matmul(aw.T, bw, precision=jax.lax.Precision.HIGHEST)
    return h / jnp.sum(h)


def mutual_information(a, b, bins: int = 32, data_range: float = 255.0):
    """Soft mutual information [nats] (the MI of radaray_opti.py:27)."""
    p_ab = _joint_hist(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32),
                       bins, data_range, sigma=data_range / bins)
    p_a = jnp.sum(p_ab, axis=1, keepdims=True)
    p_b = jnp.sum(p_ab, axis=0, keepdims=True)
    ratio = p_ab / jnp.maximum(p_a * p_b, 1e-12)
    return jnp.sum(p_ab * jnp.log(jnp.maximum(ratio, 1e-12)))


def normalized_mutual_information(a, b, bins: int = 32, data_range: float = 255.0):
    """NMI = (H(a) + H(b)) / H(a, b) (radaray_opti.py:21)."""
    p_ab = _joint_hist(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32),
                       bins, data_range, sigma=data_range / bins)
    p_a = jnp.sum(p_ab, axis=1)
    p_b = jnp.sum(p_ab, axis=0)

    def ent(p):
        return -jnp.sum(p * jnp.log(jnp.maximum(p, 1e-12)))

    return (ent(p_a) + ent(p_b)) / jnp.maximum(ent(p_ab.reshape(-1)), 1e-12)


def variation_of_information(a, b, bins: int = 32, data_range: float = 255.0):
    """VoI = H(a,b) - MI (radaray_opti.py:24)."""
    p_ab = _joint_hist(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32),
                       bins, data_range, sigma=data_range / bins)
    h_ab = -jnp.sum(p_ab * jnp.log(jnp.maximum(p_ab, 1e-12)))
    return h_ab - mutual_information(a, b, bins, data_range)
