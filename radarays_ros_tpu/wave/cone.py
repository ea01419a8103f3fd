"""Beam cone sampling — the four radial distributions D1..D4.

Rebuild of the reference's sample_cone* family
(src/radarays_ros/radar_algorithms.cpp:248-385) with explicit jax PRNG keys
instead of a nondeterministic std::random_device (determinism is a feature;
distributional parity is asserted in tests, not per-sample equality).

A beam is a cone of half-angle width/2 around a mean direction. Each sample
draws a polar angle theta ~ U(-pi, pi) and a radius according to
`sample_dist` (cfg/RadarModel.cfg:20-26):

    0 (D1): r = u * R                u ~ U(0,1)   uniform in radius
    1 (D2): r = sqrt(u) * R                       uniform in disk area
    2 (D3): r = (g / z) * R          g ~ N(0,1)   normal, z = sqrt2*erfinv(p_in_cone)
    3 (D4): r = sqrt(|g| / z) * R

The offset (alpha, beta) = (r cos(theta), r sin(theta)) is applied as an
extrinsic-xyz Euler rotation (roll=0, pitch=alpha, yaw=beta) of the mean
direction, matching rmagine's EulerAngles convention used at
radar_algorithms.cpp:285-289.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from radarays_ros_tpu.wave.radar_math import erfinvf


def rotate_pitch_yaw(alpha, beta, v):
    """Apply R = Rz(beta) @ Ry(alpha) to vector(s) v.

    alpha/beta: (...,) arrays; v: (..., 3) or (3,). Broadcasts.
    """
    ca, sa = jnp.cos(alpha), jnp.sin(alpha)
    cb, sb = jnp.cos(beta), jnp.sin(beta)
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    # Ry(alpha): (x', y', z') = (ca*x + sa*z, y, -sa*x + ca*z)
    x1 = ca * x + sa * z
    y1 = y
    z1 = -sa * x + ca * z
    # Rz(beta)
    x2 = cb * x1 - sb * y1
    y2 = sb * x1 + cb * y1
    return jnp.stack([x2, y2, z1], axis=-1)


def _sample_radii(key, n_samples: int, radius, sample_dist: int, p_in_cone):
    z = jnp.sqrt(jnp.float32(2.0)) * erfinvf(p_in_cone)
    if sample_dist == 0:
        u = jax.random.uniform(key, (n_samples,), jnp.float32)
        return u * radius
    if sample_dist == 1:
        u = jax.random.uniform(key, (n_samples,), jnp.float32)
        return jnp.sqrt(u) * radius
    if sample_dist == 2:
        g = jax.random.normal(key, (n_samples,), jnp.float32)
        return (g / z) * radius
    if sample_dist == 3:
        g = jax.random.normal(key, (n_samples,), jnp.float32)
        return jnp.sqrt(jnp.abs(g) / z) * radius
    raise ValueError(f"unknown sample_dist {sample_dist} (expected 0..3)")


def sample_cone_offsets(key, width, n_samples: int, sample_dist: int, p_in_cone):
    """Draw (alpha, beta) pitch/yaw offsets for n_samples cone rays."""
    k_angle, k_radius = jax.random.split(key)
    theta = jax.random.uniform(
        k_angle, (n_samples,), jnp.float32, -jnp.pi, jnp.pi
    )
    radius = jnp.asarray(width, jnp.float32) / 2.0
    r = _sample_radii(k_radius, n_samples, radius, sample_dist, p_in_cone)
    return r * jnp.cos(theta), r * jnp.sin(theta)


def sample_cone_dirs(key, mean_dir, width, n_samples: int, sample_dist: int, p_in_cone):
    """n_samples directions in a cone around mean_dir (dirs-only variant).

    Counterpart of the rm::Memory<rm::Vector> overload
    (radar_algorithms.cpp:296-337) used by the reference GPU engine.
    Differentiable w.r.t. `width` and `p_in_cone`.
    """
    alpha, beta = sample_cone_offsets(key, width, n_samples, sample_dist, p_in_cone)
    return rotate_pitch_yaw(alpha, beta, jnp.asarray(mean_dir, jnp.float32))


def sample_cone_local(key, width, n_samples: int, sample_dist: int, p_in_cone):
    """n_samples local-frame directions around +x, all random.

    Counterpart of sample_cone_local (radar_algorithms.cpp:248-294), which the
    CPU engine caches as its start wave set (RadarCPU.cpp:136-145).
    """
    return sample_cone_dirs(
        key, jnp.array([1.0, 0.0, 0.0], jnp.float32), width, n_samples,
        sample_dist, p_in_cone,
    )


def sample_cone_mean(key, mean_dir, width, n_samples: int, sample_dist: int, p_in_cone):
    """Cone sampling that includes the exact mean ray as sample 0.

    Counterpart of the waves-around-mean overload (radar_algorithms.cpp:339-385)
    used by the debug beam tool: returns mean_dir followed by n_samples-1
    random cone directions.
    """
    mean_dir = jnp.asarray(mean_dir, jnp.float32)
    rest = sample_cone_dirs(key, mean_dir, width, n_samples - 1, sample_dist, p_in_cone)
    return jnp.concatenate([mean_dir[None, :], rest], axis=0)
