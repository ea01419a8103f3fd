"""Snell/Fresnel wave splitting and the back-reflection shader.

Vectorized, branchless rebuild of the reference's scalar physics
(include/radarays_ros/radar_algorithms.h:55-187). Every branch of the C++
code becomes a jnp.where so the function maps over arbitrary wave batches and
stays differentiable.

Reference semantics preserved (with file:line):
  * Refractive-index convention n1 = v2, n2 = v1 — indices are proportional to
    1/velocity so the reference feeds velocities swapped
    (radar_algorithms.h:62-63).
  * Mirror reflection dir = d + n * 2*(-n).d (radar_algorithms.h:73).
  * Snell refraction with total-internal-reflection angle limit asin(n2/n1)
    and normal re-orientation toward the incoming side
    (radar_algorithms.h:80-103); refraction dir is zero when no transmission.
  * Fresnel rs/rp with normal-incidence (i+r < eps: rs=rp=(n1-n2)/(n1+n2)) and
    grazing (i+r > pi-eps: rs=rp=1) special cases (radar_algorithms.h:108-122).
  * Effective reflectance Reff = pol*Rs + (1-pol)*Rp, Teff = 1-Reff
    (radar_algorithms.h:124-137).
  * Back-reflection shader I = (diffuse + specular_fac * cos(angle)^spec_exp)
    * energy (radar_algorithms.h:168-187). Call sites pass material
    (ambient, diffuse, specular) as (diffuse, specular_fac, specular_exp)
    (RadarCPU.cpp:310-316) — an A + B*cos^C polynomial matching
    scripts/radarays_snell_fresnel_brdf.py:9-20.

Numerical hardening for TPU float32 (beyond the reference):
  * all acos inputs clamped to [-1, 1];
  * sqrt arguments clamped to >= 0 (the TIR region is masked out anyway);
  * cos(angle) clamped to >= 0 before pow in the shader (the reference can
    produce NaN for back-facing normals via pow(negative, non-integer)).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

_EPS_ANGLE = 1e-4  # special-case window of radar_algorithms.h:111


def _clamped_acos(x):
    return jnp.arccos(jnp.clip(x, -1.0, 1.0))


def get_incidence_angle(surface_normal, incidence_dir):
    """Angle between the reversed incidence direction and the surface normal.

    Counterpart of get_incidence_angle (radar_algorithms.h:25-31), with the
    acos input clamped.
    """
    return _clamped_acos(jnp.sum(-incidence_dir * surface_normal, axis=-1))


class FresnelResult(NamedTuple):
    reflection_dir: jnp.ndarray    # (..., 3)
    refraction_dir: jnp.ndarray    # (..., 3) — zeros when no transmission
    reflection_energy: jnp.ndarray  # (...,) Reff * E
    refraction_energy: jnp.ndarray  # (...,) Teff * E
    incidence_angle: jnp.ndarray    # (...,) radians


def fresnel_split(surface_normal, incidence_dir, energy, polarization, v1, v2):
    """Split an incident wave into reflection + refraction (Snell + Fresnel).

    Args:
      surface_normal: (..., 3) unit surface normals.
      incidence_dir:  (..., 3) unit incidence directions (pointing into surface).
      energy:         (...,) incident energies.
      polarization:   (...,) s-polarization ratio in [0, 1].
      v1:             (...,) wave velocity in the incidence medium.
      v2:             (...,) wave velocity in the refraction medium.

    Returns FresnelResult. Energy conservation Reff + Teff = 1 holds exactly
    (Teff is computed as 1 - Reff, radar_algorithms.h:133).
    """
    n = surface_normal
    d = incidence_dir
    # reference convention: n ~ 1/v, fed swapped (radar_algorithms.h:62-63)
    n1 = jnp.asarray(v2, jnp.float32)
    n2 = jnp.asarray(v1, jnp.float32)

    n_dot_d = jnp.sum(n * d, axis=-1)
    incidence_angle = _clamped_acos(-n_dot_d)

    # mirror reflection (radar_algorithms.h:73)
    reflection_dir = d - 2.0 * n_dot_d[..., None] * n

    # Snell refraction (radar_algorithms.h:80-103)
    safe_n1 = jnp.where(n1 > 0.0, n1, 1.0)
    safe_n2 = jnp.where(n2 > 0.0, n2, 1.0)
    n21 = n2 / safe_n1
    angle_limit = jnp.where(
        jnp.abs(n21) <= 1.0, jnp.arcsin(jnp.clip(n21, -1.0, 1.0)), 100.0
    )
    # normal oriented against the incoming ray for the refraction construction
    n_oriented = jnp.where((n_dot_d > 0.0)[..., None], -n, n)
    n12 = n1 / safe_n2
    c = jnp.cos(incidence_angle)
    radicand = 1.0 - n12 * n12 * (1.0 - c * c)
    root = jnp.sqrt(jnp.maximum(radicand, 0.0))
    refr_candidate = d * n12[..., None] + n_oriented * (n12 * c - root)[..., None]

    transmits = (n1 > 0.0) & (incidence_angle <= angle_limit) & (n2 > 0.0)
    refraction_dir = jnp.where(transmits[..., None], refr_candidate, 0.0)

    # The reference computes the refraction angle against the (possibly
    # flipped) normal it used for construction (radar_algorithms.h:106): the
    # flip only happened inside the `incidence_angle <= angle_limit` branch.
    flipped = (n1 > 0.0) & (incidence_angle <= angle_limit)
    n_for_angle = jnp.where(flipped[..., None], n_oriented, n)
    refraction_angle = _clamped_acos(jnp.sum(refraction_dir * (-n_for_angle), axis=-1))

    # Fresnel coefficients (radar_algorithms.h:108-122)
    s = incidence_angle + refraction_angle
    # generic branch
    sin_s = jnp.sin(s)
    tan_i = jnp.tan(incidence_angle)
    tan_r = jnp.tan(refraction_angle)
    tan_s = jnp.tan(s)
    safe = jnp.abs(sin_s) > 1e-12
    rs_gen = jnp.where(safe, -jnp.sin(incidence_angle - refraction_angle) / jnp.where(safe, sin_s, 1.0), 1.0)
    safe_t = jnp.abs(tan_s) > 1e-12
    rp_gen = jnp.where(safe_t, jnp.tan(incidence_angle - refraction_angle) / jnp.where(safe_t, tan_s, 1.0), 1.0)
    del tan_i, tan_r

    rs_normal = (n1 - n2) / jnp.where(jnp.abs(n1 + n2) > 1e-12, n1 + n2, 1.0)

    near_normal = s < _EPS_ANGLE
    near_grazing = s > jnp.pi - _EPS_ANGLE
    rs = jnp.where(near_normal, rs_normal, jnp.where(near_grazing, 1.0, rs_gen))
    rp = jnp.where(near_normal, rs_normal, jnp.where(near_grazing, 1.0, rp_gen))

    Rs = rs * rs
    Rp = rp * rp
    # clamp against float32 round-off (Reff is mathematically in [0, 1])
    Reff = jnp.clip(polarization * Rs + (1.0 - polarization) * Rp, 0.0, 1.0)
    Teff = 1.0 - Reff

    return FresnelResult(
        reflection_dir=reflection_dir,
        refraction_dir=refraction_dir,
        reflection_energy=Reff * energy,
        refraction_energy=Teff * energy,
        incidence_angle=incidence_angle,
    )


def back_reflection_shader(incidence_angle, energy, diffuse, specular_fac, specular_exp):
    """Energy returned to the sensor at a hit (radar_algorithms.h:168-187).

    I_total = diffuse * 1 + specular_fac * cos(incidence_angle)^specular_exp,
    scaled by the incident energy. cos is clamped to >= 0 (back-facing guard;
    see module docstring).
    """
    c = jnp.maximum(jnp.cos(incidence_angle), 0.0)
    i_specular = jnp.power(c, specular_exp)
    return (diffuse + specular_fac * i_specular) * energy


def cook_torrance_shader(incidence_angle, energy, roughness, fresnel_f0, k_diffuse):
    """Cook-Torrance-style back-reflection alternative (dev/flex parity).

    The reference's dev/flex branch swaps a Cook-Torrance reflection model in
    via the same material API (BASELINE.json configs). For monostatic radar
    (view dir == light dir == reverse incidence) the half vector equals the
    view vector, so:

        D  = Beckmann distribution at the incidence angle,
        G  = min(1, 2 cos^2) geometric attenuation (degenerate monostatic form),
        F  = Schlick fresnel at the incidence angle with base reflectance f0,
        I  = k_d * cos + (1 - k_d) * D*G*F / (pi * cos)

    Differentiable in roughness/f0/k_diffuse for gradient-based material
    optimization.
    """
    c = jnp.clip(jnp.cos(incidence_angle), 1e-4, 1.0)
    m = jnp.maximum(roughness, 1e-3)
    c2 = c * c
    t2 = (1.0 - c2) / c2
    d = jnp.exp(-t2 / (m * m)) / (jnp.pi * m * m * c2 * c2)
    g = jnp.minimum(1.0, 2.0 * c2)
    f = fresnel_f0 + (1.0 - fresnel_f0) * jnp.power(1.0 - c, 5.0)
    spec = d * g * f / (jnp.pi * c)
    return (k_diffuse * c + (1.0 - k_diffuse) * spec) * energy
