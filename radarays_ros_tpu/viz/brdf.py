"""BRDF / Fresnel curve explorer — scripts/radarays_snell_fresnel_brdf.py,
data-first.

The reference ships an interactive matplotlib explorer for the
back-reflection energy model and the Snell/Fresnel split (README.md:41-49).
Here the same curves are produced as arrays for plotting, fitting or
asserting: sweep the incidence angle, return the shader response and the
reflectance/transmittance split for a material pair.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax.numpy as jnp

from radarays_ros_tpu.wave.fresnel import back_reflection_shader, fresnel_split


def brdf_curve(ambient: float, diffuse: float, specular: float,
               n_points: int = 181) -> Dict:
    """Back-reflection energy vs incidence angle (the reference's
    A + B*cos^C polynomial with the material call-site convention)."""
    angles = np.linspace(0.0, np.pi / 2.0, n_points)
    energy = np.asarray(back_reflection_shader(
        jnp.asarray(angles, jnp.float32), 1.0,
        diffuse=ambient, specular_fac=diffuse, specular_exp=specular))
    return {"angle_rad": angles.tolist(), "energy": energy.tolist()}


def fresnel_curve(v1: float, v2: float, polarization: float = 0.5,
                  n_points: int = 181) -> Dict:
    """Reff/Teff and refraction angle vs incidence angle for a velocity pair.

    Mirrors the slider plot of radarays_snell_fresnel_brdf.py: sweep the
    incidence direction in the xz-plane against an upward-facing surface.
    """
    angles = np.linspace(0.0, np.pi / 2.0 - 1e-3, n_points).astype(np.float32)
    d = np.stack([np.sin(angles), np.zeros_like(angles), -np.cos(angles)], -1)
    n = np.broadcast_to(np.array([0.0, 0.0, 1.0], np.float32), d.shape)
    res = fresnel_split(
        jnp.asarray(n), jnp.asarray(d),
        jnp.ones(n_points, jnp.float32),
        jnp.full(n_points, polarization, jnp.float32),
        jnp.full(n_points, v1, jnp.float32),
        jnp.full(n_points, v2, jnp.float32),
    )
    refr = np.asarray(res.refraction_dir)
    refr_angle = np.degrees(np.arctan2(np.abs(refr[:, 0]),
                                       np.maximum(-refr[:, 2], 1e-12)))
    transmits = np.sum(refr * refr, axis=-1) > 0.25
    return {
        "angle_rad": angles.tolist(),
        "reflectance": np.asarray(res.reflection_energy).tolist(),
        "transmittance": np.asarray(res.refraction_energy).tolist(),
        "refraction_angle_deg": np.where(transmits, refr_angle, np.nan).tolist(),
        "total_internal_reflection": (~transmits).tolist(),
    }
