"""Scalar radar math helpers.

Counterpart of the reference's include/radarays_ros/radar_math.h: the speed of
light constant (radar_math.h:10), the fast float inverse error function
(radar_math.h:13-44) and the normal-distribution quantile used to scale cone
sampling radii (radar_math.h:46-49).

We expose two erfinv flavors:
  * `erfinvf`      — single-precision polynomial approximation (two branches on
                     |log(1-a^2)|), matching the reference bit-for-bit on CPU so
                     the cone-sampling z-score is reproducible.
  * jax.scipy.special.erfinv — used interchangeably; tests assert agreement.
"""

from __future__ import annotations

import jax.numpy as jnp

# Speed of light in vacuum [m/s] (radar_math.h:10). The wave model itself works
# in m/ns, where air velocity is 0.3.
M_C = 2.99792458e8


def erfinvf(a):
    """Fast polynomial approximation of erf^-1 for float32 inputs.

    Mirrors the two-branch fused-multiply-add polynomial of radar_math.h:13-44
    (max ulp error ~2.36). Branchless: both polynomials are evaluated and the
    result selected with a where on |t| > 6.125.
    """
    a = jnp.asarray(a, jnp.float32)
    t = 1.0 - a * a
    t = jnp.log(jnp.maximum(t, jnp.finfo(jnp.float32).tiny))

    # |t| large branch (tail)
    p_tail = jnp.float32(3.03697567e-10)
    for c in (
        2.93243101e-8,
        1.22150334e-6,
        2.84108955e-5,
        3.93552968e-4,
        3.02698812e-3,
        4.83185798e-3,
        -2.64646143e-1,
        8.40016484e-1,
    ):
        p_tail = p_tail * t + jnp.float32(c)

    # |t| small branch (core)
    p_core = jnp.float32(5.43877832e-9)
    for c in (
        1.43285448e-7,
        1.22774793e-6,
        1.12963626e-7,
        -5.61530760e-5,
        -1.47697632e-4,
        2.31468678e-3,
        1.15392581e-2,
        -2.32015476e-1,
        8.86226892e-1,
    ):
        p_core = p_core * t + jnp.float32(c)

    p = jnp.where(jnp.abs(t) > 6.125, p_tail, p_core)
    return a * p


def quantile(p):
    """Standard-normal quantile via erfinv (radar_math.h:46-49).

    quantile(p) = sqrt(2) * erfinv(2p - 1). Used to find the z-score such that
    a fraction `p_in_cone` of normally distributed samples falls inside the
    beam cone.
    """
    return jnp.sqrt(jnp.float32(2.0)) * erfinvf(2.0 * jnp.asarray(p, jnp.float32) - 1.0)
