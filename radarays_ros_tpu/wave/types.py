"""Wave bundle types — structure-of-arrays pytrees.

The reference carries per-wave state in an AoS `DirectedWave` struct
(radar_types.h:63-121: ray, energy, polarization, velocity, frequency, travel
time, current material id) plus a ray-less `DirectedWaveAttributes` SoA twin
for the GPU (radar_types.h:29-61). On TPU the natural layout is SoA from the
start: a `Waves` NamedTuple of arrays with a shared leading batch shape, plus
an explicit `valid` mask replacing the reference's dynamic-list energy pruning
(RadarCPU.cpp:288-370) and zero-direction dead rays (radar_algorithms.cu:544).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Waves(NamedTuple):
    """Batch of directed waves. All fields share the leading batch shape."""

    orig: jnp.ndarray          # (..., 3) float32 — ray origin
    dir: jnp.ndarray           # (..., 3) float32 — ray direction (unit)
    energy: jnp.ndarray        # (...,)   float32 — user-defined energy
    polarization: jnp.ndarray  # (...,)   float32 — 1=s-pol, 0=p-pol, 0.5=unpolarized
    velocity: jnp.ndarray      # (...,)   float32 — wave speed in current medium [m/ns]
    time: jnp.ndarray          # (...,)   float32 — accumulated travel time [ns]
    material_id: jnp.ndarray   # (...,)   int32   — current medium material id
    valid: jnp.ndarray         # (...,)   bool    — alive mask (energy pruning etc.)

    @property
    def batch_shape(self):
        return self.energy.shape

    def move(self, distance: jnp.ndarray) -> "Waves":
        """Advance origin along dir and accumulate travel time.

        Mirrors DirectedWave::moveInplace (radar_types.h:108-113):
        orig += dir * d; time += d / velocity.
        """
        d = jnp.asarray(distance, self.orig.dtype)
        return self._replace(
            orig=self.orig + self.dir * d[..., None],
            time=self.time + d / self.velocity,
        )


def make_start_wave_attrs(
    *,
    energy: float = 1.0,
    polarization: float = 0.5,
    velocity: float = 0.3,
    material_id: int = 0,
    time: float = 0.0,
):
    """Non-geometric attributes of the transmit wave.

    Defaults mirror the transmit wave of the reference engines
    (RadarCPU.cpp:106-114): unit energy, unpolarized, air speed 0.3 m/ns,
    air material id 0, zero travel time. (The 76.5 GHz carrier frequency of
    the reference is never used in its compute path and is dropped here.)
    """
    return dict(
        energy=jnp.float32(energy),
        polarization=jnp.float32(polarization),
        velocity=jnp.float32(velocity),
        material_id=jnp.int32(material_id),
        time=jnp.float32(time),
    )


def broadcast_waves(orig, dir, attrs: dict, batch_shape) -> Waves:
    """Build a Waves bundle from geometry plus scalar attributes."""
    orig_b = jnp.broadcast_to(orig, batch_shape + (3,)).astype(jnp.float32)
    dir_b = jnp.broadcast_to(dir, batch_shape + (3,)).astype(jnp.float32)
    orig_b = orig_b + dir_b * 0.0  # unify varying axes (see below)
    # derive the attribute fields from the geometry (value 1.0) rather than
    # fresh constants: under shard_map, the bounce scan's carry must have
    # the same varying mesh axes as the body output, which the geometry
    # determines (parallel/sharding.py 2-D path)
    ones = orig_b[..., 0] * 0.0 + dir_b[..., 0] * 0.0 + 1.0
    return Waves(
        orig=orig_b,
        dir=dir_b,
        energy=ones * attrs["energy"],
        polarization=ones * attrs["polarization"],
        velocity=ones * attrs["velocity"],
        time=ones * attrs["time"],
        material_id=(ones * attrs["material_id"]).astype(jnp.int32),
        valid=ones > 0.5,
    )
