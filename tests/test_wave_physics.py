"""Golden-value and property tests for the wave physics layer.

Oracles: independent NumPy implementations of the same formulas, mirroring
how the reference validated its C++ against the 2-D python prototypes
(scripts/reflections/fresnel.py, scripts/radarays_snell_fresnel_brdf.py;
SURVEY.md §4).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radarays_ros_tpu.wave.fresnel import (
    back_reflection_shader,
    fresnel_split,
    get_incidence_angle,
)
from radarays_ros_tpu.wave.radar_math import erfinvf, quantile
from radarays_ros_tpu.wave.cone import (
    rotate_pitch_yaw,
    sample_cone_dirs,
    sample_cone_local,
    sample_cone_mean,
)
from radarays_ros_tpu.wave.types import Waves, broadcast_waves, make_start_wave_attrs


# ------------------------------------------------------------------ erfinv

def test_erfinvf_matches_scipy_quality():
    x = np.linspace(-0.999, 0.999, 201).astype(np.float32)
    ours = np.asarray(erfinvf(x))
    ref = np.asarray(jax.scipy.special.erfinv(x.astype(np.float64)))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_quantile():
    # quantile(0.8) of the standard normal ~ 0.8416
    assert abs(float(quantile(0.8)) - 0.8416) < 1e-3
    assert abs(float(quantile(0.5))) < 1e-6


# ------------------------------------------------------------------ fresnel

def fresnel_scalar_oracle(normal, dir, energy, pol, v1, v2):
    """Direct NumPy transliteration of the formulas (branchy scalar code)."""
    normal = np.asarray(normal, np.float64)
    dir = np.asarray(dir, np.float64)
    n1, n2 = v2, v1
    i_angle = np.arccos(np.clip(np.dot(-dir, normal), -1, 1))
    refl_dir = dir + normal * 2.0 * np.dot(-normal, dir)
    refr_dir = np.zeros(3)
    n_work = normal.copy()
    if n1 > 0.0:
        n21 = n2 / n1
        angle_limit = np.arcsin(n21) if abs(n21) <= 1.0 else 100.0
        if i_angle <= angle_limit:
            if np.dot(n_work, dir) > 0.0:
                n_work = -n_work
            if n2 > 0.0:
                n12 = n1 / n2
                c = np.cos(i_angle)
                refr_dir = dir * n12 + n_work * (n12 * c - np.sqrt(1 - n12 * n12 * (1 - c * c)))
    r_angle = np.arccos(np.clip(np.dot(refr_dir, -n_work), -1, 1))
    eps = 1e-4
    if i_angle + r_angle < eps:
        rs = rp = (n1 - n2) / (n1 + n2)
    elif i_angle + r_angle > np.pi - eps:
        rs = rp = 1.0
    else:
        rs = -np.sin(i_angle - r_angle) / np.sin(i_angle + r_angle)
        rp = np.tan(i_angle - r_angle) / np.tan(i_angle + r_angle)
    Reff = pol * rs * rs + (1 - pol) * rp * rp
    return refl_dir, refr_dir, Reff * energy, (1 - Reff) * energy


@pytest.mark.parametrize("angle_deg", [0.0, 10.0, 30.0, 45.0, 60.0, 80.0, 89.0])
@pytest.mark.parametrize("v1,v2", [(0.3, 0.15), (0.3, 0.0), (0.15, 0.3), (0.3, 0.3)])
def test_fresnel_matches_oracle(angle_deg, v1, v2):
    a = np.deg2rad(angle_deg)
    normal = np.array([0.0, 0.0, 1.0])
    dir = np.array([np.sin(a), 0.0, -np.cos(a)])
    refl_o, refr_o, re_o, te_o = fresnel_scalar_oracle(normal, dir, 1.0, 0.5, v1, v2)

    res = fresnel_split(
        jnp.asarray(normal, jnp.float32), jnp.asarray(dir, jnp.float32),
        jnp.float32(1.0), jnp.float32(0.5), jnp.float32(v1), jnp.float32(v2),
    )
    np.testing.assert_allclose(np.asarray(res.reflection_dir), refl_o, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.refraction_dir), refr_o, atol=1e-4)
    np.testing.assert_allclose(float(res.reflection_energy), re_o, atol=2e-4)
    np.testing.assert_allclose(float(res.refraction_energy), te_o, atol=2e-4)


def test_fresnel_energy_conservation():
    key = jax.random.PRNGKey(0)
    n = 512
    k1, k2, k3 = jax.random.split(key, 3)
    normal = jnp.array([0.0, 0.0, 1.0])[None, :].repeat(n, 0)
    a = jax.random.uniform(k1, (n,), minval=0.0, maxval=jnp.pi / 2 - 0.01)
    dir = jnp.stack([jnp.sin(a), jnp.zeros_like(a), -jnp.cos(a)], -1)
    v1 = jax.random.uniform(k2, (n,), minval=0.01, maxval=0.3)
    v2 = jax.random.uniform(k3, (n,), minval=0.0, maxval=0.3)
    e = jnp.ones(n)
    res = fresnel_split(normal, dir, e, jnp.full((n,), 0.5), v1, v2)
    total = res.reflection_energy + res.refraction_energy
    np.testing.assert_allclose(np.asarray(total), 1.0, atol=1e-5)
    assert np.all(np.asarray(res.reflection_energy) >= -1e-6)
    assert np.all(np.asarray(res.refraction_energy) >= -1e-6)


def test_total_internal_reflection():
    # slow->fast medium beyond the critical angle: all energy reflects
    v1, v2 = 0.1, 0.3  # n1 = 0.3, n2 = 0.1 -> critical angle ~19.5 deg
    a = np.deg2rad(45.0)
    normal = jnp.array([0.0, 0.0, 1.0])
    dir = jnp.array([np.sin(a), 0.0, -np.cos(a)], dtype=jnp.float32)
    res = fresnel_split(normal, dir, 1.0, 0.5, v1, v2)
    assert float(res.reflection_energy) == pytest.approx(1.0, abs=1e-5)
    np.testing.assert_allclose(np.asarray(res.refraction_dir), 0.0, atol=1e-7)


def test_zero_velocity_material_full_reflection():
    # wall-stone (velocity 0, config/mulran_kaist02.yaml): nothing transmits
    normal = jnp.array([0.0, 0.0, 1.0])
    a = np.deg2rad(30.0)
    dir = jnp.array([np.sin(a), 0.0, -np.cos(a)], dtype=jnp.float32)
    res = fresnel_split(normal, dir, 1.0, 0.5, 0.3, 0.0)
    assert float(res.reflection_energy) == pytest.approx(1.0, abs=1e-5)
    assert float(res.refraction_energy) == pytest.approx(0.0, abs=1e-5)


def test_fresnel_differentiable():
    def loss(v2):
        normal = jnp.array([0.0, 0.0, 1.0])
        dir = jnp.array([0.5, 0.0, -np.sqrt(0.75)], dtype=jnp.float32)
        return fresnel_split(normal, dir, 1.0, 0.5, 0.3, v2).reflection_energy

    g = jax.grad(loss)(jnp.float32(0.15))
    assert np.isfinite(float(g))
    assert abs(float(g)) > 0.0


# ------------------------------------------------------------------ shader

def test_back_reflection_shader():
    # I = (diffuse + spec_fac * cos^exp) * E (radar_algorithms.h:168-187)
    val = back_reflection_shader(jnp.float32(0.0), 2.0, 0.5, 0.25, 10.0)
    assert float(val) == pytest.approx((0.5 + 0.25) * 2.0, abs=1e-6)
    val = back_reflection_shader(jnp.float32(np.pi / 3), 1.0, 0.1, 1.0, 2.0)
    assert float(val) == pytest.approx(0.1 + 0.25, abs=1e-5)
    # back-facing guard: cos clamped at 0, no NaN
    val = back_reflection_shader(jnp.float32(2.5), 1.0, 0.1, 1.0, 2.5)
    assert float(val) == pytest.approx(0.1, abs=1e-6)


def test_incidence_angle():
    n = jnp.array([0.0, 0.0, 1.0])
    d = jnp.array([0.0, 0.0, -1.0])
    assert float(get_incidence_angle(n, d)) == pytest.approx(0.0, abs=1e-6)


# ------------------------------------------------------------------ cone

@pytest.mark.parametrize("dist", [0, 1, 2, 3])
def test_sample_cone_shapes_and_spread(dist):
    key = jax.random.PRNGKey(1)
    width = np.deg2rad(8.0)
    dirs = sample_cone_local(key, width, 512, dist, 0.8)
    assert dirs.shape == (512, 3)
    norms = np.linalg.norm(np.asarray(dirs), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # angular distance from +x
    ang = np.arccos(np.clip(np.asarray(dirs)[:, 0], -1, 1))
    if dist in (0, 1):
        assert ang.max() <= width / 2 + 1e-4
    if dist == 2:
        # ~80% of samples within the cone radius (p_in_cone=0.8 is two-sided)
        frac = np.mean(ang <= width / 2 + 1e-6)
        assert 0.7 < frac < 0.95


def test_sample_cone_mean_contains_mean_ray():
    key = jax.random.PRNGKey(2)
    mean = jnp.array([0.0, 1.0, 0.0])
    dirs = sample_cone_mean(key, mean, 0.1, 16, 2, 0.8)
    np.testing.assert_allclose(np.asarray(dirs[0]), [0, 1, 0], atol=1e-6)


def test_rotate_pitch_yaw_matches_matrix():
    rng = np.random.default_rng(0)
    for _ in range(10):
        a, b = rng.uniform(-1, 1, 2)
        v = rng.normal(size=3)
        Ry = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]])
        Rz = np.array([[np.cos(b), -np.sin(b), 0], [np.sin(b), np.cos(b), 0], [0, 0, 1]])
        want = Rz @ Ry @ v
        got = np.asarray(rotate_pitch_yaw(jnp.float32(a), jnp.float32(b), jnp.asarray(v, jnp.float32)))
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_cone_differentiable_in_width():
    def mean_angle(width):
        dirs = sample_cone_dirs(jax.random.PRNGKey(3), jnp.array([1.0, 0, 0]),
                                width, 64, 1, 0.8)
        return jnp.mean(jnp.arccos(jnp.clip(dirs[:, 0], -1, 1)))

    g = jax.grad(mean_angle)(jnp.float32(0.2))
    assert np.isfinite(float(g)) and float(g) > 0.0


# ------------------------------------------------------------------ waves

def test_wave_move():
    w = broadcast_waves(
        jnp.zeros(3), jnp.array([1.0, 0, 0]), make_start_wave_attrs(), (4,)
    )
    w2 = w.move(3.0)
    np.testing.assert_allclose(np.asarray(w2.orig[0]), [3.0, 0, 0], atol=1e-6)
    assert float(w2.time[0]) == pytest.approx(10.0, abs=1e-5)  # 3 m / 0.3 m/ns


# ------------------------------------------------------------ transforms

def test_quat_to_matrix_golden():
    from radarays_ros_tpu.utils.transforms import quat_from_euler, quat_to_matrix

    # yaw 90deg: +x maps to +y
    q = quat_from_euler(0.0, 0.0, np.pi / 2)
    R = np.asarray(quat_to_matrix(jnp.asarray(q, jnp.float32)))
    np.testing.assert_allclose(R @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)
    # rotation matrices are orthonormal
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)


def test_interpolate_poses_endpoints():
    from radarays_ros_tpu.utils.transforms import (
        identity_pose, interpolate_poses, make_pose, quat_from_euler)

    pa = identity_pose()
    pb = make_pose([2.0, 0, 0], quat_from_euler(0, 0, np.pi / 2))
    out = np.asarray(interpolate_poses(pa, pb, jnp.asarray([0.0, 1.0])))
    np.testing.assert_allclose(out[0], pa, atol=1e-6)
    # endpoint equals pb up to quaternion sign
    assert min(np.linalg.norm(out[1] - pb),
               np.linalg.norm(out[1] - np.concatenate([pb[:3], -pb[3:]]))) < 1e-5


def test_azimuth_angles_spin_direction():
    from radarays_ros_tpu.utils.transforms import azimuth_angles

    th = np.asarray(azimuth_angles(400))
    assert th[0] == 0.0
    assert th[1] < 0.0  # clockwise spin (theta.inc = -2pi/400, Radar.cpp:27-32)
    np.testing.assert_allclose(th[200], -np.pi, atol=1e-5)
