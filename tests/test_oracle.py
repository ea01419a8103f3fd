"""End-to-end oracle tests: the jitted pipeline vs an independent NumPy
scalar engine (tests/numpy_oracle.py) that shares no implementation with it.

This is the whole-frame complement of the golden unit tests: multi-bounce
with refraction, multipath, every denoiser, max-combine, and the noise
formula are validated bin-for-bin against reference-faithful per-wave
dynamic-list code (RadarCPU.cpp:30-564 order of operations).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radarays_ros_tpu.geom.primitives import make_box
from radarays_ros_tpu.geom.scene import Scene
from radarays_ros_tpu.sim.config import Materials, RadarModelConfig, RadarParams
from radarays_ros_tpu.sim.pipeline import simulate_frame_jit
from radarays_ros_tpu.utils.transforms import make_pose
from radarays_ros_tpu.wave.cone import sample_cone_local

from numpy_oracle import simulate_frame_oracle


def _scene():
    # closed room (normals point inward via reversed winding) + two pillars
    walls = make_box((0, 0, 0), (40.0, 40.0, 10.0))[:, ::-1, :]
    pillar = make_box((8.0, 2.0, 0.0), (2.0, 2.0, 10.0))
    slab = make_box((-6.0, -7.0, 0.0), (4.0, 1.0, 10.0))
    scene = Scene.compose([walls, pillar, slab], ["walls", "pillar", "slab"],
                          chunk_size=8)
    return scene


_MATERIALS = [
    dict(velocity=0.3, ambient=1.0, diffuse=0.0, specular=1.0),    # air
    dict(velocity=0.0, ambient=0.9, diffuse=0.1, specular=200.0),  # wall
    dict(velocity=0.15, ambient=0.4, diffuse=0.5, specular=40.0),  # glass
]
_OBJ_MATS = [1, 2, 2]  # walls=opaque, pillar+slab=transparent


def _run_both(cfg, seed=0, materials=None, obj_mats=None, noise_field_fn=None):
    scene = _scene()
    mats = materials or _MATERIALS
    om = obj_mats or _OBJ_MATS
    params = RadarParams.make(Materials.from_list(mats), om,
                              beam_width_deg=15.0)
    sa = scene.device_arrays()
    pose = jnp.asarray(make_pose([0.5, -0.3, 1.0]))
    key = jax.random.PRNGKey(seed)
    key_cone, key_noise = jax.random.split(key)

    res = simulate_frame_jit(sa, params, cfg, pose, (key_cone, key_noise))

    local_dirs = np.asarray(sample_cone_local(
        key_cone, params.beam_width, cfg.n_samples, cfg.beam_sample_dist,
        cfg.beam_sample_dist_normal_p_in_cone), np.float64)
    weights, mode = cfg.denoiser()
    noise_field = None if noise_field_fn is None else noise_field_fn(key_noise, cfg)
    mat_cols = {k: [m[k] for m in mats]
                for k in ("velocity", "ambient", "diffuse", "specular")}
    o_u8, o_img, o_max = simulate_frame_oracle(
        scene.verts, scene.obj_ids, mat_cols, om, cfg, local_dirs,
        np.asarray(pose, np.float64), denoise_weights=weights,
        denoise_mode=mode, noise_field=noise_field)
    return res, (o_u8, o_img, o_max)


def _assert_frames_match(res, oracle, u8_tol=1, frac=0.995):
    o_u8, o_img, o_max = oracle
    assert o_img.max() > 0, "oracle frame is empty — test scene is trivial"
    img = np.asarray(res.image_float, np.float64)
    mv = np.asarray(res.max_val, np.float64)

    # raw float image: f32 pipeline vs f64 oracle
    scale = max(o_img.max(), 1e-9)
    np.testing.assert_allclose(img, o_img, atol=2e-4 * scale, rtol=2e-3)
    np.testing.assert_allclose(mv, o_max, rtol=1e-4, atol=1e-6)

    # quantized frame: bin-for-bin within rounding of the f32/f64 gap
    got = np.asarray(res.image_u8).astype(int)
    want = o_u8.astype(int)
    diff = np.abs(got - want)
    assert (diff <= u8_tol).mean() >= frac, (
        f"u8 mismatch: {(diff > u8_tol).sum()} px, max {diff.max()}")
    assert diff.max() <= 3


_BASE = dict(n_angles=16, n_cells=128, resolution=0.25, n_samples=6,
             beam_sample_dist=2, ambient_noise=0)


def test_oracle_multibounce_refraction():
    """3 bounces with refraction through transparent pillars, triangular
    denoise — the full wave tree against per-wave dynamic lists."""
    cfg = RadarModelConfig(**_BASE, n_reflections=3,
                           record_multi_reflection=True,
                           signal_denoising=1,
                           signal_denoising_triangular_width=7,
                           signal_denoising_triangular_mode=0.4)
    res, oracle = _run_both(cfg)
    assert np.asarray(res.image_u8).max() > 0  # non-trivial frame
    _assert_frames_match(res, oracle)


def test_oracle_multipath():
    """Multipath air-return signals (RadarCPU.cpp:325-360) on opaque walls."""
    cfg = RadarModelConfig(**_BASE, n_reflections=3,
                           record_multi_reflection=True,
                           record_multi_path=True, multipath_threshold=0.3,
                           signal_denoising=1,
                           signal_denoising_triangular_width=7,
                           signal_denoising_triangular_mode=0.4)
    mats = [_MATERIALS[0], _MATERIALS[1],
            dict(velocity=0.0, ambient=0.5, diffuse=0.4, specular=60.0)]
    res, oracle = _run_both(cfg, materials=mats)
    # sanity: multipath actually added signals vs the multipath-off frame
    cfg_off = cfg.replace(record_multi_path=False)
    res_off, _ = _run_both(cfg_off, materials=mats)
    assert not np.array_equal(np.asarray(res.image_u8),
                              np.asarray(res_off.image_u8))
    _assert_frames_match(res, oracle)


@pytest.mark.parametrize("denoising,width_field,mode_field", [
    (2, "signal_denoising_gaussian_width", "signal_denoising_gaussian_mode"),
    (3, "signal_denoising_mb_width", "signal_denoising_mb_mode"),
])
def test_oracle_denoisers(denoising, width_field, mode_field):
    cfg = RadarModelConfig(**_BASE, n_reflections=2,
                           record_multi_reflection=True,
                           signal_denoising=denoising,
                           **{width_field: 9, mode_field: 0.45})
    res, oracle = _run_both(cfg)
    _assert_frames_match(res, oracle)


def test_oracle_max_combine():
    """signal_denoising=0: per-cell max combine (RadarCPU.cpp:434-448)."""
    cfg = RadarModelConfig(**_BASE, n_reflections=2,
                           record_multi_reflection=True, signal_denoising=0)
    res, oracle = _run_both(cfg)
    _assert_frames_match(res, oracle)


def _uniform_field(key_noise, cfg):
    # the pipeline's own field derivation (image/draw.py:apply_ambient_noise)
    # — PRNG streams are out of oracle scope; the amplitude/floor FORMULA
    # around the field is what the oracle re-implements independently
    _, k_uni = jax.random.split(key_noise)
    return np.asarray(jax.random.uniform(
        k_uni, (cfg.n_angles, cfg.n_cells), jnp.float32), np.float64)


def _perlin_field(key_noise, cfg):
    from radarays_ros_tpu.image.perlin import perlin_affine_rows

    k_begin, _ = jax.random.split(key_noise)
    begin = jax.random.randint(k_begin, (cfg.n_angles,), 0, 1000)
    cols = (cfg.scroll_image + np.arange(cfg.n_angles)) % cfg.n_angles
    y = jnp.asarray(cols, jnp.float32)
    lo, hi = (cfg.ambient_noise_perlin_scale_low,
              cfg.ambient_noise_perlin_scale_high)
    p1 = perlin_affine_rows(begin, y * lo, lo, cfg.n_cells)
    p2 = perlin_affine_rows(begin, y * hi, hi, cfg.n_cells)
    p = cfg.ambient_noise_perlin_p_low * p1 + \
        (1.0 - cfg.ambient_noise_perlin_p_low) * p2
    return np.asarray(p, np.float64)


@pytest.mark.parametrize("mode,field_fn", [(1, _uniform_field),
                                           (2, _perlin_field)])
def test_oracle_ambient_noise(mode, field_fn):
    """Signal-adaptive noise amplitude + exponential floor
    (RadarCPU.cpp:459-528) over the same noise field."""
    base = dict(_BASE)
    base["ambient_noise"] = mode
    cfg = RadarModelConfig(**base, n_reflections=2,
                           record_multi_reflection=True,
                           signal_denoising=1,
                           signal_denoising_triangular_width=7,
                           signal_denoising_triangular_mode=0.4,
                           ambient_noise_at_signal_0=0.2,
                           ambient_noise_at_signal_1=0.05,
                           ambient_noise_energy_max=0.3,
                           ambient_noise_energy_min=0.1)
    res, oracle = _run_both(cfg, noise_field_fn=field_fn)
    _assert_frames_match(res, oracle)


def test_oracle_scroll_and_opaque_fast_path():
    """scroll_image column placement + the lax.scan opaque fast path against
    the oracle's dynamic lists (all-opaque materials)."""
    cfg = RadarModelConfig(**_BASE, n_reflections=3,
                           record_multi_reflection=True, scroll_image=5,
                           signal_denoising=0, opaque_materials=True)
    mats = [_MATERIALS[0], _MATERIALS[1], _MATERIALS[1]]
    res, oracle = _run_both(cfg, materials=mats)
    _assert_frames_match(res, oracle)
