"""End-to-end frame pipeline tests on a tiny analytic scene."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radarays_ros_tpu.sim.config import Materials, RadarModelConfig, RadarParams
from radarays_ros_tpu.sim.pipeline import simulate_frame, simulate_frame_jit
from radarays_ros_tpu.sim.radar import Radar
from radarays_ros_tpu.utils.transforms import identity_pose, make_pose


def _small_cfg(**kw):
    base = dict(
        n_angles=16,
        n_cells=128,
        n_samples=4,
        n_reflections=2,
        resolution=0.25,
        beam_sample_dist=2,
        signal_denoising=1,
        signal_denoising_triangular_width=5,
        signal_denoising_triangular_mode=0.4,
        ambient_noise=0,
        trace_engine="mxu",
        trace_ray_block=256,
    )
    base.update(kw)
    return RadarModelConfig(**base)


@pytest.fixture(scope="module")
def box_setup(box_scene, simple_materials):
    params = RadarParams.make(simple_materials, [1, 2], beam_width_deg=2.0)
    return box_scene.device_arrays(), params


def test_frame_shapes_and_dtype(box_setup):
    sa, params = box_setup
    cfg = _small_cfg()
    res = simulate_frame(sa, params, cfg, identity_pose(), jax.random.PRNGKey(0))
    assert res.image_u8.shape == (128, 16)
    assert res.image_u8.dtype == jnp.uint8
    assert res.image_float.shape == (16, 128)
    assert res.max_val.shape == (16,)


def test_wall_appears_at_correct_range(box_setup):
    """Sensor at origin in a 40 m box: walls at ~20 m -> cell ~80 (res 0.25)."""
    sa, params = box_setup
    cfg = _small_cfg(ambient_noise=0)
    res = simulate_frame(sa, params, cfg, identity_pose(), jax.random.PRNGKey(0))
    img = np.asarray(res.image_u8)
    assert img.max() > 0
    # beam 0 looks along +x: pillar face at 7 m -> cell 28
    col0 = img[:, 0]
    peak = col0.argmax()
    assert abs(int(peak) - 28) <= 3
    # beam 8 (opposite direction, theta = -pi) looks along -x: wall at 20 m
    col8 = img[:, 8]
    assert abs(int(col8.argmax()) - 80) <= 3


def test_jit_matches_eager(box_setup):
    sa, params = box_setup
    cfg = _small_cfg()
    key = jax.random.PRNGKey(1)
    eager = simulate_frame(sa, params, cfg, identity_pose(), key)
    jitted = simulate_frame_jit(sa, params, cfg, identity_pose(), key)
    np.testing.assert_array_equal(np.asarray(eager.image_u8),
                                  np.asarray(jitted.image_u8))


def test_deterministic_given_key(box_setup):
    sa, params = box_setup
    cfg = _small_cfg(ambient_noise=2)
    key = jax.random.PRNGKey(3)
    a = simulate_frame(sa, params, cfg, identity_pose(), key)
    b = simulate_frame(sa, params, cfg, identity_pose(), key)
    np.testing.assert_array_equal(np.asarray(a.image_u8), np.asarray(b.image_u8))


def test_pose_translation_shifts_range(box_setup):
    sa, params = box_setup
    cfg = _small_cfg()
    # move sensor 4 m toward the pillar: pillar face at 3 m -> cell 12
    pose = make_pose([4.0, 0, 0])
    res = simulate_frame(sa, params, cfg, pose, jax.random.PRNGKey(0))
    col0 = np.asarray(res.image_u8)[:, 0]
    assert abs(int(col0.argmax()) - 12) <= 3


def test_per_azimuth_poses_accepted(box_setup):
    sa, params = box_setup
    cfg = _small_cfg()
    poses = np.tile(identity_pose(), (16, 1))
    res = simulate_frame(sa, params, cfg, poses, jax.random.PRNGKey(0))
    assert res.image_u8.shape == (128, 16)


def test_multibounce_adds_signals(box_setup):
    sa, params = box_setup
    cfg1 = _small_cfg(n_reflections=1, record_multi_reflection=True)
    cfg3 = _small_cfg(n_reflections=3, record_multi_reflection=True)
    key = jax.random.PRNGKey(0)
    r1 = simulate_frame(sa, params, cfg1, identity_pose(), key)
    r3 = simulate_frame(sa, params, cfg3, identity_pose(), key)
    # multi-bounce must add energy somewhere (floats pre-normalization)
    assert float(np.asarray(r3.image_float).sum()) > float(np.asarray(r1.image_float).sum())


def test_multipath_mode_runs(box_setup):
    sa, params = box_setup
    cfg = _small_cfg(record_multi_path=True, multipath_threshold=0.2,
                     n_reflections=3)
    res = simulate_frame(sa, params, cfg, identity_pose(), jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(res.image_float)).all()


def test_scroll_image_rolls_columns(box_setup):
    sa, params = box_setup
    key = jax.random.PRNGKey(0)
    r0 = simulate_frame(sa, params, _small_cfg(scroll_image=0), identity_pose(), key)
    r5 = simulate_frame(sa, params, _small_cfg(scroll_image=5), identity_pose(), key)
    np.testing.assert_array_equal(
        np.roll(np.asarray(r0.image_u8), 5, axis=1), np.asarray(r5.image_u8))


def test_ambient_noise_fills_empty_cells(box_setup):
    sa, params = box_setup
    cfg = _small_cfg(ambient_noise=2)
    res = simulate_frame(sa, params, cfg, identity_pose(), jax.random.PRNGKey(0))
    img = np.asarray(res.image_u8)
    # with perlin ambient noise most cells are non-zero
    assert (img > 0).mean() > 0.5


def test_gradients_flow_to_materials(box_setup):
    sa, params = box_setup
    cfg = _small_cfg(ambient_noise=0)

    def loss(diffuse):
        mats = params.materials._replace(diffuse=diffuse)
        p = params._replace(materials=mats)
        res = simulate_frame(sa, p, cfg, identity_pose(), jax.random.PRNGKey(0))
        return jnp.sum(res.image_float)

    g = jax.grad(loss)(params.materials.diffuse)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.any(g != 0.0)


def test_radar_class_interface(box_scene, simple_materials):
    params = RadarParams.make(simple_materials, [1, 2], beam_width_deg=2.0)
    radar = Radar(box_scene, params, _small_cfg())
    img1 = radar.simulate_image(identity_pose())
    assert img1.shape == (128, 16)
    # last-pose fallback
    img2 = radar.simulate_image()
    assert img2.shape == (128, 16)
    # reconfigure triggers recompile path but works
    radar.update_config(n_cells=64)
    img3 = radar.simulate_image(identity_pose())
    assert img3.shape == (64, 16)


def test_pose_extrapolation_fallback(box_scene, simple_materials):
    """simulate() with a stamp but no pose extrapolates from the last two
    stamped poses — linear translation + slerp rotation along the geodesic
    (the Radar.cpp:102-121 TF-failure fallback, upgraded from the
    reference's verbatim last-pose reuse)."""
    from radarays_ros_tpu.utils.transforms import make_pose, quat_from_euler

    params = RadarParams.make(simple_materials, [1, 2], beam_width_deg=2.0)
    radar = Radar(box_scene, params, _small_cfg())
    p0 = make_pose([0.0, 0.0, 0.0], quat_from_euler(0, 0, 0.0))
    p1 = make_pose([1.0, 2.0, 0.0], quat_from_euler(0, 0, 0.1))
    radar.simulate(p0, stamp=10.0)
    radar.simulate(p1, stamp=11.0)

    # the extrapolation arithmetic: one stamp interval past p1
    ext = radar.extrapolate_pose(12.0)
    np.testing.assert_allclose(ext[0:3], [2.0, 4.0, 0.0], atol=1e-5)
    expect_q = np.asarray(quat_from_euler(0, 0, 0.2), np.float32)
    q = ext[3:7] * np.sign(np.dot(ext[3:7], expect_q))
    np.testing.assert_allclose(q, expect_q, atol=1e-5)
    # fractional extrapolation interpolates on the same line/geodesic
    half = radar.extrapolate_pose(10.5)
    np.testing.assert_allclose(half[0:3], [0.5, 1.0, 0.0], atol=1e-5)

    # wired into simulate(): the frame runs at the extrapolated pose
    radar.simulate_image(stamp=12.0)
    np.testing.assert_allclose(radar._last_pose[0:3], [2.0, 4.0, 0.0],
                               atol=1e-5)
    # without a stamp, the fallback is the reference's verbatim reuse
    np.testing.assert_allclose(radar.extrapolate_pose(None),
                               radar._last_pose)


def test_energy_decreases_with_range_monotone_shading(box_setup):
    """Farther wall -> same strength shader but later time; check binning."""
    sa, params = box_setup
    cfg = _small_cfg(ambient_noise=0, signal_denoising=0)
    res = simulate_frame(sa, params, cfg, identity_pose(), jax.random.PRNGKey(0))
    img = np.asarray(res.image_float)
    assert np.isfinite(img).all()
    assert img.min() >= 0.0


def test_simulate_frames_batched_matches_loop(box_scene, simple_materials):
    """vmapped multi-frame API must equal per-frame calls."""
    import jax

    from radarays_ros_tpu.sim.config import RadarModelConfig, RadarParams
    from radarays_ros_tpu.sim.pipeline import simulate_frame, simulate_frames
    from radarays_ros_tpu.utils.transforms import identity_pose, make_pose

    cfg = RadarModelConfig(n_angles=8, n_cells=32, n_samples=2,
                           n_reflections=1, resolution=0.5,
                           signal_denoising=0, ambient_noise=2)
    params = RadarParams.make(simple_materials, [1, 2], beam_width_deg=2.0)
    scene = box_scene.device_arrays()
    poses = np.stack([identity_pose(), make_pose([1.0, 0.5, 0.0])])
    keys = jax.random.split(jax.random.PRNGKey(3), 2)

    batched = simulate_frames(scene, params, cfg, poses, keys)
    assert batched.image_u8.shape == (2, cfg.n_cells, cfg.n_angles)
    for i in range(2):
        single = simulate_frame(scene, params, cfg, poses[i], keys[i])
        np.testing.assert_allclose(np.asarray(batched.image_float[i]),
                                   np.asarray(single.image_float),
                                   rtol=1e-5, atol=1e-5)


def test_include_motion_per_azimuth_poses(box_scene, simple_materials):
    """(n_angles, 7) poses (include_motion) must differ from a static pose."""
    import jax

    from radarays_ros_tpu.sim.config import RadarModelConfig, RadarParams
    from radarays_ros_tpu.sim.pipeline import simulate_frame
    from radarays_ros_tpu.utils.transforms import identity_pose, interpolate_poses, make_pose

    cfg = RadarModelConfig(n_angles=16, n_cells=64, n_samples=2,
                           n_reflections=1, resolution=0.5,
                           signal_denoising=0, ambient_noise=0)
    params = RadarParams.make(simple_materials, [1, 2], beam_width_deg=2.0)
    scene = box_scene.device_arrays()
    key = jax.random.PRNGKey(0)

    pose_a = identity_pose()
    pose_b = make_pose([4.0, 2.0, 0.0])
    alphas = jnp.linspace(0.0, 1.0, cfg.n_angles)
    poses = interpolate_poses(pose_a, pose_b, alphas)

    static = simulate_frame(scene, params, cfg, pose_a, key)
    moving = simulate_frame(scene, params, cfg, poses, key)
    assert moving.image_u8.shape == static.image_u8.shape
    # first azimuth matches the static start pose; later ones diverge
    np.testing.assert_array_equal(np.asarray(moving.image_u8[:, 0]),
                                  np.asarray(static.image_u8[:, 0]))
    assert not np.array_equal(np.asarray(moving.image_u8),
                              np.asarray(static.image_u8))


def test_opaque_materials_mode_matches_full(box_scene):
    """With all object velocities 0, dropping the refraction branch must be
    exactly equivalent (Fresnel gives Teff = 0)."""
    import jax

    from radarays_ros_tpu.sim.config import Materials, RadarModelConfig, RadarParams
    from radarays_ros_tpu.sim.pipeline import simulate_frame
    from radarays_ros_tpu.utils.transforms import identity_pose

    mats = Materials.from_list([
        dict(velocity=0.3, ambient=1.0, diffuse=0.0, specular=1.0),
        dict(velocity=0.0, ambient=1.0, diffuse=0.0, specular=3000.0),
        dict(velocity=0.0, ambient=1.0, diffuse=0.2, specular=100.0),
    ])
    params = RadarParams.make(mats, [1, 2], beam_width_deg=4.0)
    scene = box_scene.device_arrays()
    key = jax.random.PRNGKey(2)
    base = dict(n_angles=16, n_cells=96, n_samples=4, n_reflections=3,
                resolution=0.5, signal_denoising=1,
                signal_denoising_triangular_width=5,
                signal_denoising_triangular_mode=0.4, ambient_noise=0,
                record_multi_reflection=True)
    full = simulate_frame(scene, params, RadarModelConfig(**base),
                          identity_pose(), key)
    slim = simulate_frame(scene, params,
                          RadarModelConfig(**base, opaque_materials=True),
                          identity_pose(), key)
    np.testing.assert_allclose(np.asarray(full.image_float),
                               np.asarray(slim.image_float),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(full.image_u8),
                                  np.asarray(slim.image_u8))


def test_golden_frame_regression(box_scene, simple_materials):
    """Full frame against a committed golden image (fixed key, all features
    on: 3 bounces, multipath, denoise, Perlin noise). Guards semantic
    regressions across refactors; regenerate deliberately if the pipeline's
    intended output changes (see tests/golden/)."""
    import pathlib

    import jax

    from radarays_ros_tpu.sim.config import RadarModelConfig, RadarParams
    from radarays_ros_tpu.sim.pipeline import simulate_frame
    from radarays_ros_tpu.utils.transforms import identity_pose

    golden = pathlib.Path(__file__).parent / "golden" / "frame_box_seed123.npy"
    params = RadarParams.make(simple_materials, [1, 2], beam_width_deg=4.0)
    cfg = RadarModelConfig(
        n_angles=32, n_cells=128, n_samples=6, n_reflections=3,
        resolution=0.4, signal_denoising=1,
        signal_denoising_triangular_width=9,
        signal_denoising_triangular_mode=0.4, ambient_noise=2,
        record_multi_reflection=True, record_multi_path=True)
    res = simulate_frame(box_scene.device_arrays(), params, cfg,
                         identity_pose(), jax.random.PRNGKey(123))
    got = np.asarray(res.image_u8).astype(np.int32)
    want = np.load(golden).astype(np.int32)
    # allow the odd 1-LSB rounding flip across backends/fusions
    assert np.mean(np.abs(got - want) > 1) < 0.001
    np.testing.assert_allclose(got, want, atol=3)


def test_full_frame_engine_parity_pallas3(box_scene, simple_materials):
    """A full frame on the pallas3 engine (in-kernel winner fetch + aux
    material row) matches the culled engine bit-for-bit — exercises the
    production TPU path's material lookup end-to-end on a multi-material
    scene (interpret mode on CPU)."""
    import jax

    from radarays_ros_tpu.sim.pipeline import simulate_frame
    from radarays_ros_tpu.utils.transforms import identity_pose

    params = RadarParams.make(simple_materials, [1, 2], beam_width_deg=4.0)
    base = RadarModelConfig(
        n_angles=16, n_cells=128, n_samples=8, n_reflections=3,
        resolution=0.25, signal_denoising=1,
        signal_denoising_triangular_width=5,
        signal_denoising_triangular_mode=0.4,
        ambient_noise=1, trace_ray_block=128)
    sa = box_scene.device_arrays()
    key = jax.random.PRNGKey(11)

    ref = simulate_frame(sa, params, base.replace(trace_engine="culled"),
                         identity_pose(), key)
    got = simulate_frame(sa, params, base.replace(trace_engine="pallas3"),
                         identity_pose(), key)
    np.testing.assert_array_equal(np.asarray(ref.image_u8),
                                  np.asarray(got.image_u8))


def test_full_frame_prep_group_parity(box_scene, simple_materials):
    """trace_prep_group (the >5M-triangle scaling knob) plumbs through the
    pipeline and keeps frames bit-identical."""
    import jax

    from radarays_ros_tpu.sim.pipeline import simulate_frame
    from radarays_ros_tpu.utils.transforms import identity_pose

    params = RadarParams.make(simple_materials, [1, 2], beam_width_deg=4.0)
    base = RadarModelConfig(
        n_angles=8, n_cells=96, n_samples=6, n_reflections=2,
        resolution=0.3, signal_denoising=0, ambient_noise=0,
        trace_engine="pallas3", trace_ray_block=128)
    sa = box_scene.device_arrays()
    key = jax.random.PRNGKey(3)

    ref = simulate_frame(sa, params, base, identity_pose(), key)
    got = simulate_frame(sa, params, base.replace(trace_prep_group=2),
                         identity_pose(), key)
    np.testing.assert_array_equal(np.asarray(ref.image_u8),
                                  np.asarray(got.image_u8))


def test_full_frame_baked_aux_parity(box_scene, simple_materials):
    """cfg.trace_aux_baked (object->material map baked into the fetch
    table at material-load time instead of gathered per jit call) keeps
    frames bit-identical, and Radar manages the bake automatically —
    including re-baking when load_materials changes the map."""
    import jax

    from radarays_ros_tpu.geom.scene import bake_tri_aux
    from radarays_ros_tpu.sim.pipeline import simulate_frame
    from radarays_ros_tpu.sim.radar import Radar
    from radarays_ros_tpu.utils.transforms import identity_pose

    params = RadarParams.make(simple_materials, [1, 2], beam_width_deg=4.0)
    cfg = RadarModelConfig(
        n_angles=16, n_cells=128, n_samples=8, n_reflections=3,
        resolution=0.25, signal_denoising=1,
        signal_denoising_triangular_width=5,
        signal_denoising_triangular_mode=0.4,
        ambient_noise=1, trace_engine="pallas3", trace_ray_block=128)
    sa = box_scene.device_arrays()
    key = jax.random.PRNGKey(11)

    om = np.asarray(params.object_materials)
    row = om.astype(np.float32)[
        np.clip(np.asarray(sa.obj_ids), 0, om.shape[0] - 1)]
    ref = simulate_frame(sa, params, cfg, identity_pose(), key)
    got = simulate_frame(bake_tri_aux(sa, row), params,
                         cfg.replace(trace_aux_baked=True),
                         identity_pose(), key)
    np.testing.assert_array_equal(np.asarray(ref.image_u8),
                                  np.asarray(got.image_u8))

    # Radar bakes on construction and re-bakes on load_materials
    radar = Radar(box_scene, params=params, cfg=cfg)
    assert radar.cfg.trace_aux_baked
    tbl = np.asarray(radar._scene_arrays.tri_table_t).astype(np.float32)
    np.testing.assert_array_equal(tbl[13] + tbl[29] + tbl[45], row)
    entries = [dict(velocity=0.3, ambient=1.0, diffuse=0.0, specular=1.0)
               for _ in range(4)]
    radar.load_materials(entries, [3, 2])
    tbl2 = np.asarray(radar._scene_arrays.tri_table_t).astype(np.float32)
    row2 = np.asarray([3, 2], np.float32)[
        np.clip(np.asarray(sa.obj_ids), 0, 1)]
    np.testing.assert_array_equal(tbl2[13] + tbl2[29] + tbl2[45], row2)


def test_full_frame_two_phase_cap_parity(box_scene, simple_materials):
    """cfg.trace_two_phase_cap (the sparse-scene requeue knob) plumbs
    through the pipeline and keeps frames bit-identical — the requeue is
    exact, so the cap may only change speed, never pixels."""
    import jax

    from radarays_ros_tpu.sim.pipeline import simulate_frame
    from radarays_ros_tpu.utils.transforms import identity_pose

    params = RadarParams.make(simple_materials, [1, 2], beam_width_deg=4.0)
    base = RadarModelConfig(
        n_angles=8, n_cells=96, n_samples=6, n_reflections=2,
        resolution=0.3, signal_denoising=0, ambient_noise=0,
        trace_engine="pallas3", trace_ray_block=128)
    sa = box_scene.device_arrays()
    key = jax.random.PRNGKey(3)

    ref = simulate_frame(sa, params, base, identity_pose(), key)
    got = simulate_frame(sa, params, base.replace(trace_two_phase_cap=4.0),
                         identity_pose(), key)
    np.testing.assert_array_equal(np.asarray(ref.image_u8),
                                  np.asarray(got.image_u8))


def test_update_config_resample_triggers(box_scene, simple_materials):
    """Pin the dynamic-reconfigure resample semantics (Radar.cpp:199-206):
    beam-shape keys draw a fresh cone key; other keys do not; the next
    simulate() builds the cone from the NEW config with that key."""
    params = RadarParams.make(simple_materials, [1, 2], beam_width_deg=2.0)
    radar = Radar(box_scene, params, _small_cfg())

    key0 = radar._cone_key
    radar.update_config(n_cells=64)            # not a beam-shape key
    assert (radar._cone_key == key0).all()
    radar.update_config(n_samples=8)           # beam-shape key -> resample
    assert not (radar._cone_key == key0).all()
    assert radar.cfg.n_samples == 8            # new config applied
    img = radar.simulate_image(identity_pose())
    assert img.shape == (64, 16)

    # same-value reconfigure of a beam key still re-rolls (the reference
    # sets m_resample on any callback touching those fields)
    key1 = radar._cone_key
    radar.update_config(n_samples=8)
    assert not (radar._cone_key == key1).all()
