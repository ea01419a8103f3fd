"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

The azimuth axis is the framework's data-parallel axis (SURVEY.md §2.5: the
reference's only parallelism is OpenMP-over-azimuths, RadarCPU.cpp:155-177);
these tests check that GSPMD partitioning over a jax.sharding.Mesh neither
changes the image nor breaks the training step.
"""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from radarays_ros_tpu.parallel.sharding import (
    make_mesh, simulate_frame_sharded, train_step_sharded)
from radarays_ros_tpu.sim.config import RadarModelConfig, RadarParams
from radarays_ros_tpu.sim.pipeline import simulate_frame
from radarays_ros_tpu.utils.transforms import identity_pose


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs the virtual multi-device mesh")


@pytest.fixture(scope="module")
def setup(request):
    box_scene = request.getfixturevalue("box_scene")
    simple_materials = request.getfixturevalue("simple_materials")
    cfg = RadarModelConfig(
        n_angles=16, n_cells=64, n_samples=4, n_reflections=2,
        resolution=0.5, signal_denoising=1,
        signal_denoising_triangular_width=5,
        signal_denoising_triangular_mode=0.4, ambient_noise=2)
    params = RadarParams.make(simple_materials, [1, 2], beam_width_deg=4.0)
    key = jax.random.PRNGKey(7)
    poses = np.tile(identity_pose(), (cfg.n_angles, 1))
    return box_scene.device_arrays(), params, cfg, poses, key


def test_sharded_frame_matches_single_device(setup):
    scene, params, cfg, poses, key = setup
    mesh = make_mesh(len(jax.devices()))
    ref = simulate_frame(scene, params, cfg, poses, key)
    got = simulate_frame_sharded(scene, params, cfg, poses, key, mesh)
    np.testing.assert_allclose(np.asarray(ref.image_float),
                               np.asarray(got.image_float),
                               rtol=1e-5, atol=1e-4)
    # uint8 rounding may flip the odd LSB at float boundaries
    diff = np.abs(np.asarray(ref.image_u8, np.int32)
                  - np.asarray(got.image_u8, np.int32))
    assert np.mean(diff > 1) < 0.001


def test_sharded_output_is_actually_sharded(setup):
    scene, params, cfg, poses, key = setup
    n = len(jax.devices())
    mesh = make_mesh(n)
    got = simulate_frame_sharded(scene, params, cfg, poses, key, mesh)
    shard_devs = {s.device for s in got.image_u8.addressable_shards}
    assert len(shard_devs) == n


def test_train_step_sharded_runs_and_descends(setup):
    scene, params, cfg, poses, key = setup
    mesh = make_mesh(len(jax.devices()))
    target = np.asarray(
        simulate_frame(scene, params, cfg, poses, key).image_float)
    # perturb materials, then one step must produce finite loss and grads
    m = params.materials
    params0 = params._replace(
        materials=m._replace(ambient=m.ambient.at[1].set(0.3)))
    loss0, params1 = train_step_sharded(
        scene, params0, cfg, poses, key, target, mesh, lr=1e-2)
    assert np.isfinite(float(loss0))
    # params moved
    assert float(params1.materials.ambient[1]) != pytest.approx(0.3)


def test_mesh_size_divides_angles_checked(setup):
    scene, params, cfg, poses, key = setup
    mesh = make_mesh(len(jax.devices()))
    bad_poses = np.tile(identity_pose(), (cfg.n_angles + 1, 1))
    with pytest.raises(AssertionError):
        simulate_frame_sharded(scene, params, cfg, bad_poses, key, mesh)


def test_2d_sharded_frame_matches_single_device(setup):
    """az x smp shard_map path: bit-comparable to the unsharded frame
    (same PRNG fields, psum-combined binning)."""
    from radarays_ros_tpu.parallel.sharding import (
        make_mesh_2d, simulate_frame_sharded_2d)

    scene, params, cfg, poses, key = setup
    mesh = make_mesh_2d(n_az=len(jax.devices()) // 2, n_smp=2)
    ref = simulate_frame(scene, params, cfg, poses, key)
    got = simulate_frame_sharded_2d(scene, params, cfg, poses, key, mesh)
    np.testing.assert_allclose(np.asarray(ref.image_float),
                               np.asarray(got.image_float),
                               rtol=1e-5, atol=1e-4)
    # psum reassociates the f32 splat sums: tiny cross-shard rounding drift
    np.testing.assert_allclose(np.asarray(ref.max_val),
                               np.asarray(got.max_val), rtol=1e-4, atol=1e-4)
    diff = np.abs(np.asarray(ref.image_u8, np.int32)
                  - np.asarray(got.image_u8, np.int32))
    assert np.mean(diff > 1) < 0.001


def test_2d_sharded_max_combine_and_scroll(setup):
    """pmax combination (no denoise) + global scroll placement across
    azimuth shards."""
    from radarays_ros_tpu.parallel.sharding import (
        make_mesh_2d, simulate_frame_sharded_2d)

    scene, params, cfg, poses, key = setup
    cfg = cfg.replace(signal_denoising=0, scroll_image=3, ambient_noise=1)
    mesh = make_mesh_2d(n_az=len(jax.devices()) // 2, n_smp=2)
    ref = simulate_frame(scene, params, cfg, poses, key)
    got = simulate_frame_sharded_2d(scene, params, cfg, poses, key, mesh)
    np.testing.assert_allclose(np.asarray(ref.image_float),
                               np.asarray(got.image_float),
                               rtol=1e-5, atol=1e-4)
    diff = np.abs(np.asarray(ref.image_u8, np.int32)
                  - np.asarray(got.image_u8, np.int32))
    assert np.mean(diff > 1) < 0.001


def test_shard_scene_arrays_layout(setup):
    """Chunk-contiguous shards: every per-triangle/chunk field splits along
    its leading axis, the packed tables along their column (chunk) axis."""
    from radarays_ros_tpu.geom.scene import shard_scene_arrays

    scene, *_ = setup
    n = 4
    st = shard_scene_arrays(scene, n)
    tc = int(st.chunk_size)
    per = st.chunk_aabb_lo.shape[1]
    assert st.verts.shape == (n, per * tc, 3, 3)
    from radarays_ros_tpu.geom.scene import SWEEP_K
    assert st.sweep_table_t.shape == (n, SWEEP_K, per * 5 * tc)
    assert st.tri_table_t.shape == (n, 48, per * tc)
    # the first shard's leading chunks are the original leading chunks
    np.testing.assert_array_equal(
        st.verts.reshape(-1, 3, 3)[: scene.verts.shape[0] // 2],
        np.asarray(scene.verts)[: scene.verts.shape[0] // 2])


def test_scene_sharded_frame_matches_single_device(setup):
    """SCENE sharding (chunk tables partitioned, rays replicated) must
    reproduce the unsharded frame — the min-reduce winner combine
    (trace/api.py:combine_trace_shards) is exact up to trace tie-breaks."""
    from radarays_ros_tpu.parallel.sharding import (
        make_mesh_scene, simulate_frame_scene_sharded)

    scene, params, cfg, poses, key = setup
    mesh = make_mesh_scene(len(jax.devices()))
    ref = simulate_frame(scene, params, cfg, poses, key)
    got = simulate_frame_scene_sharded(scene, params, cfg, poses, key, mesh)
    np.testing.assert_allclose(np.asarray(ref.image_float),
                               np.asarray(got.image_float),
                               rtol=1e-5, atol=1e-4)
    diff = np.abs(np.asarray(ref.image_u8, np.int32)
                  - np.asarray(got.image_u8, np.int32))
    assert np.mean(diff > 1) < 0.001


def test_scene_sharded_trace_combine_exact(setup, rng):
    """Trace-level check on an urban scene: shard_map over the scene axis +
    combine == unsharded trace, bit-for-bit on hits/t/obj."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from radarays_ros_tpu.geom.primitives import make_urban_scene
    from radarays_ros_tpu.geom.scene import Scene, shard_scene_arrays
    from radarays_ros_tpu.parallel.sharding import (
        make_mesh_scene, scene_shard_specs)
    from radarays_ros_tpu.trace.api import combine_trace_shards, trace

    parts, names = make_urban_scene(n_buildings=24, extent=60.0, seed=3)
    sa = Scene.compose(parts, names, chunk_size=16).device_arrays()
    n = len(jax.devices())
    mesh = make_mesh_scene(n)
    stacked = shard_scene_arrays(sa, n)
    specs = scene_shard_specs(stacked)

    az = rng.uniform(0, 2 * np.pi, 256)
    el = rng.uniform(-0.05, 0.05, 256)
    d = np.stack([np.cos(el) * np.cos(az), np.cos(el) * np.sin(az),
                  np.sin(el)], -1).astype(np.float32)
    o = np.broadcast_to(np.array([0, 0, 2.0], np.float32), (256, 3)).copy()
    o_j, d_j = jnp.asarray(o), jnp.asarray(d)

    def local(sc, o_j, d_j):
        sc = jax.tree_util.tree_map(
            lambda x: x[0] if np.ndim(x) >= 1 else x, sc)
        r = trace(sc, o_j, d_j, engine="culled", k_chunks=None)
        return combine_trace_shards(r, "scene")

    fn = jax.jit(shard_map(local, mesh=mesh,
                           in_specs=(specs, P(), P()), out_specs=P()))
    got = fn(stacked, o_j, d_j)
    ref = trace(sa, o_j, d_j, engine="culled", k_chunks=None)
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(got.hit))
    hit = np.asarray(ref.hit)
    np.testing.assert_array_equal(np.asarray(ref.t)[hit],
                                  np.asarray(got.t)[hit])
    np.testing.assert_array_equal(np.asarray(ref.obj_id),
                                  np.asarray(got.obj_id))


def test_az_scene_composed_frame_matches_single_device(setup):
    """Composed az x scene layout (azimuth DP over one mesh axis, chunk
    tables partitioned over the other) must reproduce the unsharded
    frame: the per-bounce winner combine rides the scene axis inside the
    trace, and azimuth wedges are pure data parallelism."""
    from radarays_ros_tpu.parallel.sharding import (
        make_mesh_az_scene, simulate_frame_sharded_az_scene)

    scene, params, cfg, poses, key = setup
    mesh = make_mesh_az_scene(n_az=len(jax.devices()) // 2, n_scene=2)
    ref = simulate_frame(scene, params, cfg, poses, key)
    got = simulate_frame_sharded_az_scene(scene, params, cfg, poses, key,
                                          mesh)
    np.testing.assert_allclose(np.asarray(ref.image_float),
                               np.asarray(got.image_float),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ref.max_val),
                               np.asarray(got.max_val), rtol=1e-4, atol=1e-4)
    diff = np.abs(np.asarray(ref.image_u8, np.int32)
                  - np.asarray(got.image_u8, np.int32))
    assert np.mean(diff > 1) < 0.001


def test_az_scene_composed_output_sharded_over_az(setup):
    from radarays_ros_tpu.parallel.sharding import (
        make_mesh_az_scene, simulate_frame_sharded_az_scene)

    scene, params, cfg, poses, key = setup
    n_az = len(jax.devices()) // 2
    mesh = make_mesh_az_scene(n_az=n_az, n_scene=2)
    got = simulate_frame_sharded_az_scene(scene, params, cfg, poses, key,
                                          mesh)
    shard_devs = {s.device for s in got.image_float.addressable_shards}
    assert len(shard_devs) >= n_az
