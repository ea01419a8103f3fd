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
