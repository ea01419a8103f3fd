"""Multi-chip scaling: shard the azimuth axis over a device mesh.

The reference's only parallel axis is OpenMP-over-azimuths on one CPU
(RadarCPU.cpp:155-177) — there is no distributed backend at all (SURVEY.md
§2.5). The TPU-native equivalent: the 400 azimuth columns of a frame are
embarrassingly parallel, so we lay them out over a 1-D `jax.sharding.Mesh`
("az" axis), replicate the scene + materials, and let GSPMD partition the
whole jitted frame. Each chip traces its azimuth wedge over ICI-local data;
the only cross-chip traffic XLA inserts is for the final image assembly and,
in the training step, one psum of material gradients (data-parallel over
azimuth wedges).

`train_step_sharded` is the "training step" of this framework: one
gradient-descent step of the material-optimization objective (opti/) — the
differentiable replacement for the reference's black-box scipy.shgo loop
(scripts/radaray_opti.py:221).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from radarays_ros_tpu.sim.pipeline import simulate_frame


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "az") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis_name,))


def shard_frame_args(mesh: Mesh, poses, key, axis_name: str = "az"):
    """Place per-azimuth inputs on the mesh; poses must be (A, 7) with A a
    multiple of the mesh size."""
    A = poses.shape[0]
    assert A % mesh.devices.size == 0, (
        f"n_angles {A} must divide over {mesh.devices.size} devices")
    sharded_poses = jax.device_put(
        jnp.asarray(poses, jnp.float32), NamedSharding(mesh, P(axis_name, None)))
    return sharded_poses, key


def simulate_frame_sharded(scene, params, cfg, poses, key, mesh,
                           axis_name: str = "az"):
    """One frame with azimuth columns sharded over the mesh.

    poses: (n_angles, 7). The scene/params are replicated; GSPMD propagates
    the azimuth sharding through cone sampling, tracing, shading and drawing.
    """
    poses, key = shard_frame_args(mesh, poses, key, axis_name)
    repl = NamedSharding(mesh, P())
    scene = jax.device_put(scene, repl)
    params = jax.device_put(params, repl)

    from radarays_ros_tpu.sim.pipeline import FrameResult

    out_shardings = FrameResult(
        image_u8=NamedSharding(mesh, P(None, axis_name)),    # (n_cells, A)
        image_float=NamedSharding(mesh, P(axis_name, None)),  # (A, n_cells)
        max_val=NamedSharding(mesh, P(axis_name)),            # (A,)
    )
    fn = jax.jit(
        simulate_frame,
        static_argnames=("cfg",),
        out_shardings=out_shardings,
    )
    return fn(scene, params, cfg, poses, key)


def make_mesh_2d(n_az: Optional[int] = None, n_smp: int = 2,
                 axis_names=("az", "smp")) -> Mesh:
    """2-D (azimuth x sample) device mesh for single-frame latency scaling."""
    devs = jax.devices()
    n_az = n_az or len(devs) // n_smp
    if len(devs) < n_az * n_smp:
        raise ValueError(
            f"mesh {axis_names[0]}={n_az} x {axis_names[1]}={n_smp} needs "
            f"{n_az * n_smp} devices, only {len(devs)} available")
    return Mesh(np.array(devs[: n_az * n_smp]).reshape(n_az, n_smp),
                axis_names)


def _wedge_frame(scene, params, cfg_trace, cfg, poses_loc, a0, local_dirs,
                 key_noise, img_combine=None):
    """Per-wedge frame body shared by the 2-D sharded layouts
    (simulate_frame_sharded_2d / simulate_frame_sharded_az_scene): cone
    directions -> bounce/signal collection -> binned image -> optional
    cross-shard image combine -> ambient noise -> u8 normalization.

    cfg_trace carries any trace-time overrides (e.g. trace_scene_axis for
    the scene-sharded layout); cfg drives the shared draw/noise params.
    a0 is this wedge's global azimuth offset; local_dirs its (S_loc, 3)
    sample wedge of the full cone. img_combine, when given, merges the
    binned (A_loc, n_cells) images across a mesh axis BEFORE noise (the
    sample-sharded layout's psum/pmax); noise/normalization then run on
    combined data identically in every shard."""
    from radarays_ros_tpu.image.draw import (
        apply_ambient_noise, draw_signals, normalize_to_u8)
    from radarays_ros_tpu.sim.pipeline import collect_signals
    from radarays_ros_tpu.utils.transforms import (
        azimuth_angles, pose_matrix, rotz)
    from radarays_ros_tpu.wave.types import (
        broadcast_waves, make_start_wave_attrs)

    A = cfg.n_angles
    A_loc = poses_loc.shape[0]
    S_loc = local_dirs.shape[0]
    weights, mode = cfg.denoiser()

    R_sm, t_sm = pose_matrix(poses_loc)
    theta = jax.lax.dynamic_slice_in_dim(azimuth_angles(A), a0, A_loc)
    R_am = jnp.matmul(R_sm, rotz(theta),
                      precision=jax.lax.Precision.HIGHEST)
    dirs0 = jnp.einsum("aij,sj->asi", R_am, local_dirs,
                       precision=jax.lax.Precision.HIGHEST)
    sensor_pos = t_sm + jnp.array([0.0, 0.0, cfg.z_offset], jnp.float32)

    waves = broadcast_waves(
        sensor_pos[:, None, :], dirs0,
        make_start_wave_attrs(material_id=cfg.material_id_air),
        (A_loc, S_loc))

    times, strengths, valid = collect_signals(scene, params, cfg_trace,
                                              waves, sensor_pos)
    img, _ = draw_signals(
        times, strengths, valid, n_cells=cfg.n_cells,
        resolution=cfg.resolution, denoise_weights=weights,
        denoise_mode=mode, method=cfg.draw_method)
    if img_combine is not None:
        img = img_combine(img)

    max_val = jnp.max(img, axis=-1)
    img = img * cfg.energy_max
    cols = (cfg.scroll_image + a0 + jnp.arange(A_loc, dtype=jnp.int32)) % A
    img = apply_ambient_noise(
        img, max_val, cols, key_noise,
        mode=cfg.ambient_noise, resolution=cfg.resolution,
        at_signal_0=cfg.ambient_noise_at_signal_0,
        at_signal_1=cfg.ambient_noise_at_signal_1,
        energy_max=cfg.ambient_noise_energy_max,
        energy_min=cfg.ambient_noise_energy_min,
        energy_loss=cfg.ambient_noise_energy_loss,
        perlin_scale_low=cfg.ambient_noise_perlin_scale_low,
        perlin_scale_high=cfg.ambient_noise_perlin_scale_high,
        perlin_p_low=cfg.ambient_noise_perlin_p_low,
        rows_slice=(a0, A))
    u8_rows = normalize_to_u8(img, max_val, cfg.signal_max)
    return u8_rows, img, max_val


def simulate_frame_sharded_2d(scene, params, cfg, poses, key, mesh):
    """One frame sharded over BOTH azimuth and beam-sample axes.

    Azimuth data-parallelism alone (simulate_frame_sharded) caps latency
    scaling at the azimuth count; sharding the per-beam sample axis as well
    lets one frame's latency keep dropping. Samples never interact until
    range binning — each (azimuth wedge, sample wedge) shard runs cone
    sampling, every bounce and signal drawing locally (Pallas kernels run
    per device inside shard_map), then the binned images are combined
    across the sample axis with ONE collective: a psum for the linear
    denoise splat, a pmax for the max-combine mode (RadarCPU.cpp:402-450 is
    a per-signal sum/max, so the combination is exact). Noise and
    normalization run redundantly per sample shard on identical data; all
    PRNG fields are drawn at global shape and sliced so the frame is
    bit-identical to the unsharded one (parity-tested).

    poses: (n_angles, 7); n_angles % mesh az size == 0 and
    cfg.n_samples % mesh smp size == 0.
    """
    from radarays_ros_tpu.sim.pipeline import FrameResult
    from radarays_ros_tpu.wave.cone import sample_cone_local

    A = cfg.n_angles
    S = cfg.n_samples
    na = mesh.shape["az"]
    ns = mesh.shape["smp"]
    assert A % na == 0 and S % ns == 0, (A, S, dict(mesh.shape))
    poses = jnp.asarray(poses, jnp.float32)
    if poses.ndim == 1:
        poses = jnp.broadcast_to(poses[None, :], (A, 7))
    if isinstance(key, (tuple, list)):
        key_cone, key_noise = key
    else:
        key_cone, key_noise = jax.random.split(jnp.asarray(key))

    weights, _ = cfg.denoiser()

    def local(scene, params, poses_loc, key_cone, key_noise):
        ai = jax.lax.axis_index("az")
        si = jax.lax.axis_index("smp")
        S_loc = S // ns
        a0 = ai * poses_loc.shape[0]

        # every shard draws the SAME full cone (same key), then takes its
        # sample wedge — bit-identical to the unsharded frame
        local_dirs = sample_cone_local(
            key_cone, params.beam_width, S, cfg.beam_sample_dist,
            cfg.beam_sample_dist_normal_p_in_cone)
        local_dirs = jax.lax.dynamic_slice_in_dim(local_dirs, si * S_loc,
                                                  S_loc)

        # combine sample shards: the splat is linear (psum); the no-denoise
        # mode is a per-cell max (pmax)
        def combine(img):
            return (jax.lax.psum(img, "smp") if weights is not None
                    else jax.lax.pmax(img, "smp"))

        return _wedge_frame(scene, params, cfg, cfg, poses_loc, a0,
                            local_dirs, key_noise, img_combine=combine)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P("az", None), P(), P()),
        out_specs=(P("az", None), P("az", None), P("az",)),
    )

    @partial(jax.jit, out_shardings=(
        NamedSharding(mesh, P(None, "az")),
        NamedSharding(mesh, P("az", None)),
        NamedSharding(mesh, P("az")),
    ))
    def run(scene, params, poses, key_cone, key_noise):
        u8_rows, img, max_val = fn(scene, params, poses, key_cone, key_noise)
        # scroll placement crosses azimuth shards: do it globally (GSPMD)
        cols = (cfg.scroll_image + jnp.arange(A, dtype=jnp.int32)) % A
        image_u8 = jnp.zeros_like(u8_rows).at[cols].set(u8_rows).T
        return image_u8, img, max_val

    repl = NamedSharding(mesh, P())
    scene = jax.device_put(scene, repl)
    params = jax.device_put(params, repl)
    poses = jax.device_put(poses, NamedSharding(mesh, P("az", None)))
    image_u8, img, max_val = run(scene, params, poses, key_cone, key_noise)
    return FrameResult(image_u8=image_u8, image_float=img, max_val=max_val)


def make_mesh_scene(n_devices: Optional[int] = None,
                    axis_name: str = "scene") -> Mesh:
    """1-D mesh for scene (chunk-table) sharding."""
    return make_mesh(n_devices, axis_name)


def scene_shard_specs(stacked, axis_name: str = "scene"):
    """PartitionSpec tree for a shard_scene_arrays result: array leaves are
    split on their new leading axis, scalar leaves replicated."""
    return jax.tree_util.tree_map(
        lambda x: P(axis_name, *([None] * (np.ndim(x) - 1)))
        if np.ndim(x) >= 1 else P(), stacked)


def simulate_frame_scene_sharded(scene_arrays, params, cfg, poses, key, mesh,
                                 axis_name: str = "scene"):
    """One frame with the SCENE sharded over the mesh — rays replicated,
    chunk tables partitioned (geom/scene.py:shard_scene_arrays).

    The dual of simulate_frame_sharded: instead of splitting the azimuth
    axis and replicating the scene (which wastes aggregate HBM and caps
    scene size at one chip), every device holds 1/n of the chunk tables
    and traces ALL of the frame's rays against its wedge; per-bounce
    winners merge with one min-reduce collective
    (trace/api.py:combine_trace_shards, enabled by cfg.trace_scene_axis).
    Shading, drawing and noise then run replicated on identical data, so
    the output is bit-identical to the unsharded frame up to trace
    tie-breaks (parity-tested on the CPU mesh). This is the layout for
    meshes LARGER than one chip's HBM — the one axis the reference (no
    distributed story at all, SURVEY.md §2.5) cannot scale.

    ICI cost model: the combine moves ~6 f32 per ray per bounce (t + tie
    index + normal/obj/aux rows); see docs/PERFORMANCE.md.

    scene_arrays: UNSHARDED host SceneArrays (this function shards them).
    """
    from radarays_ros_tpu.geom.scene import shard_scene_arrays
    from radarays_ros_tpu.sim.pipeline import FrameResult

    n = mesh.shape[axis_name]
    stacked = shard_scene_arrays(scene_arrays, n)
    specs = scene_shard_specs(stacked, axis_name)
    cfg_l = cfg.replace(trace_scene_axis=axis_name)

    def local(scene_loc, params, poses, key):
        # strip the size-1 shard axis shard_map leaves on each array leaf
        scene_loc = jax.tree_util.tree_map(
            lambda x: x[0] if np.ndim(x) >= 1 else x, scene_loc)
        return simulate_frame(scene_loc, params, cfg_l, poses, key)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(specs, P(), P(), P()),
        out_specs=P(),
    )
    run = jax.jit(fn)

    stacked = jax.device_put(
        stacked, jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), specs))
    repl = NamedSharding(mesh, P())
    params = jax.device_put(params, repl)
    res = run(stacked, params, jnp.asarray(poses, jnp.float32), key)
    return res


def make_mesh_az_scene(n_az: Optional[int] = None, n_scene: int = 2,
                       axis_names=("az", "scene")) -> Mesh:
    """2-D mesh composing azimuth data-parallelism with scene sharding."""
    return make_mesh_2d(n_az, n_scene, axis_names)


def simulate_frame_sharded_az_scene(scene_arrays, params, cfg, poses, key,
                                    mesh):
    """One frame sharded over azimuth (data-parallel) x scene (chunk
    tables partitioned) — the composed layout the scene-sharding cost
    model names (docs/PERFORMANCE.md): frame latency scales with the az
    axis while per-chip scene memory falls as 1/n_scene, so beyond-HBM
    meshes run at multi-chip latency instead of being pinned to the
    scene axis alone.

    Each (azimuth wedge, scene wedge) shard cone-samples its wedge's rays
    (full cone drawn from the same key, wedge sliced by azimuth index —
    bit-identical PRNG to the unsharded frame) and traces them against
    its 1/n_scene of the chunk tables; per-bounce winners merge across
    the scene axis INSIDE the trace (cfg.trace_scene_axis ->
    trace/api.py:combine_trace_shards), after which shading/drawing run
    on scene-axis-replicated data — no further scene collectives. Output
    is bit-identical to the unsharded frame up to trace tie-breaks
    (parity-tested on the CPU mesh).

    scene_arrays: UNSHARDED host SceneArrays (this function shards them).
    poses: (n_angles, 7) or (7,); n_angles % mesh az size == 0.
    """
    from radarays_ros_tpu.geom.scene import shard_scene_arrays
    from radarays_ros_tpu.sim.pipeline import FrameResult
    from radarays_ros_tpu.wave.cone import sample_cone_local

    A = cfg.n_angles
    S = cfg.n_samples
    na = mesh.shape["az"]
    ns = mesh.shape["scene"]
    assert A % na == 0, (A, dict(mesh.shape))
    poses = jnp.asarray(poses, jnp.float32)
    if poses.ndim == 1:
        poses = jnp.broadcast_to(poses[None, :], (A, 7))
    if isinstance(key, (tuple, list)):
        key_cone, key_noise = key
    else:
        key_cone, key_noise = jax.random.split(jnp.asarray(key))

    stacked = shard_scene_arrays(scene_arrays, ns)
    specs = scene_shard_specs(stacked, "scene")
    cfg_l = cfg.replace(trace_scene_axis="scene")

    def local(scene_loc, params, poses_loc, key_cone, key_noise):
        # strip the size-1 shard axis shard_map leaves on each array leaf
        scene_loc = jax.tree_util.tree_map(
            lambda x: x[0] if np.ndim(x) >= 1 else x, scene_loc)
        a0 = jax.lax.axis_index("az") * poses_loc.shape[0]
        local_dirs = sample_cone_local(
            key_cone, params.beam_width, S, cfg.beam_sample_dist,
            cfg.beam_sample_dist_normal_p_in_cone)
        # per-bounce winner merges across "scene" happen inside the trace
        # (cfg_l.trace_scene_axis); no post-draw collective is needed
        return _wedge_frame(scene_loc, params, cfg_l, cfg, poses_loc, a0,
                            local_dirs, key_noise)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(specs, P(), P("az", None), P(), P()),
        out_specs=(P("az", None), P("az", None), P("az",)),
    )

    @partial(jax.jit, out_shardings=(
        NamedSharding(mesh, P(None, "az")),
        NamedSharding(mesh, P("az", None)),
        NamedSharding(mesh, P("az")),
    ))
    def run(stacked, params, poses, key_cone, key_noise):
        u8_rows, img, max_val = fn(stacked, params, poses, key_cone,
                                   key_noise)
        # scroll placement crosses azimuth shards: do it globally (GSPMD)
        cols = (cfg.scroll_image + jnp.arange(A, dtype=jnp.int32)) % A
        image_u8 = jnp.zeros_like(u8_rows).at[cols].set(u8_rows).T
        return image_u8, img, max_val

    stacked = jax.device_put(
        stacked, jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), specs))
    repl = NamedSharding(mesh, P())
    params = jax.device_put(params, repl)
    poses = jax.device_put(poses, NamedSharding(mesh, P("az", None)))
    image_u8, img, max_val = run(stacked, params, poses, key_cone,
                                 key_noise)
    return FrameResult(image_u8=image_u8, image_float=img, max_val=max_val)


def psnr_loss(image_float, target_float, signal_max: float):
    """Negative PSNR against a target float image (both (A, n_cells))."""
    mse = jnp.mean((image_float - target_float) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(signal_max**2 / jnp.maximum(mse, 1e-12), 1e-12))


@partial(jax.jit, static_argnames=("cfg", "lr"))
def _train_step(scene, params, cfg, poses, key, target, lr):
    # differentiate only the float state (materials + beam width);
    # object_materials is an int32 lookup table
    def loss_fn(materials, beam_width):
        p = params._replace(materials=materials, beam_width=beam_width)
        res = simulate_frame(scene, p, cfg, poses, key)
        return psnr_loss(res.image_float, target, cfg.signal_max)

    loss, (g_mat, g_bw) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
        params.materials, params.beam_width)
    new_params = params._replace(
        materials=jax.tree_util.tree_map(
            lambda x, g: x - lr * g, params.materials, g_mat),
        beam_width=params.beam_width - lr * g_bw,
    )
    return loss, new_params


def train_step_sharded(scene, params, cfg, poses, key, target, mesh,
                       lr: float = 1e-3, axis_name: str = "az"):
    """One data-parallel material-optimization step over the azimuth mesh.

    target: (n_angles, n_cells) float image, sharded over azimuth. Gradients
    w.r.t. the replicated materials/beam_width are psum-reduced by GSPMD.
    """
    poses, key = shard_frame_args(mesh, poses, key, axis_name)
    repl = NamedSharding(mesh, P())
    scene = jax.device_put(scene, repl)
    params = jax.device_put(params, repl)
    target = jax.device_put(
        jnp.asarray(target, jnp.float32), NamedSharding(mesh, P(axis_name, None)))
    return _train_step(scene, params, cfg, poses, key, target, lr)
