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
