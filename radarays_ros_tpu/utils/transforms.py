"""Rigid-transform helpers: quaternions, poses, the rotating-radar geometry.

Replaces the rmagine math types + TF plumbing of the reference (Radar.cpp:43-186
getTsm/updateTsm). Poses are 7-vectors [tx, ty, tz, qx, qy, qz, qw] — the same
layout as a ROS geometry_msgs Transform — and all ops are jnp + batched.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def quat_to_matrix(q):
    """(..., 4) [x, y, z, w] quaternion -> (..., 3, 3) rotation matrix."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def quat_from_euler(roll, pitch, yaw):
    """Extrinsic-xyz Euler angles -> [x, y, z, w] quaternion (rmagine order)."""
    cr, sr = np.cos(roll / 2), np.sin(roll / 2)
    cp, sp = np.cos(pitch / 2), np.sin(pitch / 2)
    cy, sy = np.cos(yaw / 2), np.sin(yaw / 2)
    return np.array(
        [
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
            cr * cp * cy + sr * sp * sy,
        ]
    )


def identity_pose():
    return np.array([0, 0, 0, 0, 0, 0, 1], np.float32)


def make_pose(translation, quat_xyzw=None):
    t = np.asarray(translation, np.float32)
    q = np.asarray(quat_xyzw if quat_xyzw is not None else [0, 0, 0, 1], np.float32)
    return np.concatenate([t, q])


def pose_matrix(pose):
    """(..., 7) pose -> (R (..., 3, 3), t (..., 3))."""
    return quat_to_matrix(pose[..., 3:7]), pose[..., 0:3]


def rotz(theta):
    """(...,) angle -> (..., 3, 3) rotation about +z."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, z], -1),
            jnp.stack([s, c, z], -1),
            jnp.stack([z, z, o], -1),
        ],
        axis=-2,
    )


def azimuth_angles(n_angles: int):
    """Beam azimuth per column: theta_i = -2*pi*i / n_angles.

    The reference radar model spins clockwise: theta.inc = -(2*pi)/400 from
    theta.min = 0 (Radar.cpp:27-32).
    """
    i = jnp.arange(n_angles, dtype=jnp.float32)
    return -(2.0 * jnp.pi) * i / n_angles


def interpolate_poses(pose_a, pose_b, alphas):
    """Per-azimuth pose interpolation for include_motion mode.

    The reference re-fetches TF per azimuth inside the scan loop
    (RadarCPU.cpp:190-196); the TPU build takes the scan-start and scan-end
    poses and slerps one pose per azimuth column, which it can batch freely.
    alphas: (A,) in [0, 1]. Returns (A, 7).
    """
    pose_a = jnp.asarray(pose_a, jnp.float32)
    pose_b = jnp.asarray(pose_b, jnp.float32)
    a = alphas[:, None]
    t = pose_a[None, 0:3] * (1 - a) + pose_b[None, 0:3] * a
    qa = pose_a[3:7]
    qb = pose_b[3:7]
    dot = jnp.sum(qa * qb)
    qb = jnp.where(dot < 0, -qb, qb)
    dot = jnp.abs(dot)
    theta = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    use_lerp = sin_theta < 1e-5
    w_a = jnp.where(use_lerp, 1.0 - alphas, jnp.sin((1.0 - alphas) * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    w_b = jnp.where(use_lerp, alphas, jnp.sin(alphas * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    q = qa[None, :] * w_a[:, None] + qb[None, :] * w_b[:, None]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.concatenate([t, q], axis=-1)
