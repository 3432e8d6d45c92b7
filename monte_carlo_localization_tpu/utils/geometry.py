"""Geometry helpers (host + device).

Covers the reference's utils::geometry namespace
(reference src/utils.cpp:22-72): quaternion <-> yaw, angle normalization,
rotation matrices and the lidar->base_link vehicle offset.

Device-side functions use ``jnp`` and are jit/vmap-safe; the same functions
work on numpy arrays for host-side use (they only use the array API).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def normalize_angle(angle):
    """Wrap angle(s) to [-pi, pi].

    The reference loops (src/utils.cpp:43-48); we use the branch-free
    mod form, which is identical on the open interval and jit-safe.
    """
    xp = jnp if isinstance(angle, jnp.ndarray) else np
    return xp.arctan2(xp.sin(angle), xp.cos(angle))


def quaternion_to_yaw(qx: float, qy: float, qz: float, qw: float) -> float:
    """Z-axis rotation extracted from a quaternion (reference src/utils.cpp:26-32)."""
    siny_cosp = 2.0 * (qw * qz + qx * qy)
    cosy_cosp = 1.0 - 2.0 * (qy * qy + qz * qz)
    return float(np.arctan2(siny_cosp, cosy_cosp))


def yaw_to_quaternion(yaw: float) -> tuple[float, float, float, float]:
    """Pure-Z rotation quaternion (x, y, z, w) (reference src/utils.cpp:35-40)."""
    half = 0.5 * yaw
    return (0.0, 0.0, float(np.sin(half)), float(np.cos(half)))


def rotation_matrix(angle):
    """2x2 rotation matrix R(theta) (reference src/utils.cpp:51-57)."""
    xp = jnp if isinstance(angle, jnp.ndarray) else np
    c, s = xp.cos(angle), xp.sin(angle)
    return xp.array([[c, -s], [s, c]])


def apply_vehicle_offset(pose, forward_offset: float):
    """lidar -> base_link: move pose BACK by forward_offset along heading.

    Matches reference src/utils.cpp:60-70 (offset subtracted). Works on a
    single (3,) pose or a batch (N, 3).
    """
    xp = jnp if isinstance(pose, jnp.ndarray) else np
    pose = xp.asarray(pose)
    theta = pose[..., 2]
    out = pose.copy() if xp is np else pose
    dx = forward_offset * xp.cos(theta)
    dy = forward_offset * xp.sin(theta)
    if xp is np:
        out[..., 0] = pose[..., 0] - dx
        out[..., 1] = pose[..., 1] - dy
        return out
    return pose.at[..., 0].add(-dx).at[..., 1].add(-dy)


def trajectory_rmse(times, poses, truth_t, truth_pose):
    """Pose RMSE (xy meters, theta rad) vs ground truth interpolated onto
    ``times``; heading error is wrapped via atan2. Shared by the replay
    engines and the CPU baseline harness so every engine reports RMSE with
    identical interpolation/wrapping."""
    import numpy as np

    times = np.asarray(times, np.float64)
    poses = np.asarray(poses, np.float64).reshape(-1, 3)
    tp = np.stack(
        [np.interp(times, truth_t, truth_pose[:, i]) for i in range(3)],
        axis=1,
    )
    err = poses[:, :2] - tp[:, :2]
    rmse_xy = float(np.sqrt((err**2).sum(axis=1).mean()))
    dth = np.arctan2(
        np.sin(poses[:, 2] - tp[:, 2]), np.cos(poses[:, 2] - tp[:, 2])
    )
    return rmse_xy, float(np.sqrt((dth**2).mean()))
