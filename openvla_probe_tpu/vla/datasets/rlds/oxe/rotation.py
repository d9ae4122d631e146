"""Pure-TF rotation conversions (replaces the tensorflow_graphics dependency).

Conventions match tfg: quaternions are (x, y, z, w); euler angles are
intrinsic XYZ (roll, pitch, yaw) as produced by tfg.euler.from_quaternion /
from_rotation_matrix.
"""

from __future__ import annotations

import tensorflow as tf


def quat_to_euler(quat: tf.Tensor) -> tf.Tensor:
    """[..., 4] (x, y, z, w) -> [..., 3] roll/pitch/yaw."""
    x, y, z, w = tf.unstack(tf.cast(quat, tf.float32), axis=-1)
    roll = tf.atan2(2.0 * (w * x + y * z), 1.0 - 2.0 * (x * x + y * y))
    sinp = tf.clip_by_value(2.0 * (w * y - z * x), -1.0, 1.0)
    pitch = tf.asin(sinp)
    yaw = tf.atan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
    return tf.stack([roll, pitch, yaw], axis=-1)


def euler_to_rmat(euler: tf.Tensor) -> tf.Tensor:
    """[..., 3] roll/pitch/yaw -> [..., 3, 3] rotation matrix (R = Rz Ry Rx)."""
    roll, pitch, yaw = tf.unstack(tf.cast(euler, tf.float32), axis=-1)
    cr, sr = tf.cos(roll), tf.sin(roll)
    cp, sp = tf.cos(pitch), tf.sin(pitch)
    cy, sy = tf.cos(yaw), tf.sin(yaw)
    row0 = tf.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], axis=-1)
    row1 = tf.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], axis=-1)
    row2 = tf.stack([-sp, cp * sr, cp * cr], axis=-1)
    return tf.stack([row0, row1, row2], axis=-2)


def rmat_to_euler(rmat: tf.Tensor) -> tf.Tensor:
    """[..., 3, 3] -> [..., 3] roll/pitch/yaw (inverse of euler_to_rmat)."""
    r = tf.cast(rmat, tf.float32)
    pitch = -tf.asin(tf.clip_by_value(r[..., 2, 0], -1.0, 1.0))
    roll = tf.atan2(r[..., 2, 1], r[..., 2, 2])
    yaw = tf.atan2(r[..., 1, 0], r[..., 0, 0])
    return tf.stack([roll, pitch, yaw], axis=-1)


def invert_rmat(rmat: tf.Tensor) -> tf.Tensor:
    return tf.linalg.matrix_transpose(rmat)


def rmat_to_rot6d(rmat: tf.Tensor) -> tf.Tensor:
    """First two rows of the rotation matrix, flattened -> [..., 6]."""
    r6 = rmat[..., :2, :]
    return tf.concat([r6[..., 0, :], r6[..., 1, :]], axis=-1)


def velocity_act_to_wrist_frame(velocity: tf.Tensor, wrist_in_robot_frame: tf.Tensor) -> tf.Tensor:
    """Base-frame 6D velocity -> wrist-frame 9D (translation + R6 rotation)."""
    R_frame = euler_to_rmat(wrist_in_robot_frame[:, 3:6])
    R_frame_inv = invert_rmat(R_frame)
    vel_t = (R_frame_inv @ velocity[:, :3][..., None])[..., 0]
    dR = euler_to_rmat(velocity[:, 3:6])
    dR = R_frame_inv @ (dR @ R_frame)
    return tf.concat([vel_t, rmat_to_rot6d(dR)], axis=-1)
