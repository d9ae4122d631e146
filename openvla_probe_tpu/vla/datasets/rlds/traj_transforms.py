"""Trajectory-level tf transforms: chunking, subsampling, pad-mask bookkeeping.

Behavioral re-implementation of prismatic/vla/datasets/rlds/traj_transforms.py
(chunk_act_obs :14-71, subsample :74-81, add_pad_mask_dict :84-104).
"""

from __future__ import annotations

from typing import Any, Dict

import tensorflow as tf


def chunk_act_obs(
    traj: Dict[str, Any],
    window_size: int,
    future_action_window_size: int = 0,
) -> Dict[str, Any]:
    """Window observations [T, W, ...] and actions [T, W + F, dim].

    Per frame t: obs window covers [t-W+1, t] (clamped at 0, with
    timestep_pad_mask marking pre-start padding); the action chunk covers
    [t-W+1, t+F]. Actions indexed past the goal timestep are frozen at the
    final action (neutral continuation), matching the reference.
    """
    traj_len = tf.shape(traj["action"])[0]
    W, F = window_size, future_action_window_size

    history_indices = tf.range(traj_len)[:, None] + tf.range(-W + 1, 1)[None, :]
    timestep_pad_mask = history_indices >= 0
    history_indices = tf.maximum(history_indices, 0)
    traj["observation"] = tf.nest.map_structure(
        lambda x: tf.gather(x, history_indices), traj["observation"]
    )
    traj["observation"]["timestep_pad_mask"] = timestep_pad_mask

    action_indices = tf.range(traj_len)[:, None] + tf.range(-W + 1, 1 + F)[None, :]
    action_past_goal = action_indices > traj_len - 1
    action_indices = tf.clip_by_value(action_indices, 0, traj_len - 1)
    traj["action"] = tf.gather(traj["action"], action_indices)

    # freeze actions past the end of the trajectory at the final action
    final_action = traj["action"][-1:, -1:, :]
    traj["action"] = tf.where(action_past_goal[:, :, None], final_action, traj["action"])
    return traj


def subsample(traj: Dict[str, Any], subsample_length: int) -> Dict[str, Any]:
    """Uniformly subsample frames to at most `subsample_length`."""
    traj_len = tf.shape(traj["action"])[0]
    if traj_len > subsample_length:
        indices = tf.random.shuffle(tf.range(traj_len))[:subsample_length]
        return tf.nest.map_structure(lambda x: tf.gather(x, indices), traj)
    return traj


def add_pad_mask_dict(traj: Dict[str, Any]) -> Dict[str, Any]:
    """Per-key boolean masks: False where a value is padding (empty image
    string / all-zero tensor) so downstream losses can ignore it."""
    traj_len = tf.shape(traj["action"])[0]
    for key in ["observation", "task"]:
        if key not in traj:
            continue
        pad_masks = {}
        for subkey, tensor in traj[key].items():
            if tensor.dtype == tf.string:
                pad_masks[subkey] = tf.strings.length(tensor) != 0
            else:
                pad_masks[subkey] = tf.ones([traj_len], dtype=tf.bool)
        traj[key]["pad_mask_dict"] = pad_masks
    return traj
