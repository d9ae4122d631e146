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

    Per frame t: obs window covers [t-W+1, t] (floored at 0, with
    observation["pad_mask"] marking pre-start padding); the action chunk
    covers [t-W+1, t+F], clamped at the goal timestep (task["timestep"] when
    goal-relabeled, else the last frame). Chunk entries past the goal become
    NEUTRAL actions: absolute dims (absolute_action_mask) keep the clamped
    repeat, relative dims are zeroed. Reference: traj_transforms.py:14-71.
    """
    traj_len = tf.shape(traj["action"])[0]
    action_dim = traj["action"].shape[-1]
    W, F = window_size, future_action_window_size

    history_indices = tf.range(traj_len)[:, None] + tf.range(-W + 1, 1)[None, :]
    pad_mask = history_indices >= 0
    traj["observation"] = tf.nest.map_structure(
        lambda x: tf.gather(x, tf.maximum(history_indices, 0)), traj["observation"]
    )
    traj["observation"]["pad_mask"] = pad_mask

    action_indices = tf.range(traj_len)[:, None] + tf.range(-W + 1, 1 + F)[None, :]
    if "timestep" in traj.get("task", {}):
        goal_timestep = traj["task"]["timestep"]
    else:
        goal_timestep = tf.fill([traj_len], traj_len - 1)
    floored = tf.minimum(tf.maximum(action_indices, 0), goal_timestep[:, None])
    traj["action"] = tf.gather(traj["action"], floored)

    absolute_action_mask = traj.get(
        "absolute_action_mask", tf.zeros([traj_len, action_dim], dtype=tf.bool)
    )
    neutral_actions = tf.where(
        absolute_action_mask[:, None, :],
        traj["action"],                      # absolute dims: clamped repeat
        tf.zeros_like(traj["action"]),       # relative dims: zeroed
    )
    action_past_goal = action_indices > goal_timestep[:, None]
    traj["action"] = tf.where(action_past_goal[:, :, None], neutral_actions, traj["action"])
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
