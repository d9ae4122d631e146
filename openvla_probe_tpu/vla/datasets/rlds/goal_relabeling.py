"""Goal relabeling strategies (reference: rlds/utils/goal_relabeling.py)."""

from __future__ import annotations

from typing import Any, Dict

import tensorflow as tf


def uniform(traj: Dict[str, Any]) -> Dict[str, Any]:
    """Relabel each frame's goal with an observation uniformly sampled from
    its future in the same trajectory (inclusive of the last frame)."""
    traj_len = tf.shape(traj["action"])[0]
    rand = tf.random.uniform([traj_len])
    low = tf.cast(tf.range(traj_len) + 1, tf.float32)
    high = tf.cast(traj_len, tf.float32)
    goal_idxs = tf.cast(rand * (high - low) + low, tf.int32)
    goal_idxs = tf.minimum(goal_idxs, traj_len - 1)
    # the task dict mirrors ALL observation keys of the sampled goal
    # (incl. `timestep`, which chunk_act_obs uses as the neutral-action bound)
    goal = dict(tf.nest.map_structure(lambda x: tf.gather(x, goal_idxs), traj["observation"]))
    task = dict(traj.get("task", {}))
    # deep-merge pad_mask_dict (a plain update would clobber e.g. the
    # language_instruction mask with the goal observation's dict)
    goal_pad = goal.pop("pad_mask_dict", {})
    task_pad = dict(task.get("pad_mask_dict", {}))
    task_pad.update(goal_pad)
    task.update(goal)
    if task_pad:
        task["pad_mask_dict"] = task_pad
    traj["task"] = task
    return traj


GOAL_RELABELING_FUNCTIONS = {"uniform": uniform}
