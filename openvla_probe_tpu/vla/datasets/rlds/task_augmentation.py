"""Task-conditioning augmentation (reference: rlds/utils/task_augmentation.py)."""

from __future__ import annotations

from typing import Any, Dict

import tensorflow as tf


def delete_task_conditioning(traj: Dict[str, Any], keep_image_prob: float) -> Dict[str, Any]:
    """Randomly keep EITHER the goal image OR the language instruction per
    trajectory (never both), with P(keep image) = keep_image_prob."""
    if "language_instruction" not in traj.get("task", {}):
        return traj
    image_keys = [k for k in traj["task"] if k.startswith("image_")]
    if not image_keys:
        return traj
    keep_image = tf.random.uniform([]) < keep_image_prob
    task = dict(traj["task"])
    for k in image_keys:
        task[k] = tf.cond(
            keep_image, lambda k=k: task[k],
            lambda k=k: tf.zeros_like(task[k]) if task[k].dtype != tf.string else tf.fill(tf.shape(task[k]), ""),
        )
    task["language_instruction"] = tf.cond(
        keep_image,
        lambda: tf.fill(tf.shape(task["language_instruction"]), ""),
        lambda: task["language_instruction"],
    )
    traj["task"] = task
    return traj


TASK_AUGMENT_FUNCTIONS = {"delete_task_conditioning": delete_task_conditioning}
