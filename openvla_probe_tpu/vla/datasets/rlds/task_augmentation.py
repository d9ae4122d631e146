"""Task-conditioning augmentation (reference: rlds/utils/task_augmentation.py:14-57)."""

from __future__ import annotations

from typing import Any, Dict

import tensorflow as tf

from .utils.data_utils import to_padding


def delete_task_conditioning(traj: Dict[str, Any], keep_image_prob: float) -> Dict[str, Any]:
    """Per-frame, keep EITHER the goal images OR the language instruction
    (never both): P(keep images) = keep_image_prob; frames whose language is
    already padding always keep images. Dropped keys become padding with
    their pad_mask_dict zeroed, and frames without goal images fall back to
    the final timestep as the goal bound."""
    if "language_instruction" not in traj.get("task", {}):
        return traj
    image_keys = {
        k for k in traj["task"] if k.startswith("image_") or k.startswith("depth_")
    }
    if not image_keys:
        return traj

    traj_len = tf.shape(traj["action"])[0]
    should_keep_images = tf.random.uniform([traj_len]) < keep_image_prob
    should_keep_images |= ~traj["task"]["pad_mask_dict"]["language_instruction"]

    for key in image_keys | {"language_instruction"}:
        should_keep = should_keep_images if key in image_keys else ~should_keep_images
        traj["task"][key] = tf.where(
            should_keep, traj["task"][key], to_padding(traj["task"][key])
        )
        traj["task"]["pad_mask_dict"][key] = tf.where(
            should_keep,
            traj["task"]["pad_mask_dict"][key],
            tf.zeros_like(traj["task"]["pad_mask_dict"][key]),
        )

    if "timestep" in traj["task"]:
        traj["task"]["timestep"] = tf.where(
            should_keep_images, traj["task"]["timestep"], traj_len - 1
        )
    return traj


TASK_AUGMENT_FUNCTIONS = {"delete_task_conditioning": delete_task_conditioning}
