"""Host-side tf.data primitives: gripper relabeling, statistics, thread allocation.

Behavioral re-implementation of the reference's RLDS utilities
(prismatic/vla/datasets/rlds/utils/data_utils.py). These run in TensorFlow's
C++ tf.data runtime on the TPU HOST — the idiomatic input pipeline for TPU
training (the accelerator never sees any of this). NormalizationType and the
JSON statistics schema live in openvla_probe_tpu.vla.norm_stats; this module
holds the tf-graph-mode pieces.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np
import tensorflow as tf

from ....norm_stats import NormalizationType


def tree_map(fn: Callable, tree: Any) -> Any:
    if isinstance(tree, dict):
        return {k: tree_map(fn, v) for k, v in tree.items()}
    return fn(tree)


def to_padding(tensor: tf.Tensor) -> tf.Tensor:
    """Zeros / empty-strings shaped like `tensor` (for missing cameras)."""
    if tf.debugging.is_numeric_tensor(tensor):
        return tf.zeros_like(tensor)
    if tensor.dtype == tf.string:
        return tf.fill(tf.shape(tensor), "")
    raise ValueError(f"Cannot generate padding for tensor of type {tensor.dtype}.")


def normalize_action_and_proprio(
    traj: Dict[str, Any],
    metadata: Dict[str, Dict[str, tf.Tensor]],
    normalization_type: NormalizationType,
) -> Dict[str, Any]:
    """Normalize traj['action'] and traj['observation']['proprio'] in-graph.

    bounds/bounds_q99: [low, high] -> [-1, 1] clipped; masked dims pass
    through; degenerate dims (min == max) zeroed. normal: (x - mean)/std.
    """
    def apply(key_meta: Dict[str, tf.Tensor], x: tf.Tensor) -> tf.Tensor:
        mask = tf.cast(
            key_meta.get("mask", tf.ones_like(key_meta["min" if "min" in key_meta else "mean"], dtype=tf.bool)),
            tf.bool,
        )
        if normalization_type == NormalizationType.NORMAL:
            return tf.where(mask, (x - key_meta["mean"]) / (key_meta["std"] + 1e-8), x)
        low, high = (
            (key_meta["min"], key_meta["max"])
            if normalization_type == NormalizationType.BOUNDS
            else (key_meta["q01"], key_meta["q99"])
        )
        y = tf.where(mask, tf.clip_by_value(2.0 * (x - low) / (high - low + 1e-8) - 1.0, -1.0, 1.0), x)
        # reference parity (data_utils.py:95-99, "Note (Moo Jin)"): dims where
        # min == max zero out UNCONDITIONALLY — even mask-excluded passthrough
        # dims (e.g. a constant gripper) — matching the reference exactly
        zeros = key_meta["min"] == key_meta["max"]
        return tf.where(zeros, tf.zeros_like(y), y)

    if normalization_type not in (
        NormalizationType.NORMAL, NormalizationType.BOUNDS, NormalizationType.BOUNDS_Q99
    ):
        raise ValueError(f"Unknown Normalization Type {normalization_type}")
    traj = dict(traj)
    traj["action"] = apply(metadata["action"], traj["action"])
    if "proprio" in traj.get("observation", {}) and "proprio" in metadata:
        obs = dict(traj["observation"])
        obs["proprio"] = apply(metadata["proprio"], obs["proprio"])
        traj["observation"] = obs
    return traj


def binarize_gripper_actions(actions: tf.Tensor) -> tf.Tensor:
    """Continuous gripper -> {0, 1} via reverse scan: intermediate values take
    the value of the next decisive (fully open/closed) state."""
    open_mask = actions > 0.95
    closed_mask = actions < 0.05
    in_between = tf.logical_not(tf.logical_or(open_mask, closed_mask))
    is_open_float = tf.cast(open_mask, tf.float32)

    def scan_fn(carry, i):
        return tf.cond(in_between[i], lambda: tf.cast(carry, tf.float32), lambda: is_open_float[i])

    return tf.scan(scan_fn, tf.range(tf.shape(actions)[0]), actions[-1], reverse=True)


def invert_gripper_actions(actions: tf.Tensor) -> tf.Tensor:
    return 1.0 - actions


def rel2abs_gripper_actions(actions: tf.Tensor) -> tf.Tensor:
    """Relative gripper commands (+1 = closing, -1 = opening, ~0 = no-op) ->
    absolute state (0 = closed, 1 = open).

    The state BEFORE the first decisive command is its opposite (a close
    command implies the gripper started open); no decisive command at all
    means open throughout. Reference: rlds/utils/data_utils.py:141-162.
    """
    opening_mask = actions < -0.1
    closing_mask = actions > 0.1
    # internal convention: +1 open, -1 closed
    thresholded = tf.where(opening_mask, 1, tf.where(closing_mask, -1, 0))

    def scan_fn(carry, i):
        return tf.cond(thresholded[i] == 0, lambda: carry, lambda: thresholded[i])

    start = -1 * thresholded[tf.argmax(thresholded != 0, axis=0)]
    start = tf.cond(start == 0, lambda: 1, lambda: start)
    carried = tf.scan(scan_fn, tf.range(tf.shape(actions)[0]), start)
    return tf.cast(carried, tf.float32) / 2.0 + 0.5


def relabel_bridge_actions(traj: Dict[str, Any]) -> Dict[str, Any]:
    """Bridge actions = next-state - current-state deltas; drop last frame."""
    movement = traj["observation"]["state"][1:, :6] - traj["observation"]["state"][:-1, :6]
    traj_truncated = tree_map(lambda x: x[:-1], traj)
    traj_truncated["action"] = tf.concat([movement, traj["action"][:-1, -1:]], axis=1)
    return traj_truncated


# --- statistics (tf scan over the full dataset, cached) ---------------------

def get_dataset_statistics(
    dataset: tf.data.Dataset,
    hash_dependencies: Tuple[str, ...],
    save_dir: Optional[str] = None,
) -> Dict[str, Any]:
    """Full-dataset scan -> action/proprio mean/std/min/max/q01/q99 +
    cardinalities; cached as JSON keyed by the dependency hash."""
    unique_hash = hashlib.sha256(
        "".join(hash_dependencies).encode("utf-8"), usedforsecurity=False
    ).hexdigest()
    paths = []
    if save_dir:
        paths.append(os.path.join(save_dir, f"dataset_statistics_{unique_hash}.json"))
    paths.append(
        os.path.expanduser(f"~/.cache/openvla_probe_tpu/dataset_statistics_{unique_hash}.json")
    )
    for p in paths:
        if tf.io.gfile.exists(p):
            with tf.io.gfile.GFile(p, "r") as f:
                return json.load(f)

    actions, proprios = [], []
    num_transitions = 0
    num_trajectories = 0
    for traj in dataset.as_numpy_iterator():
        actions.append(np.asarray(traj["action"]))
        if "proprio" in traj.get("observation", {}):
            proprios.append(np.asarray(traj["observation"]["proprio"]))
        num_transitions += traj["action"].shape[0]
        num_trajectories += 1
    actions_cat = np.concatenate(actions)

    def stats(arr):
        return {
            "mean": arr.mean(0).tolist(),
            "std": arr.std(0).tolist(),
            "max": arr.max(0).tolist(),
            "min": arr.min(0).tolist(),
            "q01": np.quantile(arr, 0.01, axis=0).tolist(),
            "q99": np.quantile(arr, 0.99, axis=0).tolist(),
        }

    metadata = {
        "action": stats(actions_cat),
        "num_transitions": num_transitions,
        "num_trajectories": num_trajectories,
    }
    if proprios:
        metadata["proprio"] = stats(np.concatenate(proprios))

    for p in paths:
        try:
            tf.io.gfile.makedirs(os.path.dirname(p))
            with tf.io.gfile.GFile(p, "w") as f:
                json.dump(metadata, f)
            break
        except tf.errors.PermissionDeniedError:
            continue
    return metadata


def allocate_threads(n: Optional[int], weights: np.ndarray) -> np.ndarray:
    """Distribute `n` threads across datasets proportionally to weights, each
    getting at least one (the reference's allocation scheme, :296-330)."""
    if n is None:
        return np.array([tf.data.AUTOTUNE] * len(weights))
    assert n >= len(weights), "more datasets than threads"
    weights = np.asarray(weights, np.float64)
    weights = weights / weights.sum()
    allocation = np.zeros_like(weights, dtype=np.int64)
    while True:
        mask = (weights * n < 1) & (weights > 0)
        if not mask.any():
            break
        n -= mask.sum()
        allocation += mask.astype(np.int64)
        weights[mask] = 0
        if weights.sum() > 0:
            weights = weights / weights.sum()
    fractional, integral = np.modf(weights * n)
    allocation += integral.astype(np.int64)
    n -= int(integral.sum())
    for i in np.argsort(fractional)[::-1][:n]:
        allocation[i] += 1
    return allocation
