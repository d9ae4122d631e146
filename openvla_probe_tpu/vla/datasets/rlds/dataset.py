"""RLDS pipeline core: per-dataset build, trajectory/frame transforms, interleave.

Behavioral re-implementation of prismatic/vla/datasets/rlds/dataset.py
(make_dataset_from_rlds :39-251, apply_trajectory_transforms :254-351,
apply_frame_transforms :369-424, make_interleaved_dataset :457-588) on plain
tf.data (no dlimp dependency): trajectory datasets are ordinary tf.data
datasets of dicts, with parallelism expressed through num_parallel_calls and
the reference's proportional thread-allocation scheme.

TFDS is optional: pass `trajectory_dataset_fn` to feed synthetic / in-memory
trajectories (tests, DummyDataset) — the transform semantics are identical
either way.
"""

from __future__ import annotations

import inspect
import json
from functools import partial
from typing import Any, Callable, Dict, List, Mapping, Optional, Sequence, Tuple, Union

import numpy as np
import tensorflow as tf

from ....overwatch import initialize_overwatch
from ...norm_stats import NormalizationType
from . import goal_relabeling as gr
from . import obs_transforms, task_augmentation as ta, traj_transforms
from .utils import data_utils

overwatch = initialize_overwatch(__name__)


def _tfds_trajectory_dataset(
    name: str, data_dir: str, split: str, num_parallel_reads: int,
    shuffle: bool = False,
    num_shards: Optional[int] = None,
    shard_index: int = 0,
) -> Tuple[tf.data.Dataset, Any]:
    """Build a trajectory dataset from a TFDS RLDS builder (steps -> batched
    into one tensor-stack per trajectory, the dlimp 'as_dataset' behavior).
    `shuffle` shuffles the tfrecord FILES (the reference's
    dl.DLataset.from_rlds(shuffle=True)) — without it trajectories stream in
    identical shard order every epoch and the frame shuffle buffer only
    locally decorrelates.

    `num_shards`/`shard_index`: multi-host data parallelism — shard at the
    tfrecord-FILE level via the reader's input_context (shard-before-shuffle,
    so per-host streams are disjoint by construction even with shuffled file
    order; an after-the-shuffle ds.shard would overlap across hosts). The
    reference reaches the same property through dlimp's reader
    (/root/reference/prismatic/vla/datasets/rlds/dataset.py:527-532)."""
    import tensorflow_datasets as tfds

    builder = tfds.builder(name, data_dir=data_dir)
    input_context = None
    if num_shards is not None and num_shards > 1:
        input_context = tf.distribute.InputContext(
            num_input_pipelines=num_shards, input_pipeline_id=shard_index)
    ds = builder.as_dataset(
        split=split,
        shuffle_files=shuffle,
        decoders={"steps": tfds.decode.SkipDecoding()},
        read_config=tfds.ReadConfig(
            skip_prefetch=True,
            num_parallel_calls_for_interleave_files=num_parallel_reads,
            input_context=input_context,
        ),
    )

    def steps_to_traj(ep):
        steps = ep["steps"]
        n = tf.shape(tf.nest.flatten(steps)[0])[0]
        traj = tf.nest.map_structure(lambda x: x, steps)
        traj["_traj_len"] = n
        return traj

    return ds.map(steps_to_traj, num_parallel_calls=tf.data.AUTOTUNE), builder


def make_dataset_from_rlds(
    name: str,
    data_dir: str = "",
    *,
    train: bool = True,
    standardize_fn: Optional[Callable[[Dict], Dict]] = None,
    shuffle: bool = True,
    image_obs_keys: Mapping[str, Optional[str]] = None,
    depth_obs_keys: Mapping[str, Optional[str]] = None,
    state_obs_keys: Sequence[Optional[str]] = (),
    language_key: Optional[str] = None,
    action_proprio_normalization_type: NormalizationType = NormalizationType.NORMAL,
    dataset_statistics: Optional[Union[str, Dict]] = None,
    absolute_action_mask: Optional[Sequence[bool]] = None,
    action_normalization_mask: Optional[Sequence[bool]] = None,
    num_parallel_reads: int = tf.data.AUTOTUNE,
    num_parallel_calls: int = tf.data.AUTOTUNE,
    trajectory_dataset_fn: Optional[Callable[[str], tf.data.Dataset]] = None,
    dataset_frame_transform_kwargs: Optional[Dict[str, Any]] = None,
    # per-dataset FRAME transforms (e.g. droid's chunk_filter_fn) are applied
    # after flattening by make_interleaved_dataset / make_single_dataset —
    # accepted here so oxe kwargs pass through intact (reference :543-551)
    num_shards: Optional[int] = None,   # multi-host: per-process disjoint stream
    shard_index: int = 0,
) -> Tuple[tf.data.Dataset, Dict[str, Any]]:
    """One RLDS dataset -> standardized trajectory dataset + statistics.

    Output trajectory schema (the reference's restructure, dataset.py:91-157):
      observation: {image_<new>: str|uint8, depth_<new>, proprio f32[T,S],
                    timestep int32[T]}
      task: {language_instruction: str[T]} (if language_key)
      action: f32 [T, A] (normalized)
      dataset_name: str[T]
    Missing cameras pad with empty strings/zeros.
    """
    image_obs_keys = dict(image_obs_keys or {})
    depth_obs_keys = dict(depth_obs_keys or {})

    def restructure(traj: Dict[str, Any]) -> Dict[str, Any]:
        if standardize_fn is not None:
            traj = standardize_fn(traj)
        if "observation" not in traj or "action" not in traj:
            raise ValueError(f"Trajectory missing observation/action after standardize_fn: {list(traj)}")
        traj_len = tf.shape(traj["action"])[0]
        old_obs = traj["observation"]
        new_obs: Dict[str, Any] = {}
        for new, old in image_obs_keys.items():
            if old is None:
                new_obs[f"image_{new}"] = tf.repeat("", traj_len)
            else:
                new_obs[f"image_{new}"] = old_obs[old]
        for new, old in depth_obs_keys.items():
            if old is None:
                new_obs[f"depth_{new}"] = tf.repeat("", traj_len)
            else:
                new_obs[f"depth_{new}"] = old_obs[old]
        if state_obs_keys:
            new_obs["proprio"] = tf.concat(
                [
                    tf.zeros((traj_len, 1), tf.float32) if key is None
                    else tf.cast(old_obs[key], tf.float32)
                    for key in state_obs_keys
                ],
                axis=1,
            )
        new_obs["timestep"] = tf.range(traj_len)
        task = {}
        if language_key is not None:
            task["language_instruction"] = tf.cast(traj.pop(language_key), tf.string)
        return {
            "observation": new_obs,
            "task": task,
            "action": tf.cast(traj["action"], tf.float32),
            "dataset_name": tf.repeat(name, traj_len),
        }

    if trajectory_dataset_fn is not None:
        split = "train" if train else "val"
        ds = trajectory_dataset_fn(split)
        if num_shards is not None and num_shards > 1:
            # custom sources: trajectory-level shard (deterministic sources
            # give disjoint per-host coverage; statistics below stay GLOBAL)
            ds = ds.shard(num_shards, shard_index)
        full_ds_for_stats = lambda: trajectory_dataset_fn(split)  # noqa: E731
        split_dep = split   # stats computed on THIS split: key the cache by it
    else:
        if train:
            split = "train"
        elif "val" in _tfds_splits(name, data_dir):
            split = "val"
        else:
            # NOT silent: validation metrics computed on a training slice are
            # misleading (the reference fails loudly on a missing split).
            split = "train[:5%]"
            overwatch.warning(
                f"Dataset `{name}` has no 'val' split; substituting {split!r} — "
                "validation metrics will be computed on TRAINING data."
            )
        ds, _ = _tfds_trajectory_dataset(name, data_dir, split, num_parallel_reads,
                                         shuffle=shuffle and train,
                                         num_shards=num_shards, shard_index=shard_index)
        # statistics must be GLOBAL (every host normalizes identically):
        # the stats scan never shards
        full_ds_for_stats = lambda: _tfds_trajectory_dataset(  # noqa: E731
            name, data_dir, "all", num_parallel_reads)[0]
        split_dep = "all"   # TFDS stats always scan the full dataset

    ds = ds.map(restructure, num_parallel_calls=num_parallel_calls)

    # statistics: pre-supplied dict / JSON path, or a full scan (cached)
    if isinstance(dataset_statistics, str):
        with tf.io.gfile.GFile(dataset_statistics, "r") as f:
            dataset_statistics = json.load(f)
    elif dataset_statistics is None:
        stats_deps = (
            str(name),
            str(split_dep),
            str(sorted(image_obs_keys.items())),
            str(list(state_obs_keys)),
            inspect.getsource(standardize_fn) if standardize_fn is not None else "",
        )
        dataset_statistics = data_utils.get_dataset_statistics(
            full_ds_for_stats().map(restructure, num_parallel_calls=num_parallel_calls),
            hash_dependencies=stats_deps,
        )
    dataset_statistics = {
        k: ({kk: np.array(vv) for kk, vv in v.items()} if isinstance(v, dict) else v)
        for k, v in dataset_statistics.items()
    }
    if action_normalization_mask is not None:
        dataset_statistics["action"]["mask"] = np.array(action_normalization_mask)

    stats_tf = {
        k: {kk: tf.constant(vv, tf.float32 if np.asarray(vv).dtype != bool else tf.bool)
            for kk, vv in v.items()}
        for k, v in dataset_statistics.items()
        if isinstance(v, dict)
    }
    ds = ds.map(
        partial(
            data_utils.normalize_action_and_proprio,
            metadata=stats_tf,
            normalization_type=action_proprio_normalization_type,
        ),
        num_parallel_calls=num_parallel_calls,
    )

    if absolute_action_mask is not None:
        mask = tf.constant(absolute_action_mask, tf.bool)

        def add_abs_mask(traj):
            traj_len = tf.shape(traj["action"])[0]
            traj["absolute_action_mask"] = tf.tile(mask[None], [traj_len, 1])
            return traj

        ds = ds.map(add_abs_mask, num_parallel_calls=num_parallel_calls)

    return ds, dataset_statistics


def _tfds_splits(name: str, data_dir: str):
    try:
        import tensorflow_datasets as tfds

        return tfds.builder(name, data_dir=data_dir).info.splits
    except Exception:
        return {"train": None}


def apply_trajectory_transforms(
    ds: tf.data.Dataset,
    *,
    train: bool = True,
    goal_relabeling_strategy: Optional[str] = None,
    goal_relabeling_kwargs: Optional[Dict] = None,
    window_size: int = 1,
    future_action_window_size: int = 0,
    subsample_length: Optional[int] = None,
    skip_unlabeled: bool = False,
    max_action: Optional[float] = None,
    max_proprio: Optional[float] = None,
    task_augment_strategy: Optional[str] = None,
    task_augment_kwargs: Optional[Dict] = None,
    num_parallel_calls: int = tf.data.AUTOTUNE,
) -> tf.data.Dataset:
    """Filters + windowing + relabeling (reference dataset.py:254-351)."""
    if skip_unlabeled:
        ds = ds.filter(
            lambda traj: tf.reduce_any(traj["task"]["language_instruction"] != "")
        )
    if max_action is not None:
        ds = ds.filter(
            lambda traj: tf.reduce_all(tf.abs(traj["action"]) <= max_action)
        )
    if max_proprio is not None:
        ds = ds.filter(
            lambda traj: ("proprio" not in traj["observation"])
            or tf.reduce_all(tf.abs(traj["observation"]["proprio"]) <= max_proprio)
        )

    ds = ds.map(traj_transforms.add_pad_mask_dict, num_parallel_calls=num_parallel_calls)

    if goal_relabeling_strategy is not None:
        fn = gr.GOAL_RELABELING_FUNCTIONS[goal_relabeling_strategy]
        ds = ds.map(partial(fn, **(goal_relabeling_kwargs or {})), num_parallel_calls=num_parallel_calls)

    if train and task_augment_strategy is not None:
        fn = ta.TASK_AUGMENT_FUNCTIONS[task_augment_strategy]
        ds = ds.map(partial(fn, **(task_augment_kwargs or {})), num_parallel_calls=num_parallel_calls)

    ds = ds.map(
        partial(
            traj_transforms.chunk_act_obs,
            window_size=window_size,
            future_action_window_size=future_action_window_size,
        ),
        num_parallel_calls=num_parallel_calls,
    )

    if train and subsample_length is not None:
        ds = ds.map(
            partial(traj_transforms.subsample, subsample_length=subsample_length),
            num_parallel_calls=num_parallel_calls,
        )
    return ds


def apply_frame_transforms(
    ds: tf.data.Dataset,
    *,
    train: bool = True,
    image_augment_kwargs: Optional[Union[Dict, Mapping[str, Dict]]] = None,
    resize_size: Optional[Union[Tuple[int, int], Mapping[str, Tuple[int, int]]]] = None,
    depth_resize_size: Optional[Union[Tuple[int, int], Mapping[str, Tuple[int, int]]]] = None,
    num_parallel_calls: int = tf.data.AUTOTUNE,
) -> tf.data.Dataset:
    """Per-frame decode/resize (+ train-time augment); frames must already be
    flattened (reference dataset.py:369-424)."""

    decode_fn = partial(
        obs_transforms.decode_and_resize,
        resize_size=resize_size or {},
        depth_resize_size=depth_resize_size or {},
    )

    def decode_frame(frame):
        # windowed obs [W, ...]: map over the window
        frame["observation"] = _map_window(decode_fn, frame["observation"])
        if frame.get("task"):
            frame["task"] = decode_fn(dict(frame["task"]))
        return frame

    ds = ds.map(decode_frame, num_parallel_calls=num_parallel_calls)

    if train and image_augment_kwargs is not None:
        def aug_frame(frame):
            seed = tf.random.uniform([2], maxval=2**31 - 1, dtype=tf.int32)
            aug = partial(obs_transforms.augment, seed=seed, augment_kwargs=image_augment_kwargs)
            frame["observation"] = _map_window(aug, frame["observation"])
            # goal (task) images get the SAME seeded augmentation — the
            # reference's apply_obs_transform covers task too (dataset.py:401-403,
            # 417-424); matters for goal-image-conditioned training.
            if frame.get("task"):
                frame["task"] = aug(dict(frame["task"]))
            return frame

        ds = ds.map(aug_frame, num_parallel_calls=num_parallel_calls)
    return ds


def _map_window(fn, obs):
    """Apply an obs transform under an optional leading window axis.

    Two windowed layouts occur: [W] strings (pre-decode) and [W, H, Wd, C]
    decoded images (post-decode, e.g. train-time augmentation) — both unstack
    per window step, apply, restack (the reference uses dl.vmap)."""
    img_keys = [k for k in obs if k.startswith(("image_", "depth_"))]
    if not img_keys:
        return fn(obs)
    sample = obs[img_keys[0]]
    nd = sample.shape.ndims
    windowed = nd is not None and (
        (sample.dtype == tf.string and nd == 1)      # [W] encoded strings
        or (sample.dtype != tf.string and nd == 4)   # [W, H, Wd, C] decoded
    )
    if windowed:
        window = sample.shape[0]
        outs = []
        for w in range(window):
            sub = {k: (v[w] if k in img_keys or (hasattr(v, "shape") and v.shape.ndims and v.shape[0] == window) else v)
                   for k, v in obs.items() if k != "pad_mask_dict"}
            outs.append(fn(dict(sub)))
        merged = dict(obs)
        for k in outs[0]:
            if k in img_keys:
                merged[k] = tf.stack([o[k] for o in outs])
        return merged
    return fn(obs)


def flatten_trajectories(ds: tf.data.Dataset, num_parallel_calls=tf.data.AUTOTUNE) -> tf.data.Dataset:
    """Trajectory dataset -> frame dataset (dlimp's flatten)."""
    return ds.interleave(
        lambda traj: tf.data.Dataset.from_tensor_slices(traj),
        cycle_length=1, block_length=None, num_parallel_calls=num_parallel_calls,
    )


def apply_per_dataset_frame_transforms(ds: tf.data.Dataset, chunk_filter_fn=None):
    """Per-dataset frame-level transforms (reference dataset.py:354-366):
    droid's zero_action_filter drops frames whose chunk is a normalized no-op."""
    if chunk_filter_fn:
        ds = ds.filter(chunk_filter_fn)
    return ds


def make_single_dataset(
    dataset_kwargs: Dict[str, Any],
    *,
    train: bool = True,
    traj_transform_kwargs: Optional[Dict] = None,
    frame_transform_kwargs: Optional[Dict] = None,
    num_shards: Optional[int] = None,
    shard_index: int = 0,
) -> Tuple[tf.data.Dataset, Dict[str, Any]]:
    """Build one dataset end-to-end: restructure -> traj transforms -> flatten
    -> frame transforms."""
    dftk = dataset_kwargs.get("dataset_frame_transform_kwargs") or {}
    ds, stats = make_dataset_from_rlds(**dataset_kwargs, train=train,
                                       num_shards=num_shards, shard_index=shard_index)
    ds = apply_trajectory_transforms(ds, train=train, **(traj_transform_kwargs or {}))
    ds = flatten_trajectories(ds)
    ds = apply_per_dataset_frame_transforms(ds, **dftk)
    ds = apply_frame_transforms(ds, train=train, **(frame_transform_kwargs or {}))
    return ds, stats


def make_interleaved_dataset(
    dataset_kwargs_list: List[Dict[str, Any]],
    sample_weights: Optional[Sequence[float]] = None,
    *,
    train: bool = True,
    shuffle_buffer_size: int = 10000,
    traj_transform_kwargs: Optional[Dict] = None,
    frame_transform_kwargs: Optional[Dict] = None,
    batch_size: Optional[int] = None,
    balance_weights: bool = False,
    traj_transform_threads: Optional[int] = None,
    traj_read_threads: Optional[int] = None,
    num_shards: Optional[int] = None,   # multi-host: per-process disjoint streams
    shard_index: int = 0,
) -> Tuple[tf.data.Dataset, int, Dict[str, Dict[str, Any]]]:
    """Weighted mixture of datasets -> one shuffled frame stream
    (reference dataset.py:457-588): per-dataset threads allocated
    proportionally to weights; optional balance by frame counts; sample ->
    shuffle -> frame transforms -> (batch).

    Returns (dataset, dataset_len, statistics) like the reference (:588):
    dataset_len is the expected-epoch length — samples until each *primary*
    dataset (raw sample_weight == 1.0) completes one epoch in expectation
    (reference :515,525).
    """
    if sample_weights is None:
        sample_weights = [1.0] * len(dataset_kwargs_list)
    assert len(sample_weights) == len(dataset_kwargs_list)

    # first pass: statistics (needed for balancing)
    all_stats: Dict[str, Dict[str, Any]] = {}
    for kwargs in dataset_kwargs_list:
        _, stats = make_dataset_from_rlds(**kwargs, train=train)
        all_stats[kwargs["name"]] = stats

    frame_counts = np.asarray(
        [all_stats[kw["name"]]["num_transitions"] for kw in dataset_kwargs_list],
        np.float64,
    )
    # primary datasets identified on the RAW weights, before balancing (:515)
    primary = np.asarray([w == 1.0 for w in sample_weights], bool)
    weights = np.asarray(sample_weights, np.float64)
    if balance_weights:
        weights = weights * frame_counts
    weights = weights / weights.sum()
    if primary.any():
        dataset_len = int((frame_counts / weights)[primary].max())
    else:
        dataset_len = int(frame_counts.sum())
    pprint_weights = {kw["name"]: round(float(w), 4) for kw, w in zip(dataset_kwargs_list, weights)}
    overwatch.info(f"Dataset sampling weights: {pprint_weights}")

    transform_threads = data_utils.allocate_threads(traj_transform_threads, weights)
    read_threads = data_utils.allocate_threads(traj_read_threads, weights)

    datasets = []
    for kwargs, t_threads, r_threads in zip(dataset_kwargs_list, transform_threads, read_threads):
        ds, _ = make_dataset_from_rlds(
            **kwargs,
            train=train,
            num_parallel_calls=int(t_threads) if t_threads != tf.data.AUTOTUNE else tf.data.AUTOTUNE,
            num_parallel_reads=int(r_threads) if r_threads != tf.data.AUTOTUNE else tf.data.AUTOTUNE,
            dataset_statistics=_jsonable(all_stats[kwargs["name"]]),
            num_shards=num_shards,
            shard_index=shard_index,
        )
        ds = apply_trajectory_transforms(ds, train=train, **(traj_transform_kwargs or {}))
        ds = flatten_trajectories(ds)
        ds = apply_per_dataset_frame_transforms(
            ds, **(kwargs.get("dataset_frame_transform_kwargs") or {}))
        ds = ds.repeat()
        datasets.append(ds)

    dataset = tf.data.Dataset.sample_from_datasets(datasets, weights.tolist())
    dataset = dataset.shuffle(shuffle_buffer_size)
    dataset = apply_frame_transforms(dataset, train=train, **(frame_transform_kwargs or {}))
    if batch_size is not None:
        dataset = dataset.batch(batch_size, drop_remainder=True)
    dataset = dataset.prefetch(tf.data.AUTOTUNE)
    dataset = dataset.with_options(_ram_budget_options())
    return dataset, dataset_len, all_stats


def _jsonable(stats):
    return {
        k: ({kk: (np.asarray(vv).tolist() if isinstance(vv, np.ndarray) else vv)
             for kk, vv in v.items()} if isinstance(v, dict) else v)
        for k, v in stats.items()
    }


def _ram_budget_options() -> tf.data.Options:
    """The reference's with_ram_budget(1) trick (dataset.py:583) to keep
    tf.data's autotuner from hoarding host RAM under a 256k shuffle buffer."""
    opts = tf.data.Options()
    opts.autotune.ram_budget = 1
    return opts
