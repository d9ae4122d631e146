"""make_interleaved_dataset end-to-end on two synthetic sources."""

import numpy as np
import tensorflow as tf

from openvla_probe_tpu.vla.datasets.rlds import dataset as rd
from openvla_probe_tpu.vla.norm_stats import NormalizationType


def _source(tag: bytes, n_traj: int, T: int):
    def fn(split):
        def gen():
            g = np.random.default_rng(len(tag))
            for _ in range(n_traj):
                yield {
                    "observation": {"image_0": np.array([b""] * T, object),
                                    "state": g.normal(size=(T, 7)).astype(np.float32)},
                    "action": g.normal(size=(T, 7)).astype(np.float32),
                    "language_instruction": np.array([tag] * T, object),
                }

        return tf.data.Dataset.from_generator(
            gen,
            output_signature={
                "observation": {"image_0": tf.TensorSpec((None,), tf.string),
                                "state": tf.TensorSpec((None, 7), tf.float32)},
                "action": tf.TensorSpec((None, 7), tf.float32),
                "language_instruction": tf.TensorSpec((None,), tf.string),
            },
        )

    return fn


def _kwargs(name, tag, n_traj, T):
    return {
        "name": name,
        "data_dir": "",
        "image_obs_keys": {"primary": "image_0"},
        "state_obs_keys": ["state", None],
        "language_key": "language_instruction",
        "action_proprio_normalization_type": NormalizationType.BOUNDS_Q99,
        "action_normalization_mask": [True] * 6 + [False],
        "trajectory_dataset_fn": _source(tag, n_traj, T),
    }


def test_interleaved_mixture_weights_and_schema():
    ds, ds_len, stats = rd.make_interleaved_dataset(
        [_kwargs("ds_a", b"task a", 6, 10), _kwargs("ds_b", b"task b", 3, 10)],
        sample_weights=[3.0, 1.0],
        shuffle_buffer_size=64,
        traj_transform_kwargs={"window_size": 1, "skip_unlabeled": True},
        frame_transform_kwargs={"resize_size": {"primary": (16, 16)}},
        batch_size=8,
    )
    assert set(stats) == {"ds_a", "ds_b"}
    assert stats["ds_a"]["num_transitions"] == 60

    counts = {b"ds_a": 0, b"ds_b": 0}
    it = ds.as_numpy_iterator()
    for _ in range(30):
        batch = next(it)
        assert batch["action"].shape == (8, 1, 7)
        assert batch["observation"]["image_primary"].shape == (8, 1, 16, 16, 3)
        assert batch["observation"]["image_primary"].dtype == np.uint8
        for name in batch["dataset_name"]:
            counts[name] += 1
    total = sum(counts.values())
    frac_a = counts[b"ds_a"] / total
    assert 0.6 < frac_a < 0.9, counts  # ~3:1 sampling


def test_balance_weights_by_frame_count():
    ds, ds_len, stats = rd.make_interleaved_dataset(
        [_kwargs("ds_a", b"task a", 8, 10), _kwargs("ds_b", b"task b", 2, 10)],
        sample_weights=[1.0, 1.0],
        balance_weights=True,
        shuffle_buffer_size=32,
        traj_transform_kwargs={"window_size": 1},
        frame_transform_kwargs={"resize_size": {"primary": (16, 16)}},
    )
    counts = {b"ds_a": 0, b"ds_b": 0}
    it = ds.as_numpy_iterator()
    for _ in range(800):
        counts[next(it)["dataset_name"]] += 1  # unbatched: scalar bytes
    # balanced by frames: a has 4x the frames -> ~80% of samples (loose bound:
    # tf.data's sampler + small shuffle buffer add non-trivial local variance)
    assert counts[b"ds_a"] > counts[b"ds_b"] * 1.5, counts


def test_windowed_image_augmentation_runs():
    """Regression: train-time augmentation on the windowed (post-decode rank-4)
    observation crashed with 'Incompatible shapes: [4] vs [3]' — the standard
    image_aug=True OpenVLA fine-tune config could not run at all."""
    aug = {"primary": {
        "random_resized_crop": {"scale": [0.9, 0.9], "ratio": [1.0, 1.0]},
        "random_brightness": {"max_delta": 0.2},
        "augment_order": ["random_resized_crop", "random_brightness"],
    }}
    ds, ds_len, stats = rd.make_interleaved_dataset(
        [_kwargs("ds_aug", b"task", 4, 8)],
        sample_weights=[1.0],
        shuffle_buffer_size=16,
        traj_transform_kwargs={"window_size": 1},
        frame_transform_kwargs={"resize_size": {"primary": (16, 16)},
                                "image_augment_kwargs": aug},
    )
    it = ds.as_numpy_iterator()
    for _ in range(5):
        frame = next(it)
        assert frame["observation"]["image_primary"].shape == (1, 16, 16, 3)


def test_per_dataset_chunk_filter_applied():
    """droid-style dataset_frame_transform_kwargs: the chunk filter drops
    matching frames (regression: the kwarg previously raised TypeError)."""
    def drop_first_dim_positive(frame):
        return frame["action"][0, 0] <= 0.0

    kw = _kwargs("ds_filt", b"task", 6, 10)
    kw["dataset_frame_transform_kwargs"] = {"chunk_filter_fn": drop_first_dim_positive}
    ds, ds_len, stats = rd.make_interleaved_dataset(
        [kw], sample_weights=[1.0],
        shuffle_buffer_size=16,
        traj_transform_kwargs={"window_size": 1},
        frame_transform_kwargs={"resize_size": {"primary": (16, 16)}},
    )
    it = ds.as_numpy_iterator()
    for _ in range(40):
        assert next(it)["action"][0, 0] <= 0.0


def test_droid_kwargs_materialize_with_callable_filter():
    from openvla_probe_tpu.vla.datasets.rlds.oxe.materialize import (
        make_oxe_dataset_kwargs,
        zero_action_filter,
    )

    kw = make_oxe_dataset_kwargs("droid", "/data")
    dftk = kw.get("dataset_frame_transform_kwargs")
    assert dftk is not None and dftk["chunk_filter_fn"] is zero_action_filter
