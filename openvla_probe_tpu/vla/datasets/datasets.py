"""VLA training datasets: RLDS batch transform, iterable dataset, dummy fixture.

Behavioral re-implementation of prismatic/vla/datasets/datasets.py: the frame
-> training-example transform (prompt build + tokenize + label masking so loss
lands only on action tokens (+ stop), :30-67), the interleaved RLDS stream
(:70-154), episodic variant, and the DummyDataset template (:180-232).

Host tokenization returns numpy; device feeding + fixed-shape padding happens
in the collator (utils/collators.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Iterator, List, Optional, Tuple, Type

import numpy as np

from ...models.prompting import PromptBuilder, PurePromptBuilder
from ..action_tokenizer import ActionTokenizer

IGNORE_INDEX = -100


@dataclasses.dataclass
class RLDSBatchTransform:
    """RLDS frame dict -> {pixel_values, input_ids, labels, dataset_name}."""

    action_tokenizer: ActionTokenizer
    base_tokenizer: Any                       # .__call__(str) -> ids (with BOS)
    image_transform: Callable[[np.ndarray], np.ndarray]
    prompt_builder_fn: Type[PromptBuilder] = PurePromptBuilder
    predict_stop_token: bool = True

    def __call__(self, rlds_batch: Dict[str, Any]) -> Dict[str, Any]:
        dataset_name = rlds_batch["dataset_name"]
        action = np.asarray(rlds_batch["action"][0])       # current-step action chunk head
        img = np.asarray(rlds_batch["observation"]["image_primary"][0])
        lang = rlds_batch["task"]["language_instruction"]
        if isinstance(lang, bytes):
            lang = lang.decode()
        lang = lang.lower()

        builder = self.prompt_builder_fn("openvla")
        builder.add_turn("human", f"What action should the robot take to {lang}?")
        builder.add_turn("gpt", self.action_tokenizer(action))
        input_ids = list(self.base_tokenizer.encode(builder.get_prompt()))
        labels = list(input_ids)

        pixel_values = self.image_transform(img)

        labels = np.asarray(labels, np.int64)
        labels[: -(len(action) + 1)] = IGNORE_INDEX        # loss only on action (+stop)
        if not self.predict_stop_token:
            labels[-1] = IGNORE_INDEX
        return {
            "pixel_values": np.asarray(pixel_values),
            "input_ids": np.asarray(input_ids, np.int64),
            "labels": labels,
            "dataset_name": dataset_name,
        }


class RLDSDataset:
    """Iterable over the interleaved RLDS frame stream (reference :70-154).

    `data_mix` resolves through the OXE mixture registry; per-dataset kwargs
    come from oxe.materialize. Infinite iterator (tf.data repeats)."""

    def __init__(
        self,
        data_root_dir: str,
        data_mix: str,
        batch_transform: RLDSBatchTransform,
        resize_resolution: Tuple[int, int] = (224, 224),
        shuffle_buffer_size: int = 256_000,
        train: bool = True,
        image_aug: bool = False,
        window_size: int = 1,
        future_action_window_size: int = 0,
    ) -> None:
        from .rlds import dataset as rlds_dataset
        from .rlds.oxe import materialize as oxe_materialize
        from .rlds.oxe.mixtures import OXE_NAMED_MIXTURES

        self.batch_transform = batch_transform
        mixture_spec = OXE_NAMED_MIXTURES.get(data_mix, [(data_mix, 1.0)])
        # match the reference's rlds_config exactly (datasets.py:92-118):
        # camera-only loading (no depth/proprio), q99 bounds normalization.
        per_dataset_kwargs, weights = oxe_materialize.get_oxe_dataset_kwargs_and_weights(
            data_root_dir, mixture_spec,
            load_camera_views=("primary",),
            load_depth=False,
            load_proprio=False,
        )
        frame_tf_kwargs: Dict[str, Any] = {
            "resize_size": {"primary": tuple(resize_resolution)},
            "num_parallel_calls": 16,
        }
        if image_aug:
            frame_tf_kwargs["image_augment_kwargs"] = {
                "primary": {
                    "random_resized_crop": {"scale": [0.9, 0.9], "ratio": [1.0, 1.0]},
                    "random_brightness": {"max_delta": 0.2},
                    "random_contrast": {"lower": 0.8, "upper": 1.2},
                    "random_saturation": {"lower": 0.8, "upper": 1.2},
                    "random_hue": {"max_delta": 0.05},
                    "augment_order": [
                        "random_resized_crop", "random_brightness", "random_contrast",
                        "random_saturation", "random_hue",
                    ],
                }
            }
        # balance_weights=True is hardcoded in the reference's rlds_config
        # (datasets.py:115): sampling probability = weight x frame count, and
        # __len__ is the expected-epoch length over primary datasets.
        # multi-host training: each process reads a DISJOINT file-level shard
        # of every mixture member (identical global statistics; the train loop
        # assembles the global batch from per-process locals via
        # jax.make_array_from_process_local_data). Single-process runs are
        # unaffected (num_shards=None).
        import jax

        n_proc = jax.process_count()
        self.dataset, self.dataset_length, self.dataset_statistics = rlds_dataset.make_interleaved_dataset(
            per_dataset_kwargs,
            weights,
            train=train,
            shuffle_buffer_size=shuffle_buffer_size,
            balance_weights=True,
            num_shards=n_proc if n_proc > 1 else None,
            shard_index=jax.process_index(),
            traj_transform_threads=len(mixture_spec),
            traj_read_threads=len(mixture_spec),
            traj_transform_kwargs={
                "window_size": window_size,
                "future_action_window_size": future_action_window_size,
                "skip_unlabeled": True,
                "goal_relabeling_strategy": "uniform",
            },
            frame_transform_kwargs=frame_tf_kwargs,
        )

        self._pipeline_spec = {
            "data_mix": data_mix,
            "resize_resolution": list(resize_resolution),
            "shuffle_buffer_size": shuffle_buffer_size,
            "train": train,
            "image_aug": bool(image_aug),
            "window_size": window_size,
            "future_action_window_size": future_action_window_size,
        }

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        for frame in self.dataset.as_numpy_iterator():
            yield self.batch_transform(frame)

    def checkpointable_iterator(self, ckpt_dir):
        """Data-order-checkpointable stream (beyond the reference, which
        restarts RLDS from scratch on resume — SURVEY.md §5). Returns an
        iterator with .save(step)/.restore_latest() that yields the same
        transformed examples as __iter__."""
        from .data_checkpoint import CheckpointableIterator

        inner = CheckpointableIterator(
            self.dataset, ckpt_dir, pipeline_spec=self._pipeline_spec
        )

        class _Stream:
            def __init__(s):
                s.save = inner.save
                s.restore = inner.restore
                s.restore_latest = inner.restore_latest

            def __iter__(s):
                return s

            def __next__(s, _bt=self.batch_transform):
                return _bt(next(inner))

        return _Stream()

    def __len__(self) -> int:
        return self.dataset_length


class EpisodicRLDSDataset:
    """Yields FULL trajectories (list of per-step examples) instead of frames.

    Like the reference's episodic variant, only SINGLE datasets are supported
    (mixtures interleave at the frame level). Images are decoded host-side per
    step; traj-level transforms (chunking, normalization) run in tf.data.
    """

    def __init__(
        self,
        data_root_dir: str,
        data_mix: str,
        batch_transform: RLDSBatchTransform,
        resize_resolution: Tuple[int, int] = (224, 224),
        shuffle_buffer_size: int = 256_000,   # unused (trajectory-level API)
        train: bool = True,
        image_aug: bool = False,
        window_size: int = 1,
        future_action_window_size: int = 0,
    ) -> None:
        from .rlds import dataset as rlds_dataset
        from .rlds.oxe import materialize as oxe_materialize
        from .rlds.oxe.mixtures import OXE_NAMED_MIXTURES

        mixture_spec = OXE_NAMED_MIXTURES.get(data_mix, [(data_mix, 1.0)])
        assert len(mixture_spec) == 1, "EpisodicRLDSDataset supports single datasets only"
        per_dataset_kwargs, _ = oxe_materialize.get_oxe_dataset_kwargs_and_weights(
            data_root_dir, mixture_spec, load_camera_views=("primary",),
            load_depth=False, load_proprio=False,
        )
        self.batch_transform = batch_transform
        self._resize = tuple(resize_resolution)
        ds, stats = rlds_dataset.make_dataset_from_rlds(**per_dataset_kwargs[0], train=train)
        ds = rlds_dataset.apply_trajectory_transforms(
            ds, train=train, window_size=window_size,
            future_action_window_size=future_action_window_size,
        )
        self.dataset = ds
        self.dataset_statistics = {per_dataset_kwargs[0]["name"]: stats}
        self.dataset_length = stats["num_transitions"]

    def _decode_image(self, raw) -> np.ndarray:
        import tensorflow as tf

        if isinstance(raw, bytes):
            if not raw:
                return np.zeros((*self._resize, 3), np.uint8)
            img = tf.io.decode_image(raw, expand_animations=False, dtype=tf.uint8)
            from .rlds.obs_transforms import resize_image

            return resize_image(img, self._resize).numpy()
        return np.asarray(raw)

    def __iter__(self) -> Iterator[List[Dict[str, Any]]]:
        for traj in self.dataset.as_numpy_iterator():
            T = traj["action"].shape[0]
            steps = []
            for t in range(T):
                frame = {
                    "dataset_name": traj["dataset_name"][t],
                    "action": traj["action"][t],              # [W(+F), A]
                    "observation": {
                        "image_primary": np.stack([
                            self._decode_image(raw)
                            for raw in np.atleast_1d(traj["observation"]["image_primary"][t])
                        ]),
                    },
                    "task": {
                        "language_instruction": traj["task"]["language_instruction"][t]
                        if "language_instruction" in traj.get("task", {}) else b"",
                    },
                }
                steps.append(self.batch_transform(frame))
            yield steps

    def __len__(self) -> int:
        return self.dataset_length


class DummyDataset:
    """Random-data stand-in with the exact training example schema — the
    drop-in template for custom datasets (reference :180-232)."""

    def __init__(
        self,
        action_tokenizer: ActionTokenizer,
        base_tokenizer: Any,
        image_transform: Callable[[np.ndarray], np.ndarray],
        prompt_builder_fn: Type[PromptBuilder] = PurePromptBuilder,
        length: int = 10000,
        image_size: Tuple[int, int] = (224, 224),
    ) -> None:
        self.action_tokenizer = action_tokenizer
        self.base_tokenizer = base_tokenizer
        self.image_transform = image_transform
        self.prompt_builder_fn = prompt_builder_fn
        self.length = length
        self.image_size = image_size
        self.dataset_statistics = {
            "dummy_dataset": {
                "action": {"q01": np.zeros(7, np.float32), "q99": np.ones(7, np.float32)}
            }
        }

    def __len__(self) -> int:
        return self.length

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        g = np.random.default_rng(idx)
        image = (g.random((*self.image_size, 3)) * 255.0).astype(np.uint8)
        action = g.random(7).astype(np.float32)
        builder = self.prompt_builder_fn("openvla")
        builder.add_turn("human", "What action should the robot take to do something spectacular?")
        builder.add_turn("gpt", self.action_tokenizer(action))
        input_ids = np.asarray(list(self.base_tokenizer.encode(builder.get_prompt())), np.int64)
        labels = input_ids.copy()
        labels[: -(len(action) + 1)] = IGNORE_INDEX
        return {
            "pixel_values": np.asarray(self.image_transform(image)),
            "input_ids": input_ids,
            "labels": labels,
        }
