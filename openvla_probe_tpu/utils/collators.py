"""Batch collators with fixed-shape padding buckets (XLA never recompiles).

Re-design of the reference collators (prismatic/util/data_utils.py:30-142).
Key TPU difference: the reference pads each batch to its LONGEST sequence
(dynamic shapes -> one XLA compilation per length); here sequences pad up to
the next bucket from a fixed ladder, so a handful of compilations cover every
batch. Semantics otherwise identical: right padding, attention_mask =
(ids != pad), IGNORE_INDEX label fill, dummy pixel values for text-only
examples + `multimodal_indices`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

IGNORE_INDEX = -100


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"Sequence length {n} exceeds largest bucket {buckets[-1]}")


def _pad_stack(rows: List[np.ndarray], length: int, fill: int) -> np.ndarray:
    from .native import pad_stack_i64

    return pad_stack_i64(rows, length, fill)


@dataclasses.dataclass
class PaddedCollatorForActionPrediction:
    """VLA collator (reference :94-142): right-pad ids/labels, mask = !pad."""

    model_max_length: int = 2048
    pad_token_id: int = 32000
    padding_side: str = "right"
    length_buckets: Tuple[int, ...] = (64, 96, 128, 192, 256, 512, 1024, 2048)

    def __post_init__(self):
        assert self.padding_side == "right", "right padding is the VLA contract"

    def __call__(self, instances: List[Dict[str, Any]]) -> Dict[str, np.ndarray]:
        ids = [np.asarray(x["input_ids"])[: self.model_max_length] for x in instances]
        labels = [np.asarray(x["labels"])[: self.model_max_length] for x in instances]
        max_len = max(len(r) for r in ids)
        L = _bucket(max_len, [b for b in self.length_buckets if b <= self.model_max_length]
                    + [self.model_max_length])
        input_ids = _pad_stack(ids, L, self.pad_token_id)
        labels_out = _pad_stack(labels, L, IGNORE_INDEX)
        attention_mask = (input_ids != self.pad_token_id).astype(np.int64)
        out: Dict[str, Any] = {
            "pixel_values": np.stack([np.asarray(x["pixel_values"]) for x in instances]),
            "input_ids": input_ids,
            "attention_mask": attention_mask,
            "labels": labels_out,
        }
        if "dataset_name" in instances[0]:
            out["dataset_names"] = [x["dataset_name"] for x in instances]
        return out


@dataclasses.dataclass
class PaddedCollatorForLanguageModeling:
    """VLM pretraining collator (reference :30-91): handles mixed
    multimodal/unimodal batches via dummy pixels + multimodal_indices."""

    model_max_length: int = 2048
    pad_token_id: int = 32000
    # matches the flagship dual-backbone stacked shape AND the preprocessing
    # factory default — a (3,...) default made all-unimodal batches flip to a
    # different pixel shape than mixed batches (new XLA compile or crash)
    default_image_resolution: Tuple[int, int, int] = (6, 224, 224)
    padding_side: str = "right"
    pixel_values_dtype: Any = np.float32
    length_buckets: Tuple[int, ...] = (64, 128, 256, 512, 1024, 2048)

    def __post_init__(self):
        assert self.padding_side == "right", "right padding is the contract here"

    def __call__(self, instances: List[Dict[str, Any]]) -> Dict[str, Any]:
        ids = [np.asarray(x["input_ids"])[: self.model_max_length] for x in instances]
        labels = [np.asarray(x["labels"])[: self.model_max_length] for x in instances]
        max_len = max(len(r) for r in ids)
        L = _bucket(max_len, [b for b in self.length_buckets if b <= self.model_max_length]
                    + [self.model_max_length])
        input_ids = _pad_stack(ids, L, self.pad_token_id)
        labels_out = _pad_stack(labels, L, IGNORE_INDEX)
        attention_mask = (input_ids != self.pad_token_id).astype(np.int64)

        multimodal_indices = np.asarray(
            [i for i, x in enumerate(instances) if x.get("pixel_values") is not None],
            np.int64,
        )
        if len(multimodal_indices) == 0:
            pixel_values = np.zeros(
                (len(instances), *self.default_image_resolution), self.pixel_values_dtype
            )
        else:
            example = np.asarray(instances[multimodal_indices[0]]["pixel_values"])
            pixel_values = np.stack([
                np.asarray(x["pixel_values"]) if x.get("pixel_values") is not None
                else np.zeros_like(example)
                for x in instances
            ]).astype(self.pixel_values_dtype)
        return {
            "pixel_values": pixel_values,
            "input_ids": input_ids,
            "attention_mask": attention_mask,
            "labels": labels_out,
            "multimodal_indices": multimodal_indices,
        }
