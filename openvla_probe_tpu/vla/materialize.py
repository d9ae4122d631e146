"""VLA dataset+collator factory (reference prismatic/vla/materialize.py:21-56).

Bundles the RLDS dataset, the batch transform, and the padded collator behind
one call — the API the training scripts consume.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Callable, Tuple, Type, Union

from ..models.prompting import PromptBuilder, PurePromptBuilder
from ..utils.collators import PaddedCollatorForActionPrediction
from .action_tokenizer import ActionTokenizer
from .datasets.datasets import EpisodicRLDSDataset, RLDSBatchTransform, RLDSDataset


def get_vla_dataset_and_collator(
    data_root_dir: Union[str, Path],
    data_mix: str,
    image_transform: Callable,
    tokenizer: Any,
    prompt_builder_fn: Type[PromptBuilder] = PurePromptBuilder,
    default_image_resolution: Tuple[int, int] = (224, 224),
    padding_side: str = "right",
    predict_stop_token: bool = True,
    shuffle_buffer_size: int = 100_000,
    train: bool = True,
    episodic: bool = False,
    image_aug: bool = False,
    pad_token_id: int = 32000,
    model_max_length: int = 2048,
) -> Tuple[RLDSDataset, ActionTokenizer, PaddedCollatorForActionPrediction]:
    """(dataset, action_tokenizer, collator) for VLA training."""
    action_tokenizer = ActionTokenizer(tokenizer)
    batch_transform = RLDSBatchTransform(
        action_tokenizer, tokenizer, image_transform,
        prompt_builder_fn=prompt_builder_fn,
        predict_stop_token=predict_stop_token,
    )
    collator = PaddedCollatorForActionPrediction(
        model_max_length=model_max_length, pad_token_id=pad_token_id,
        padding_side=padding_side,
    )
    cls = EpisodicRLDSDataset if episodic else RLDSDataset
    dataset = cls(
        str(data_root_dir), data_mix, batch_transform,
        resize_resolution=default_image_resolution,
        shuffle_buffer_size=shuffle_buffer_size,
        train=train, image_aug=image_aug,
    )
    return dataset, action_tokenizer, collator
