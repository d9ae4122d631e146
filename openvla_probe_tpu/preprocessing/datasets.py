"""VLM pretraining datasets: align (caption) + finetune (multi-turn instruct).

Behavioral re-implementation of prismatic/preprocessing/datasets/datasets.py:
  * AlignDataset (:49-101): caption-only projector alignment — prompt is
    "{caption}</s>" with loss ONLY on the caption (BOS ignored); the human
    turn is discarded (projector alignment needs no instruction).
  * FinetuneDataset (:124-188): multi-turn conversations through the model's
    prompt builder; loss only on GPT turns; text-only examples return
    pixel_values=None (the collator substitutes dummies + multimodal_indices).

Examples are numpy dicts; any indexed-dataset consumer (our host loader or a
torch DataLoader) can wrap them.
"""

from __future__ import annotations

import copy
import json
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Tuple, Type

import numpy as np

from ..models.prompting import PromptBuilder

IGNORE_INDEX = -100


class AlignDataset:
    def __init__(
        self,
        chat_json: Path,
        image_dir: Path,
        image_transform: Callable[[np.ndarray], np.ndarray],
        tokenizer: Any,
    ) -> None:
        self.chat_json, self.image_dir = Path(chat_json), Path(image_dir)
        self.image_transform = image_transform
        self.tokenizer = tokenizer
        self.prompt_template = "{caption}" + "</s>"
        with open(self.chat_json) as f:
            self.examples = json.load(f)

    def __len__(self) -> int:
        return len(self.examples)

    def get_modality_lengths(self) -> List[Tuple[bool, int]]:
        out = []
        for ex in self.examples:
            is_mm = "image" in ex
            n = sum(len(turn["value"].replace("<image>", "").split()) for turn in ex["conversations"])
            out.append((is_mm, n))
        return out

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        from PIL import Image

        ex = self.examples[idx]
        image_path = ex["image"]
        # align: caption is the LAST turn's value; loss on caption + EOS only
        caption = ex["conversations"][-1]["value"].replace("<image>", "").strip()
        ids = self.tokenizer.encode(self.prompt_template.format(caption=caption))
        labels = np.asarray(ids, np.int64).copy()
        labels[0] = IGNORE_INDEX  # BOS carries no loss
        image = np.asarray(Image.open(self.image_dir / image_path).convert("RGB"))
        return {
            "pixel_values": np.asarray(self.image_transform(image)),
            "input_ids": np.asarray(ids, np.int64),
            "labels": labels,
        }


class FinetuneDataset:
    def __init__(
        self,
        instruct_json: Path,
        image_dir: Path,
        image_transform: Callable[[np.ndarray], np.ndarray],
        tokenizer: Any,
        prompt_builder_fn: Type[PromptBuilder],
    ) -> None:
        self.instruct_json, self.image_dir = Path(instruct_json), Path(image_dir)
        self.image_transform = image_transform
        self.tokenizer = tokenizer
        self.prompt_builder_fn = prompt_builder_fn
        with open(self.instruct_json) as f:
            self.examples = json.load(f)

    def __len__(self) -> int:
        return len(self.examples)

    def get_modality_lengths(self) -> List[Tuple[bool, int]]:
        out = []
        for ex in self.examples:
            is_mm = "image" in ex
            n = sum(len(turn["value"].replace("<image>", "").split()) for turn in ex["conversations"])
            out.append((is_mm, n))
        return out

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        ex = self.examples[idx]
        builder = self.prompt_builder_fn("prismatic")
        input_ids: List[int] = []
        labels: List[int] = []
        for t, turn in enumerate(ex["conversations"]):
            wrapped = builder.add_turn(turn["from"], turn["value"])
            if t == 0:
                wrapped = wrapped.removeprefix("<s>").lstrip() if wrapped.startswith("<s>") else wrapped
                turn_ids = self.tokenizer.encode(wrapped)          # includes BOS
            else:
                turn_ids = self.tokenizer.encode(wrapped)[1:]       # strip re-added BOS
            if turn["from"] == "gpt":
                turn_labels = list(turn_ids)
            else:
                turn_labels = [IGNORE_INDEX] * len(turn_ids)
            input_ids.extend(turn_ids)
            labels.extend(turn_labels)
        labels = np.asarray(labels, np.int64)
        labels[0] = IGNORE_INDEX  # BOS
        out: Dict[str, Any] = {
            "input_ids": np.asarray(input_ids, np.int64),
            "labels": labels,
        }
        if "image" in ex:
            from PIL import Image

            image = np.asarray(Image.open(self.image_dir / ex["image"]).convert("RGB"))
            out["pixel_values"] = np.asarray(self.image_transform(image))
        else:
            out["pixel_values"] = None
        return out


def get_dataset_and_collator(
    stage: str,
    dataset_components: Tuple[Path, Path],
    image_transform: Callable,
    tokenizer: Any,
    prompt_builder_fn: Type[PromptBuilder],
    default_image_resolution: Tuple[int, int, int] = (6, 224, 224),
    pad_token_id: int = 32000,
):
    """Stage factory (reference preprocessing/materialize.py:23-50)."""
    from ..utils.collators import PaddedCollatorForLanguageModeling

    annotation_json, image_dir = dataset_components
    collator = PaddedCollatorForLanguageModeling(
        pad_token_id=pad_token_id, default_image_resolution=default_image_resolution
    )
    if stage in ("align", "projector"):
        return AlignDataset(annotation_json, image_dir, image_transform, tokenizer), collator
    if stage in ("finetune", "full-finetune", "vla-train", "lvlm-train"):
        return (
            FinetuneDataset(annotation_json, image_dir, image_transform, tokenizer, prompt_builder_fn),
            collator,
        )
    raise ValueError(f"Stage `{stage}` is not supported!")
