#!/usr/bin/env python
"""Evaluate a VLM checkpoint on a closed-set or open-ended JSONL benchmark.

The reference delegates benchmark evaluation to TRI's sibling
`vlm-evaluation` repo (cited from /root/reference/README.md); this is the
in-tree TPU-native harness over the same primitives (candidate scoring +
greedy generation — prismatic/models/vlms/prismatic.py:520-621).

Dataset format (one JSON object per line):
  {"question": "...", "choices": ["...", ...], "answer_idx": 0,
   "image": "relative/or/abs.jpg"}            # closed-set
  {"question": "...", "answers": ["...", ...], "image": "..."}  # open-ended

Usage:
  python scripts/evaluate.py --checkpoint <hf_dir> --dataset eval.jsonl \
      --task closed --output metrics.json
"""

from __future__ import annotations

import json
import sys
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from openvla_probe_tpu.utils.platform import apply_platform_env

apply_platform_env()
from openvla_probe_tpu.conf.registry import parse_config
from openvla_probe_tpu.overwatch import initialize_overwatch

overwatch = initialize_overwatch(__name__)


@dataclass(frozen=True)
class EvalConfig:
    checkpoint: str = ""                 # local HF-layout checkpoint dir
    dataset: str = ""                    # JSONL eval file
    task: str = "closed"                 # closed | open
    output: Optional[str] = None         # metrics JSON out (default: stdout)
    image_root: Optional[str] = None     # base dir for relative image paths
    max_examples: Optional[int] = None
    max_new_tokens: int = 32
    metric: str = "vqa"                  # open-ended grading: vqa | exact
    length_normalize: bool = False       # closed-set: mean (vs sum) logprob
    prompt_style: str = "pure"           # prompting style registered in models/prompting.py


def main(cfg: EvalConfig) -> None:
    import functools

    from openvla_probe_tpu.eval import (
        evaluate_closed_set,
        evaluate_open_ended,
        load_jsonl_dataset,
    )
    from openvla_probe_tpu.models.load import load
    from openvla_probe_tpu.models.prompting import PromptBuilder

    assert cfg.checkpoint and cfg.dataset, "--checkpoint and --dataset are required"
    bundle = load(cfg.checkpoint)
    examples = load_jsonl_dataset(cfg.dataset, cfg.image_root, cfg.max_examples)
    overwatch.info(f"Loaded {len(examples)} examples from {cfg.dataset}")

    builder = functools.partial(PromptBuilder, cfg.prompt_style)
    common = dict(
        params=bundle["params"], cfg=bundle["cfg"], tokenizer=bundle["tokenizer"],
        examples=examples, image_cfg=bundle["image_cfg"],
        prompt_builder_factory=builder,
    )
    if cfg.task == "closed":
        report = evaluate_closed_set(length_normalize=cfg.length_normalize, **common)
    elif cfg.task == "open":
        report = evaluate_open_ended(
            max_new_tokens=cfg.max_new_tokens, metric=cfg.metric, **common)
    else:
        raise ValueError(f"unknown task {cfg.task!r} (closed | open)")

    report["checkpoint"] = cfg.checkpoint
    report["dataset"] = cfg.dataset
    overwatch.info(f"{cfg.task} accuracy: {report['accuracy']:.4f} over {report['n']}")
    text = json.dumps(report, indent=2)
    if cfg.output:
        Path(cfg.output).write_text(text)
        overwatch.info(f"Wrote {cfg.output}")
    else:
        print(text)


if __name__ == "__main__":
    main(parse_config(EvalConfig))
