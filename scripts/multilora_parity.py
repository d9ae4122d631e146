#!/usr/bin/env python
"""Trained-weight multi-LoRA certificate: N task adapters, ONE base, one batch.

The deployment claim `models/multilora.py` makes — N finetuned task adapters
resident over one frozen (int8) base, each request row served by ITS adapter
inside one batched jit, token-identical to single-adapter streamed serving —
is proved here on trained weights, end to end on the chip:

  1. TRAIN — streamed-LoRA finetune TWO adapters over the SAME int8 base
     (`trained_parity.run_train`, the single-chip QLoRA path) on two
     *different* deterministic synthetic tasks: task0 = stripe-brightness
     tokens (trained_parity.stripe_targets), task1 = the INVERTED stripe
     mapping (level -> 15-level), so the correct outputs differ at every
     action dim for every image.
  2. EVAL — serve the eval corpus three ways and compare greedy tokens:
       (a) single-adapter streamed serving per task (attach_lora — the
           certified QLoRA serving path), the reference rows;
       (b) multi-LoRA MIXED batches (per-row one-hot sel, both adapters in
           every batch, both row patterns so each image x each adapter is
           covered) — every row must match its task's reference row;
       (c) task accuracy per adapter on held-out images — each row solves
           ITS task (the same image yields different, correct tokens under
           different adapters in one device call).

Certificate lines append to --report (PARITY_r03.md). The reference's
deployment unit is one merged full checkpoint per task
(vla-scripts/finetune.py:326-361) — it has no analogue of (b) to certify.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time
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

from scripts.trained_parity import (  # noqa: E402  (platform env first)
    PROMPT,
    TrainedParityConfig,
    _configs,
    load_adapters,
    make_base_params,
    make_model,
    run_train,
    stripe_targets,
)

TASKS = ("stripe", "stripe_inv")


@dataclass(frozen=True)
class MultiLoRAParityConfig:
    scale: str = "full"                  # full | tiny (CI smoke)
    phase: str = "all"                   # all | train | eval
    run_dir: str = "runs/multilora_parity"
    report: Optional[str] = None         # e.g. PARITY_r03.md

    # per-task training (trained_parity.run_train)
    steps: int = 500
    batch: int = 8
    lr: float = 1e-3
    rank: int = 16
    seed: int = 0
    save_every: int = 200
    stop_loss: float = 0.01

    # corpus: train on the first n_train images, certify on all n_eval
    n_train_images: int = 48
    n_eval_images: int = 64
    serve_batch: int = 8


def invert_targets(targets, vocab_size: int):
    """Task1's labels: the stripe mapping with levels INVERTED (l -> 15-l).

    Same function family (equally learnable), but the correct token differs
    from task0's at every dim of every image (15 - l != l for integer l), so
    row-level multi-LoRA mixups cannot pass silently."""
    import numpy as np

    bins = vocab_size - targets                  # 8 + level*16, in [8, 248]
    level = (bins - 8) // 16
    return (vocab_size - (8 + (15 - level) * 16)).astype(np.int32)


def _task_pc(pc: MultiLoRAParityConfig, task: int) -> TrainedParityConfig:
    """Per-task TrainedParityConfig rider for run_train/load_adapters.

    SAME seed for both tasks: identical adapter init + data order, so the
    two banks differ only by what their task taught them."""
    return TrainedParityConfig(
        scale=pc.scale, run_dir=str(Path(pc.run_dir) / f"task{task}"),
        steps=pc.steps, batch=pc.batch, lr=pc.lr, rank=pc.rank, seed=pc.seed,
        save_every=pc.save_every, stop_loss=pc.stop_loss,
        n_train_images=pc.n_train_images, n_eval_images=pc.n_eval_images)


def serve_tokens(model, images, batch: int):
    """Greedy action tokens over the corpus at ONE compiled batch shape."""
    import numpy as np

    toks = []
    for i in range(0, len(images), batch):
        chunk = list(images[i:i + batch])
        if len(chunk) < batch:
            chunk = chunk + [chunk[-1]] * (batch - len(chunk))
        out = model.predict_action(np.stack(chunk), PROMPT,
                                   unnorm_key="bridge_orig")
        toks.append(out["action_tokens"][:min(batch, len(images) - i)])
    return np.concatenate(toks)


def main(pc: MultiLoRAParityConfig) -> None:
    import jax
    import numpy as np

    from scripts.check_parity import make_image_corpus

    from openvla_probe_tpu.training.lora import attach_lora

    cfg, img_cfg, pad_len = _configs(pc.scale)
    hw = (224, 224) if pc.scale == "full" else (64, 64)
    images = make_image_corpus(pc.n_eval_images, hw=hw)
    vocab = min(cfg.llm.vocab_size, 32000)
    targets0 = stripe_targets(np.stack(images), vocab)
    targets1 = invert_targets(targets0, vocab)
    all_targets = (targets0, targets1)

    base = make_base_params(cfg, pc.seed)
    jax.block_until_ready(base)
    overwatch.info("int8 base materialized")

    adapters, lcfg = [], None
    for t in range(2):
        tpc = _task_pc(pc, t)
        if pc.phase in ("all", "train"):
            overwatch.info(f"=== training task{t} ({TASKS[t]}) ===")
            lp, lcfg = run_train(cfg, img_cfg, pad_len, base,
                                 images[:pc.n_train_images],
                                 all_targets[t][:pc.n_train_images], tpc)
        else:
            lp, lcfg = load_adapters(base, tpc)
        adapters.append(lp)
    if pc.phase == "train":
        return

    # ---- reference rows: single-adapter streamed serving per task ---------
    ref_toks = []
    for t in range(2):
        model_t = make_model(attach_lora(base, adapters[t], lcfg),
                             cfg, img_cfg, pad_len)
        t0 = time.time()
        ref_toks.append(serve_tokens(model_t, images, pc.serve_batch))
        overwatch.info(f"task{t} reference serve: {time.time() - t0:.0f}s")
        del model_t

    task_acc = [float((ref_toks[t][pc.n_train_images:]
                       == all_targets[t][pc.n_train_images:]).mean())
                for t in range(2)]
    # the two tasks must actually produce different tokens (certificate
    # preconditions: a collapsed/failed finetune would vacuously "agree")
    tasks_distinct = float((ref_toks[0] != ref_toks[1]).mean())
    overwatch.info(f"heldout task accuracy: {task_acc}; "
                   f"tasks disagree on {tasks_distinct:.3f} of positions")

    # ---- multi-LoRA mixed serving: every image x every adapter ------------
    ml = make_model(base, cfg, img_cfg, pad_len)
    ml.set_adapters({TASKS[0]: adapters[0], TASKS[1]: adapters[1]}, lcfg)
    n = len(images)
    mismatches, positions = 0, 0
    t0 = time.time()
    for pattern in (0, 1):                       # two row patterns cover both
        aids = [(i + pattern) % 2 for i in range(n)]
        toks = []
        for i in range(0, n, pc.serve_batch):
            chunk = list(images[i:i + pc.serve_batch])
            ids = aids[i:i + pc.serve_batch]
            if len(chunk) < pc.serve_batch:
                pad = pc.serve_batch - len(chunk)
                chunk += [chunk[-1]] * pad
                ids += [ids[-1]] * pad
            out = ml.predict_action(np.stack(chunk), PROMPT,
                                    unnorm_key="bridge_orig",
                                    adapter=[TASKS[a] for a in ids])
            toks.append(out["action_tokens"][:min(pc.serve_batch, n - i)])
        toks = np.concatenate(toks)
        want = np.stack([ref_toks[aids[i]][i] for i in range(n)])
        mismatches += int((toks != want).sum())
        positions += int(want.size)
    overwatch.info(f"multi-LoRA mixed serve: {time.time() - t0:.0f}s; "
                   f"{mismatches}/{positions} token mismatches vs "
                   f"single-adapter reference rows")

    payload = {
        "kind": "multilora_certificate",
        "scale": pc.scale,
        "backend": jax.default_backend(),
        "n_adapters": 2,
        "rank": pc.rank,
        "train_steps": pc.steps,
        "n_images": n,
        "task_acc_heldout": [round(a, 4) for a in task_acc],
        "tasks_distinct_frac": round(tasks_distinct, 4),
        "mixed_vs_single_mismatches": mismatches,
        "positions_checked": positions,
    }
    line = json.dumps(payload)
    if pc.report:
        with open(pc.report, "a") as f:
            f.write(line + "\n")
        overwatch.info(f"appended certificate to {pc.report}")
    print(line)


if __name__ == "__main__":
    main(parse_config(MultiLoRAParityConfig))
