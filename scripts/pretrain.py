#!/usr/bin/env python
"""Base-VLM pretraining (align / finetune stages) on a TPU mesh.

Equivalent of the reference's scripts/pretrain.py:48-238: ModelConfig +
DatasetConfig choices, stage-based freezing (align trains the projector only),
SplitModalitySampler batching, sharded train loop, epoch-end checkpoints.
"""

from __future__ import annotations

import dataclasses
import sys
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from openvla_probe_tpu.conf.datasets import DatasetConfig
from openvla_probe_tpu.conf.models import ModelConfig
from openvla_probe_tpu.utils.platform import apply_platform_env

apply_platform_env()
from openvla_probe_tpu.conf.registry import parse_config
from openvla_probe_tpu.overwatch import initialize_overwatch

overwatch = initialize_overwatch(__name__)


@dataclass(frozen=True)
class PretrainConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    stage: str = "finetune"                 # align | finetune
    run_root_dir: str = "runs"
    run_id: Optional[str] = None
    seed: int = 7
    pretrained_checkpoint: Optional[str] = None
    mesh_fsdp: int = -1
    mesh_dp: int = 1
    mesh_tp: int = 1
    wandb: bool = False
    save_interval: int = 2500
    optimizer: str = "adamw"                # adamw (reference) | adafactor (factored)


def main(cfg: PretrainConfig) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from openvla_probe_tpu.models import catalog, vlm
    from openvla_probe_tpu.models.tokenization import load_tokenizer
    from openvla_probe_tpu.ops.image import apply_image_transform
    from openvla_probe_tpu.parallel.mesh import make_mesh
    from openvla_probe_tpu.parallel.sharding import shard_params
    from openvla_probe_tpu.preprocessing.datasets import get_dataset_and_collator
    from openvla_probe_tpu.training import checkpointing as ckpt
    from openvla_probe_tpu.training.metrics import Metrics
    from openvla_probe_tpu.training.train_state import OptimizerConfig, TrainState, make_optimizer
    from openvla_probe_tpu.training.train_step import cross_entropy_loss, make_sharded_train_step
    from openvla_probe_tpu.utils.batching import SplitModalitySampler

    m = cfg.model
    run_id = cfg.run_id or f"{m.model_id}+stage-{cfg.stage}+x{cfg.seed}"
    run_dir = Path(cfg.run_root_dir) / run_id
    run_dir.mkdir(parents=True, exist_ok=True)
    ckpt.save_run_config(run_dir, dataclasses.asdict(cfg))

    model_cfg, img_cfg, prompt_cls = catalog.build_vlm_config(
        m.vision_backbone_id, m.llm_backbone_id, m.arch_specifier, m.image_resize_strategy
    )
    if cfg.pretrained_checkpoint:
        bundle = catalog.load_openvla_hf_checkpoint(cfg.pretrained_checkpoint)
        params, model_cfg, img_cfg = bundle["params"], bundle["cfg"], bundle["image_cfg"]
        tokenizer = load_tokenizer(cfg.pretrained_checkpoint)
    else:
        params = vlm.init_params(model_cfg, jax.random.key(cfg.seed))

        class _Tok:
            vocab_size = model_cfg.llm.vocab_size

            def encode(self, s):
                return [1] + [(hash(w) % max(self.vocab_size - 100, 100)) + 100 for w in s.split()]

            def decode(self, ids, **kw):
                return " ".join(map(str, ids))

        tokenizer = _Tok()

    # stage freezing: align = projector only; finetune = projector + LLM
    mask = jax.tree.map(lambda _: True, params)
    mask["vision"] = jax.tree.map(lambda _: False, params["vision"])
    if cfg.stage == "align":
        mask["llm"] = jax.tree.map(lambda _: False, params["llm"])

    stage_components = (
        cfg.dataset.align_stage_components if cfg.stage == "align"
        else cfg.dataset.finetune_stage_components
    )
    root = Path(cfg.dataset.dataset_root_dir)
    dataset, collator = get_dataset_and_collator(
        cfg.stage,
        (root / stage_components[0], root / stage_components[1]),
        image_transform=lambda img: np.asarray(apply_image_transform(jnp.asarray(img), img_cfg)),
        tokenizer=tokenizer,
        prompt_builder_fn=prompt_cls,
        # dummy pixels for unimodal examples must match the REAL stacked shape
        # (3*n_backbones channels at the model's resolution), not 224px
        default_image_resolution=(3 * len(img_cfg.specs), *img_cfg.specs[0].input_size),
        pad_token_id=min(32000, model_cfg.llm.vocab_size - 1),
    )

    stage_prefix = "align" if cfg.stage == "align" else "finetune"
    opt_cfg = OptimizerConfig(
        learning_rate=getattr(m, f"{stage_prefix}_learning_rate"),
        lr_schedule_type=getattr(m, f"{stage_prefix}_lr_scheduler_type"),
        warmup_ratio=getattr(m, f"{stage_prefix}_warmup_ratio"),
        weight_decay=getattr(m, f"{stage_prefix}_weight_decay"),
        max_grad_norm=getattr(m, f"{stage_prefix}_max_grad_norm"),
        max_steps=getattr(m, f"{stage_prefix}_max_steps")
        or getattr(m, f"{stage_prefix}_epochs") * max(1, len(dataset) // getattr(m, f"{stage_prefix}_global_batch_size")),
        optimizer_type=cfg.optimizer,
    )
    global_bs = getattr(m, f"{stage_prefix}_global_batch_size")

    mesh = make_mesh({"dp": cfg.mesh_dp, "fsdp": cfg.mesh_fsdp, "tp": cfg.mesh_tp})
    optimizer = make_optimizer(opt_cfg, params)
    state = TrainState.create(params, optimizer)
    state_shardings = shard_params(state, mesh, strategy="fsdp+tp")
    state = jax.device_put(state, state_shardings)

    def vlm_loss(p, c, batch):
        out = vlm.forward(p, c, batch["input_ids"], batch["attention_mask"],
                          batch.get("pixel_values"), batch["labels"],
                          multimodal_mask=batch.get("multimodal_mask"))
        loss = cross_entropy_loss(out["logits"], out["labels"])
        return loss, {"loss": loss}

    batch_sharding = NamedSharding(mesh, P("dp"))
    step_fn = make_sharded_train_step(
        model_cfg, optimizer, mesh, state_shardings,
        {k: batch_sharding for k in ["input_ids", "attention_mask", "pixel_values",
                                     "labels", "multimodal_mask"]},
        trainable_mask=mask, loss_fn=vlm_loss,
    )

    metrics = Metrics(("jsonl", "wandb") if cfg.wandb else ("jsonl",),
                      run_id=run_id, run_dir=run_dir, stage=cfg.stage)
    # per-process sharded sampling (the reference's distributed
    # SplitModalitySampler semantics, batching_utils.py:23-212): every process
    # generates the SAME deterministic global batch order and takes its own
    # length-contiguous slice; each host materializes only its shard
    n_proc, proc_id = jax.process_count(), jax.process_index()
    sampler = SplitModalitySampler(
        dataset.get_modality_lengths(), global_bs,
        num_replicas=n_proc, rank=proc_id,
    )
    per_host_bs = global_bs // n_proc

    def to_global(local_batch):
        """Host-local arrays -> global sharded arrays (multi-host only)."""
        if n_proc == 1:
            return {k: jnp.asarray(v) for k, v in local_batch.items()}
        return {
            k: jax.make_array_from_process_local_data(batch_sharding, np.asarray(v))
            for k, v in local_batch.items()
        }

    from openvla_probe_tpu.training.train_state import make_schedule

    schedule = make_schedule(opt_cfg)
    epochs = getattr(m, f"{stage_prefix}_epochs")
    step = 0
    # preemption (SIGTERM grace window on TPU pods): the per-epoch save
    # below doubles as the final mid-epoch checkpoint — see
    # training/preemption.py for the multi-host agreement semantics
    from openvla_probe_tpu.training.preemption import PreemptionGuard

    guard = PreemptionGuard().install()
    preempted = False
    for epoch in range(epochs):
        sampler.set_epoch(epoch)
        idxs = list(sampler)
        for s in range(0, len(idxs) - per_host_bs + 1, per_host_bs):
            batch = collator([dataset[i] for i in idxs[s : s + per_host_bs]])
            # text-only rows must NOT attend the dummy zero-image patches
            # (reference fuses unimodal/multimodal, prismatic.py:422-467)
            mm_idx = batch.pop("multimodal_indices", None)
            if mm_idx is not None:
                is_mm = np.zeros(len(batch["input_ids"]), bool)
                is_mm[np.asarray(mm_idx, int)] = True
                batch["multimodal_mask"] = is_mm
            state, mtr = step_fn(state, to_global(batch))
            step = int(jax.device_get(state.step))
            metrics.commit(global_step=step, loss=mtr["loss"],
                           lr=float(schedule(step - 1)), update_step_time=True)
            if step % 10 == 0:
                overwatch.info(metrics.push())
            preempted = guard.should_exit(step)
            if step >= opt_cfg.max_steps or preempted:
                break
        ckpt.save_checkpoint(run_dir, state, step=step, epoch=epoch,
                             loss=float(jax.device_get(mtr["loss"])))
        if preempted:
            overwatch.info(f"Preemption signal: checkpointed step {step}")
            break
        if step >= opt_cfg.max_steps:
            break
    guard.restore()
    metrics.finalize()
    overwatch.info("Pretraining complete")


if __name__ == "__main__":
    main(parse_config(PretrainConfig))
