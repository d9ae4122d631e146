from .checkpointing import (
    AsyncCheckpointWriter,
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from .lora import LoRAConfig, init_lora_params, merge_and_unload, merge_lora
from .metrics import JSONLinesTracker, Metrics, VLAMetrics, WeightsBiasesTracker
from .train_state import OptimizerConfig, TrainState, make_optimizer, make_schedule
from .train_step import make_sharded_train_step, make_train_step, vla_loss_fn

__all__ = [
    "AsyncCheckpointWriter",
    "JSONLinesTracker",
    "LoRAConfig",
    "Metrics",
    "OptimizerConfig",
    "TrainState",
    "VLAMetrics",
    "WeightsBiasesTracker",
    "init_lora_params",
    "latest_checkpoint",
    "load_checkpoint",
    "make_optimizer",
    "make_schedule",
    "make_sharded_train_step",
    "make_train_step",
    "merge_and_unload",
    "merge_lora",
    "save_checkpoint",
    "vla_loss_fn",
]
