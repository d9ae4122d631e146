"""VLM model configurations + experiment registry.

Mirrors the reference's ModelConfig choice system (prismatic/conf/models.py:
19-584): same field surface (backbone ids, arch specifier, resize strategy,
per-stage optimization hyperparameters) and the key released variants. The
backbone-id strings resolve through models/catalog.py to JAX configs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from .registry import ChoiceRegistry


@dataclass(frozen=True)
class ModelConfig(ChoiceRegistry):
    model_id: str = "prism-dinosiglip-224px+7b"
    arch_specifier: str = "no-align+fused-gelu-mlp"
    vision_backbone_id: str = "dinosiglip-vit-so-224px"
    llm_backbone_id: str = "llama2-7b-pure"
    image_resize_strategy: str = "resize-naive"
    llm_max_length: int = 2048

    # align stage
    align_epochs: int = 1
    align_max_steps: Optional[int] = None
    align_global_batch_size: int = 256
    align_per_device_batch_size: int = 16
    align_learning_rate: float = 1e-3
    align_weight_decay: float = 0.0
    align_max_grad_norm: float = 1.0
    align_lr_scheduler_type: str = "linear-warmup+cosine-decay"
    align_warmup_ratio: float = 0.03
    align_train_strategy: str = "fsdp-shard-grad-op"

    # finetune stage
    finetune_epochs: int = 1
    finetune_max_steps: Optional[int] = None
    finetune_global_batch_size: int = 128
    finetune_per_device_batch_size: int = 16
    finetune_learning_rate: float = 2e-5
    finetune_weight_decay: float = 0.1
    finetune_max_grad_norm: float = 1.0
    finetune_lr_scheduler_type: str = "linear-warmup+cosine-decay"
    finetune_warmup_ratio: float = 0.03
    finetune_train_strategy: str = "fsdp-full-shard"

    enable_gradient_checkpointing: bool = True
    enable_mixed_precision_training: bool = True
    reduce_in_full_precision: bool = False


@ModelConfig.register_subclass("reproduction-llava-v15+7b")
@dataclass(frozen=True)
class LLaVa_V15_Reproduction_7B(ModelConfig):
    model_id: str = "reproduction-llava-v15+7b"
    arch_specifier: str = "gelu-mlp"
    vision_backbone_id: str = "clip-vit-l-336px"
    llm_backbone_id: str = "vicuna-v15-7b"
    image_resize_strategy: str = "letterbox"


@ModelConfig.register_subclass("one-stage+7b")
@dataclass(frozen=True)
class Exp_OneStage_7B(ModelConfig):
    model_id: str = "one-stage+7b"
    arch_specifier: str = "no-align+gelu-mlp"
    vision_backbone_id: str = "clip-vit-l-336px"
    llm_backbone_id: str = "vicuna-v15-7b"
    image_resize_strategy: str = "letterbox"


@ModelConfig.register_subclass("siglip-224px+7b")
@dataclass(frozen=True)
class Exp_SigLIP_224px_7B(ModelConfig):
    model_id: str = "siglip-224px+7b"
    arch_specifier: str = "no-align+gelu-mlp"
    vision_backbone_id: str = "siglip-vit-so400m-224px"
    llm_backbone_id: str = "vicuna-v15-7b"
    image_resize_strategy: str = "resize-naive"


@ModelConfig.register_subclass("dinosiglip-224px+7b")
@dataclass(frozen=True)
class Exp_DinoSigLIP_224px_7B(ModelConfig):
    model_id: str = "dinosiglip-224px+7b"
    vision_backbone_id: str = "dinosiglip-vit-so-224px"
    llm_backbone_id: str = "vicuna-v15-7b"


@ModelConfig.register_subclass("prism-dinosiglip-224px+7b")
@dataclass(frozen=True)
class Prism_DinoSigLIP_224px_7B(ModelConfig):
    """The OpenVLA base VLM: DINOv2 + SigLIP @ 224px, Llama-2-7b, fused MLP."""

    model_id: str = "prism-dinosiglip-224px+7b"


@ModelConfig.register_subclass("prism-dinosiglip+7b")
@dataclass(frozen=True)
class Prism_DinoSigLIP_384px_7B(ModelConfig):
    model_id: str = "prism-dinosiglip+7b"
    vision_backbone_id: str = "dinosiglip-vit-so-384px"


@ModelConfig.register_subclass("llama2+7b")
@dataclass(frozen=True)
class Exp_Llama2_7B(ModelConfig):
    model_id: str = "llama2+7b"
    arch_specifier: str = "no-align+gelu-mlp"
    vision_backbone_id: str = "clip-vit-l-336px"
    llm_backbone_id: str = "llama2-7b-pure"
    image_resize_strategy: str = "letterbox"
