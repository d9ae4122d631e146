from .catalog import (
    GLOBAL_REGISTRY,
    MODEL_REGISTRY,
    build_vlm_config,
    load_openvla_hf_checkpoint,
    params_from_hf_state,
    params_to_hf_state,
)
from .load import available_model_names, available_models, get_model_description, load, load_vla
from .vla import OpenVLA, VLAServingConfig
from .vlm import VLMConfig

__all__ = [
    "GLOBAL_REGISTRY",
    "MODEL_REGISTRY",
    "OpenVLA",
    "VLAServingConfig",
    "VLMConfig",
    "available_model_names",
    "available_models",
    "build_vlm_config",
    "get_model_description",
    "load",
    "load_openvla_hf_checkpoint",
    "load_vla",
    "params_from_hf_state",
    "params_to_hf_state",
]
