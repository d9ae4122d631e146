from .catalog import (
    GLOBAL_REGISTRY,
    MODEL_REGISTRY,
    build_vlm_config,
    load_openvla_hf_checkpoint,
    params_from_hf_state,
    params_to_hf_state,
)
from .load import available_model_names, available_models, get_model_description, load_vla
from .vla import OpenVLA, VLAServingConfig
from .vlm import VLMConfig

# keep the `models.load` attribute bound to the SUBMODULE (the bare `load`
# function would shadow it); reach the function via models.load.load
from . import load  # noqa: E402  (must come after the from-imports)

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
