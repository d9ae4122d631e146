"""Public model loaders: available_models / load / load_vla.

Same surface as the reference loaders (prismatic/models/load.py:52-226),
re-targeted at local checkpoint directories (HF-layout safetensors for
released OpenVLA/Prismatic models, or this framework's orbax run dirs).
Hub downloads are intentionally out of scope (no egress in the build env);
point `load*` at a downloaded directory.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, List, Optional, Union

import jax.numpy as jnp

from ..overwatch import initialize_overwatch
from ..vla.norm_stats import load_dataset_statistics
from . import catalog, vla, vlm
from .tokenization import load_tokenizer

overwatch = initialize_overwatch(__name__)


def available_models() -> List[str]:
    return list(catalog.MODEL_REGISTRY.keys())


def available_model_names() -> List[str]:
    return [m["names"][0] for m in catalog.MODEL_REGISTRY.values()]


def get_model_description(model_id_or_name: str) -> str:
    meta = catalog.GLOBAL_REGISTRY.get(model_id_or_name)
    if meta is None:
        raise ValueError(f"Unknown model `{model_id_or_name}`; have {available_models()}")
    desc = meta["description"]
    if isinstance(desc, dict):
        return json.dumps(desc, indent=2)
    return str(desc)


def load(
    model_path: Union[str, Path],
    dtype=jnp.bfloat16,
) -> Dict[str, Any]:
    """Load a base Prismatic VLM from a local HF-layout checkpoint dir.

    Returns {params, cfg, image_cfg, prompt_builder, tokenizer}.
    """
    bundle = catalog.load_openvla_hf_checkpoint(model_path, dtype=dtype)
    bundle["tokenizer"] = load_tokenizer(model_path)
    return bundle


def load_vla(
    checkpoint_path: Union[str, Path],
    dtype=jnp.bfloat16,
    prompt_pad_len: int = 48,
    quantize_int8: bool = False,
) -> vla.OpenVLA:
    """Load an OpenVLA policy ready to serve.

    Accepts an HF-layout dir (config.json + safetensors [+ tokenizer +
    norm_stats in config.json or dataset_statistics.json sidecar]).
    `quantize_int8` switches the Llama trunk to the weight-only int8 turbo
    mode (bf16 stays the bit-parity mode).
    """
    path = Path(checkpoint_path)
    bundle = load(path, dtype=dtype)
    norm_stats = bundle.get("norm_stats") or {}
    sidecar = path / "dataset_statistics.json"
    if sidecar.exists():
        norm_stats = load_dataset_statistics(sidecar)
    if not norm_stats:
        overwatch.warning("Checkpoint carries no norm_stats; predict_action will need explicit stats")
    params = bundle["params"]
    if quantize_int8:
        from ..ops.linear import quantize_params

        params = {**params, "llm": quantize_params(params["llm"])}
    serving = vla.VLAServingConfig(
        vlm=bundle["cfg"], prompt_pad_len=prompt_pad_len,
        codec_vocab_size=_codec_vocab_size(path, bundle["cfg"]),
        # int8 weights already forgo bit-parity, so the config says so — this
        # is what unlocks turbo-tier features (speculative drafts) on the
        # serving-tier matrix (VLAServingConfig docstring)
        tier="turbo" if quantize_int8 else "parity",
    )
    return vla.OpenVLA(
        params, serving, bundle["tokenizer"], norm_stats, bundle["image_cfg"]
    )


def _codec_vocab_size(path: Path, cfg: vlm.VLMConfig) -> int:
    """Effective action vocab: text vocab minus the pad_to_multiple_of round-up
    (extern/hf/modeling_prismatic.py:500-504)."""
    try:
        with open(path / "config.json") as f:
            hf_cfg = json.load(f)
        return int(hf_cfg["text_config"]["vocab_size"]) - int(hf_cfg.get("pad_to_multiple_of", 64))
    except Exception:
        return cfg.llm.vocab_size - 64 if cfg.llm.vocab_size % 64 == 0 and cfg.llm.vocab_size > 32000 else cfg.llm.vocab_size
