"""Backbone-id catalog + pretrained-model registry + HF-checkpoint weight import.

Replaces the reference's materialize/registry/load trio
(prismatic/models/materialize.py:78-130, registry.py, load.py:52-226 and the
HF key scheme from vla-scripts/extern/convert_openvla_weights_to_hf.py:73-115):
string ids resolve to JAX configs, and `params_from_hf_checkpoint` maps an
OpenVLA/Prismatic HF safetensors checkpoint directly onto our stacked pytrees.

HF key layout handled (fused dual backbone):
  vision_backbone.featurizer.*        timm DINOv2 (LayerScale gamma renamed
                                      `scale_factor` in the HF export)
  vision_backbone.fused_featurizer.*  timm SigLIP
  projector.fc{1,2,3}.{weight,bias}
  language_model.model.* / language_model.lm_head.weight
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Callable, Dict, Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np

from ..ops.image import (
    IMAGENET_DEFAULT_MEAN,
    IMAGENET_DEFAULT_STD,
    OPENAI_CLIP_MEAN,
    OPENAI_CLIP_STD,
    SIGLIP_MEAN,
    SIGLIP_STD,
    BackboneTransformSpec,
    ImageTransformConfig,
)
from . import llama, phi, vit, vlm
from .prompting import (
    LLaMa2ChatPromptBuilder,
    MistralInstructPromptBuilder,
    PhiPromptBuilder,
    PromptBuilder,
    PurePromptBuilder,
    VicunaV15ChatPromptBuilder,
)

# --- vision backbone catalog (reference models/materialize.py:19-44) --------

def _spec(size, interp, mean, std):
    return BackboneTransformSpec((size, size), interp, mean, std)


VISION_BACKBONES: Dict[str, Dict[str, Any]] = {
    "clip-vit-l": {"cfgs": [vit.ViTConfig.clip_vit_l(image_size=224)],
                   "specs": [_spec(224, "bicubic", OPENAI_CLIP_MEAN, OPENAI_CLIP_STD)]},
    "clip-vit-l-336px": {"cfgs": [vit.ViTConfig.clip_vit_l(image_size=336)],
                         "specs": [_spec(336, "bicubic", OPENAI_CLIP_MEAN, OPENAI_CLIP_STD)]},
    "dinov2-vit-l": {"cfgs": [vit.ViTConfig.dinov2_vit_l()],
                     "specs": [_spec(224, "bicubic", IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD)]},
    "in1k-vit-l": {"cfgs": [vit.ViTConfig.in1k_vit_l()],
                   "specs": [_spec(224, "bicubic", IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD)]},
    "siglip-vit-so400m": {"cfgs": [vit.ViTConfig.siglip_so400m()],
                          "specs": [_spec(224, "bicubic", SIGLIP_MEAN, SIGLIP_STD)]},
    "siglip-vit-so400m-224px": {"cfgs": [vit.ViTConfig.siglip_so400m()],
                                "specs": [_spec(224, "bicubic", SIGLIP_MEAN, SIGLIP_STD)]},
    "siglip-vit-so400m-384px": {"cfgs": [vit.ViTConfig.siglip_so400m(image_size=384)],
                                "specs": [_spec(384, "bicubic", SIGLIP_MEAN, SIGLIP_STD)]},
    "dinoclip-vit-l-336px": {
        "cfgs": [vit.ViTConfig.dinov2_vit_l(image_size=336), vit.ViTConfig.clip_vit_l(image_size=336)],
        "specs": [_spec(336, "bicubic", IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD),
                  _spec(336, "bicubic", OPENAI_CLIP_MEAN, OPENAI_CLIP_STD)],
        "names": ("dino", "clip"),
    },
    "dinosiglip-vit-so-224px": {
        "cfgs": [vit.ViTConfig.dinov2_vit_l(), vit.ViTConfig.siglip_so400m()],
        "specs": [_spec(224, "bicubic", IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD),
                  _spec(224, "bicubic", SIGLIP_MEAN, SIGLIP_STD)],
        "names": ("dino", "siglip"),
    },
    "dinosiglip-vit-so-384px": {
        "cfgs": [vit.ViTConfig.dinov2_vit_l(image_size=384),
                 vit.ViTConfig.siglip_so400m(image_size=384)],
        "specs": [_spec(384, "bicubic", IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD),
                  _spec(384, "bicubic", SIGLIP_MEAN, SIGLIP_STD)],
        "names": ("dino", "siglip"),
    },
    # test/smoke-scale fused backbone (28px, patch 14 -> 4 patches per tower)
    "dinosiglip-tiny-28px": {
        "cfgs": [vit.ViTConfig.tiny(num_register_tokens=4, no_embed_class=True,
                                    use_layerscale=True),
                 vit.ViTConfig.tiny(use_cls_token=False, act="gelu_tanh")],
        "specs": [_spec(28, "bicubic", IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD),
                  _spec(28, "bicubic", SIGLIP_MEAN, SIGLIP_STD)],
        "names": ("dino", "siglip"),
    },
}

# --- llm backbone catalog (reference models/materialize.py:46-76) -----------

LLM_BACKBONES: Dict[str, Dict[str, Any]] = {
    "llama2-7b-pure": {"cfg": llama.LlamaConfig.llama2_7b(), "prompt": PurePromptBuilder},
    "llama2-13b-pure": {"cfg": llama.LlamaConfig(hidden_size=5120, intermediate_size=13824,
                                                 num_hidden_layers=40, num_attention_heads=40,
                                                 num_key_value_heads=40),
                        "prompt": PurePromptBuilder},
    "llama2-7b-chat": {"cfg": llama.LlamaConfig.llama2_7b(), "prompt": LLaMa2ChatPromptBuilder},
    "llama2-13b-chat": {"cfg": llama.LlamaConfig(hidden_size=5120, intermediate_size=13824,
                                                 num_hidden_layers=40, num_attention_heads=40,
                                                 num_key_value_heads=40),
                        "prompt": LLaMa2ChatPromptBuilder},
    "vicuna-v15-7b": {"cfg": llama.LlamaConfig.llama2_7b(), "prompt": VicunaV15ChatPromptBuilder},
    "vicuna-v15-13b": {"cfg": llama.LlamaConfig(hidden_size=5120, intermediate_size=13824,
                                                num_hidden_layers=40, num_attention_heads=40,
                                                num_key_value_heads=40),
                       "prompt": VicunaV15ChatPromptBuilder},
    "mistral-v0.1-7b-pure": {"cfg": llama.LlamaConfig(vocab_size=32000, num_key_value_heads=8,
                                                      intermediate_size=14336, rope_theta=10000.0,
                                                      max_position_embeddings=4096),
                             "prompt": PurePromptBuilder},
    "mistral-v0.1-7b-instruct": {"cfg": llama.LlamaConfig(vocab_size=32000, num_key_value_heads=8,
                                                          intermediate_size=14336,
                                                          max_position_embeddings=4096),
                                 "prompt": MistralInstructPromptBuilder},
    # the REAL Phi-2 architecture (parallel attn+MLP, partial rotary,
    # LayerNorm + biases — models/phi.py), not a Llama stand-in
    "phi-2-3b": {"cfg": phi.PhiConfig(), "prompt": PhiPromptBuilder},
    # sparse-MoE trunk (models/moe.py; no reference counterpart — the
    # reference's backbones are all dense). HF Mixtral-8x7B dims: Mistral
    # attention (GQA kv=8, ffn 14336) x 8 experts, top-2 routing, 32k
    # context; loads MixtralForCausalLM state dicts via llama.params_from_hf.
    # capacity_factor = E/top_k = 4 makes the dispatch DROPLESS (exact HF
    # parity — capacity caps at S, at quadratic-in-S dispatch cost); training
    # configs may lower it as the usual MoE regularizer, which is a routing
    # change, not a parity-tier numeric shortcut.
    "mixtral-8x7b-v0.1": {"cfg": llama.LlamaConfig(vocab_size=32000, num_key_value_heads=8,
                                                   intermediate_size=14336, rope_theta=1e6,
                                                   max_position_embeddings=32768,
                                                   moe_experts=8, moe_top_k=2,
                                                   moe_capacity_factor=4.0),
                          "prompt": PurePromptBuilder},
    "mixtral-8x7b-instruct-v0.1": {"cfg": llama.LlamaConfig(vocab_size=32000, num_key_value_heads=8,
                                                            intermediate_size=14336, rope_theta=1e6,
                                                            max_position_embeddings=32768,
                                                            moe_experts=8, moe_top_k=2,
                                                            moe_capacity_factor=4.0),
                                   "prompt": MistralInstructPromptBuilder},
    # test/smoke-scale LLMs
    "llama-tiny": {"cfg": llama.LlamaConfig.tiny(vocab_size=512), "prompt": PurePromptBuilder},
    "mixtral-tiny": {"cfg": llama.LlamaConfig.tiny(vocab_size=512, moe_experts=4),
                     "prompt": PurePromptBuilder},
}


def get_vision_backbone_and_transform(
    vision_backbone_id: str, image_resize_strategy: str
) -> Tuple[Tuple[vit.ViTConfig, ...], Tuple[str, ...], ImageTransformConfig]:
    entry = VISION_BACKBONES[vision_backbone_id]
    cfgs = tuple(entry["cfgs"])
    names = tuple(entry.get(
        "names",
        # distinct per-tower defaults: a slice of a 1-tuple silently dropped
        # towers for multi-cfg entries without an explicit "names"
        tuple(f"vision_{i}" for i in range(len(cfgs))) if len(cfgs) > 1 else ("vision",),
    ))
    img_cfg = ImageTransformConfig(specs=tuple(entry["specs"]), resize_strategy=image_resize_strategy)
    return cfgs, names, img_cfg


def get_llm_backbone_and_prompt(llm_backbone_id: str) -> Tuple[llama.LlamaConfig, type]:
    entry = LLM_BACKBONES[llm_backbone_id]
    return entry["cfg"], entry["prompt"]


def build_vlm_config(
    vision_backbone_id: str = "dinosiglip-vit-so-224px",
    llm_backbone_id: str = "llama2-7b-pure",
    arch_specifier: str = "no-align+fused-gelu-mlp",
    image_resize_strategy: str = "resize-naive",
    dtype=jnp.bfloat16,
) -> Tuple[vlm.VLMConfig, ImageTransformConfig, type]:
    """Resolve string ids -> (VLMConfig, image transform config, prompt builder)."""
    import dataclasses

    vcfgs, names, img_cfg = get_vision_backbone_and_transform(
        vision_backbone_id, image_resize_strategy
    )
    lcfg, prompt_cls = get_llm_backbone_and_prompt(llm_backbone_id)
    vcfgs = tuple(dataclasses.replace(v, dtype=dtype) for v in vcfgs)
    lcfg = dataclasses.replace(lcfg, dtype=dtype)
    cfg = vlm.VLMConfig(llm=lcfg, vision=vcfgs, vision_names=names, arch_specifier=arch_specifier)
    return cfg, img_cfg, prompt_cls


# --- pretrained model registry ----------------------------------------------
# The 49-model catalog (ids, display names, descriptions) is a published fact
# table of the Prismatic/OpenVLA release — extracted to model_registry.json
# (reference prismatic/models/registry.py), plus the OpenVLA policy entries.

def _load_model_registry() -> Dict[str, Dict[str, Any]]:
    reg_path = Path(__file__).parent / "model_registry.json"
    registry: Dict[str, Dict[str, Any]] = {}
    if reg_path.exists():
        with open(reg_path) as f:
            registry.update(json.load(f))
    registry.setdefault("openvla-7b", {
        "model_id": "openvla-7b",
        "names": ["OpenVLA 7B"],
        # released policies live in their OWN HF repos (HF-layout), not the
        # TRI-ML prismatic-vlms run-dir repo — loaders route by this field
        "hf_repo": "openvla/openvla-7b",
        "description": {
            "name": "OpenVLA 7B",
            "description": "OpenVLA 7B policy (prism-dinosiglip-224px backbone) "
                           "trained on the Open-X magic-soup++ mixture",
        },
    })
    return registry


MODEL_REGISTRY: Dict[str, Dict[str, Any]] = _load_model_registry()
GLOBAL_REGISTRY: Dict[str, Dict[str, Any]] = {
    name: v for v in MODEL_REGISTRY.values() for name in [v["model_id"], *v.get("names", [])]
}


# --- HF checkpoint import ----------------------------------------------------

def _read_safetensors_dir(path: Path) -> Dict[str, np.ndarray]:
    from safetensors import safe_open

    state: Dict[str, np.ndarray] = {}
    files = sorted(path.glob("*.safetensors"))
    if not files:
        raise FileNotFoundError(f"No safetensors files under {path}")
    for f in files:
        with safe_open(str(f), framework="np") as sf:
            for k in sf.keys():
                state[k] = sf.get_tensor(k)
    return state


def _subdict(state: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {k[len(prefix):]: v for k, v in state.items() if k.startswith(prefix)}


def params_from_hf_state(
    state: Dict[str, np.ndarray], cfg: vlm.VLMConfig
) -> Dict[str, Any]:
    """Full HF-layout state dict -> our param pytree (bf16 per cfg dtypes)."""
    # the HF export renames dinov2 LayerScale gamma -> scale_factor; undo
    params: Dict[str, Any] = {"vision": {}}
    featurizer_prefixes = (
        [("featurizer.", cfg.vision_names[0])]
        if len(cfg.vision) == 1
        else [("featurizer.", cfg.vision_names[0]), ("fused_featurizer.", cfg.vision_names[1])]
    )
    for prefix, name in featurizer_prefixes:
        sub = _subdict(state, f"vision_backbone.{prefix}")
        vcfg = cfg.vision[cfg.vision_names.index(name)]
        params["vision"][name] = vit.params_from_timm(sub, vcfg)
    proj = _subdict(state, "projector.")
    params["projector"] = {
        fc: {"w": jnp.asarray(proj[f"{fc}.weight"], cfg.llm.dtype),
             "b": jnp.asarray(proj[f"{fc}.bias"], cfg.llm.dtype)}
        for fc in ["fc1", "fc2", "fc3"]
        if f"{fc}.weight" in proj
    }
    llm_state = _subdict(state, "language_model.")
    params["llm"] = llama.params_from_hf(llm_state, cfg.llm)
    return params


def params_to_hf_state(params: Dict[str, Any], cfg: vlm.VLMConfig) -> Dict[str, np.ndarray]:
    """Inverse of params_from_hf_state: our pytree -> HF-layout flat state dict
    (the convert_openvla_weights_to_hf.py export schema), numpy fp32."""
    state: Dict[str, np.ndarray] = {}

    def put(key, arr):
        state[key] = np.asarray(arr, np.float32)

    prefixes = (
        [("featurizer.", cfg.vision_names[0])]
        if len(cfg.vision) == 1
        else [("featurizer.", cfg.vision_names[0]), ("fused_featurizer.", cfg.vision_names[1])]
    )
    for prefix, name in prefixes:
        vp = params["vision"][name]
        vcfg = cfg.vision[cfg.vision_names.index(name)]
        base = f"vision_backbone.{prefix}"
        put(f"{base}patch_embed.proj.weight",
            np.asarray(vp["patch_embed"]["weight"], np.float32).reshape(vcfg.hidden_size, 3, vcfg.patch_size, vcfg.patch_size))
        if "bias" in vp["patch_embed"]:
            put(f"{base}patch_embed.proj.bias", vp["patch_embed"]["bias"])
        put(f"{base}pos_embed", vp["pos_embed"])
        if "cls_token" in vp:
            put(f"{base}cls_token", vp["cls_token"])
        if "reg_token" in vp:
            put(f"{base}reg_token", vp["reg_token"])
        if "norm_pre_scale" in vp:
            put(f"{base}norm_pre.weight", vp["norm_pre_scale"])
            put(f"{base}norm_pre.bias", vp["norm_pre_bias"])
        names_map = {
            "norm1_scale": "norm1.weight", "norm1_bias": "norm1.bias",
            "qkv_w": "attn.qkv.weight", "qkv_b": "attn.qkv.bias",
            "proj_w": "attn.proj.weight", "proj_b": "attn.proj.bias",
            "norm2_scale": "norm2.weight", "norm2_bias": "norm2.bias",
            "fc1_w": "mlp.fc1.weight", "fc1_b": "mlp.fc1.bias",
            "fc2_w": "mlp.fc2.weight", "fc2_b": "mlp.fc2.bias",
            "ls1": "ls1.scale_factor", "ls2": "ls2.scale_factor",
        }
        for ours, timm_key in names_map.items():
            if ours not in vp["blocks"]:
                continue
            stacked = np.asarray(vp["blocks"][ours], np.float32)
            for i in range(vcfg.num_layers):
                put(f"{base}blocks.{i}.{timm_key}", stacked[i])
    for fc in ["fc1", "fc2", "fc3"]:
        if fc in params["projector"]:
            put(f"projector.{fc}.weight", params["projector"][fc]["w"])
            put(f"projector.{fc}.bias", params["projector"][fc]["b"])
    lp = params["llm"]
    put("language_model.model.embed_tokens.weight", lp["embed_tokens"])
    put("language_model.model.norm.weight", lp["norm"])
    put("language_model.lm_head.weight", lp["lm_head"])
    inv_llm = {v: k for k, v in llama._HF_LAYER_KEYS.items()}
    for ours, hf_key in inv_llm.items():
        stacked = np.asarray(lp["layers"][ours], np.float32)
        for i in range(cfg.llm.num_hidden_layers):
            put(f"language_model.model.layers.{i}.{hf_key}", stacked[i])
    return state


def remap_prismatic_state(
    model_state: Dict[str, Dict[str, Any]],
    fused_vision: bool = True,
) -> Dict[str, np.ndarray]:
    """Reference-native component state dicts -> the HF-extern flat key scheme
    `params_from_hf_state` consumes.

    Mirrors the reference's remap (vla-scripts/extern/
    convert_openvla_weights_to_hf.py:76-117): sequential projector indices ->
    fc{1,2,3}, `llm.` -> `language_model.`, dino/siglip featurizer prefixes ->
    vision_backbone.{featurizer,fused_featurizer}., DINOv2 LayerScale `gamma`
    -> `scale_factor`. Values convert to numpy fp32 (torch bf16 has no numpy
    dtype)."""
    def np32(v):
        if hasattr(v, "detach"):   # torch tensor
            return v.detach().to("cpu").float().numpy()
        return np.asarray(v, np.float32)

    proj_map = {"projector.0": "projector.fc1", "projector.2": "projector.fc2",
                "projector.4": "projector.fc3"}
    out: Dict[str, np.ndarray] = {}
    for key, v in model_state["projector"].items():
        stem, leaf = key.rsplit(".", 1)
        out[f"{proj_map[stem]}.{leaf}"] = np32(v)
    for key, v in model_state["llm_backbone"].items():
        out[key.replace("llm.", "language_model.", 1)] = np32(v)
    for key, v in model_state["vision_backbone"].items():
        if fused_vision and key.startswith("dino_featurizer."):
            if key.endswith(".gamma"):
                key = key.replace(".gamma", ".scale_factor")
            out[key.replace("dino_featurizer.", "vision_backbone.featurizer.", 1)] = np32(v)
        elif fused_vision and key.startswith("siglip_featurizer."):
            out[key.replace("siglip_featurizer.", "vision_backbone.fused_featurizer.", 1)] = np32(v)
        else:
            out["vision_backbone." + key] = np32(v)
    return out


def load_prismatic_checkpoint(
    config_json: Union[str, Path],
    checkpoint_pt: Union[str, Path],
    dataset_statistics_json: Optional[Union[str, Path]] = None,
    dtype=jnp.bfloat16,
) -> Dict[str, Any]:
    """Load a reference-NATIVE training-run checkpoint (`config.json` +
    `checkpoints/*.pt`) — the format the reference's `load()`/`load_vla()`
    consume and the hub repos TRI-ML/prismatic-vlms + openvla/openvla-dev
    store (reference prismatic/models/load.py:51-226).

    config.json carries either {"model": {...}} (VLM run) or
    {"vla": {"base_vlm": <ModelConfig id>}} (VLA run)."""
    import torch

    with open(config_json) as f:
        raw = json.load(f)
    if "vla" in raw:
        from ..conf.models import ModelConfig

        mc = ModelConfig.get_choice_class(raw["vla"]["base_vlm"])()
        vision_id, llm_id = mc.vision_backbone_id, mc.llm_backbone_id
        arch, resize = mc.arch_specifier, mc.image_resize_strategy
    else:
        m = raw["model"]
        vision_id, llm_id = m["vision_backbone_id"], m["llm_backbone_id"]
        arch = m.get("arch_specifier", "no-align+fused-gelu-mlp")
        resize = m.get("image_resize_strategy", "resize-naive")
    cfg, img_cfg, prompt_cls = build_vlm_config(vision_id, llm_id, arch, resize,
                                                dtype=dtype)
    model_state = torch.load(checkpoint_pt, map_location="cpu",
                             weights_only=True)["model"]
    state = remap_prismatic_state(model_state, fused_vision=len(cfg.vision) == 2)
    emb = state.get("language_model.model.embed_tokens.weight")
    if emb is not None and emb.shape[0] != cfg.llm.vocab_size:
        # VLA runs resize the vocab for the pad token (32000 -> 32064); the
        # checkpoint is the source of truth
        import dataclasses

        cfg = dataclasses.replace(
            cfg, llm=dataclasses.replace(cfg.llm, vocab_size=int(emb.shape[0])))
    params = params_from_hf_state(state, cfg)
    norm_stats = {}
    if dataset_statistics_json and Path(dataset_statistics_json).exists():
        with open(dataset_statistics_json) as f:
            norm_stats = json.load(f)
    return {"params": params, "cfg": cfg, "image_cfg": img_cfg,
            "prompt_builder": prompt_cls, "norm_stats": norm_stats}


def load_openvla_hf_checkpoint(
    checkpoint_dir: Union[str, Path],
    dtype=jnp.bfloat16,
) -> Dict[str, Any]:
    """Load an OpenVLA HF checkpoint directory -> (params, cfg, img_cfg,
    norm_stats). Reads config.json for backbone ids + dataset_statistics."""
    import dataclasses

    path = Path(checkpoint_dir)
    with open(path / "config.json") as f:
        hf_cfg = json.load(f)
    vision_id = hf_cfg.get("vision_backbone_id", "dinosiglip-vit-so-224px")
    resize = hf_cfg.get("image_resize_strategy", "resize-naive")
    llm_id = hf_cfg.get("llm_backbone_id", "llama2-7b-pure")
    cfg, img_cfg, prompt_cls = build_vlm_config(vision_id, llm_id,
                                                hf_cfg.get("arch_specifier", "no-align+fused-gelu-mlp"),
                                                resize, dtype=dtype)
    # the HF text config carries the padded vocab (32064)
    text_vocab = hf_cfg.get("text_config", {}).get("vocab_size")
    if text_vocab:
        cfg = dataclasses.replace(cfg, llm=dataclasses.replace(cfg.llm, vocab_size=text_vocab))
    state = _read_safetensors_dir(path)
    params = params_from_hf_state(state, cfg)
    norm_stats = hf_cfg.get("norm_stats", {})
    return {"params": params, "cfg": cfg, "image_cfg": img_cfg,
            "prompt_builder": prompt_cls, "norm_stats": norm_stats}
