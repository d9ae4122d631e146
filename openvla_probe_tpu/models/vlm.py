"""Prismatic VLM: fused dual-ViT vision + projector + Llama, one traced graph.

Functional re-design of the reference VLM (prismatic/models/vlms/prismatic.py:38-621
and its serving twin extern/hf/modeling_prismatic.py:280-489):

  * vision: per-backbone featurize (second-to-last block patches), features
    concatenated on the channel axis (dinosiglip_vit.py:142-147 /
    modeling_prismatic.py:114-123). Input is the channel-stacked pixel tensor
    ([B, 3*num_backbones, S, S]) split per backbone.
  * multimodal splice: projected patches inserted AFTER the BOS token
    (modeling_prismatic.py:380-390); labels for patch positions = IGNORE_INDEX.
  * unimodal branch: plain LLM forward.

Everything is one jit: vision, projector, splice and LLM prefill fuse; there is
no host round-trip between backbones (the reference runs two separate timm
models sequentially).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from . import llama, projector, vit

Params = Dict[str, Any]
IGNORE_INDEX = -100


@dataclasses.dataclass(frozen=True)
class VLMConfig:
    llm: llama.LlamaConfig
    vision: Tuple[vit.ViTConfig, ...]
    vision_names: Tuple[str, ...] = ("dino", "siglip")
    arch_specifier: str = "no-align+fused-gelu-mlp"
    feature_layer_index: int = -2

    @property
    def vision_dim(self) -> int:
        return sum(v.hidden_size for v in self.vision)

    @property
    def num_patches(self) -> int:
        return self.vision[0].num_patches

    @property
    def projector_arch(self) -> str:
        return self.arch_specifier.split("+")[-1]

    @staticmethod
    def openvla_7b() -> "VLMConfig":
        """prism-dinosiglip-224px+7b: DINOv2 ViT-L/14-reg + SigLIP so400m + Llama-2-7B."""
        return VLMConfig(
            llm=llama.LlamaConfig.llama2_7b(),
            vision=(vit.ViTConfig.dinov2_vit_l(dtype=jnp.bfloat16),
                    vit.ViTConfig.siglip_so400m(dtype=jnp.bfloat16)),
        )

    def turbo(self) -> "VLMConfig":
        """THE turbo serving numerics (single definition — bench.py and
        scripts/check_parity.py both ship/certify exactly this): bf16
        attention-score materialization in trunk + towers, bf16 RoPE (HF's
        own rope convention), and tanh-approximated GELU where a tower
        specifies exact erf GELU. The erf polynomial is pure VPU work that
        cannot overlap the tiny K=1024 MXU pass — profiled at ~0.3 ms of the
        DINOv2 fc1 fusion's 0.49 ms/layer (SigLIP's native tanh-GELU fc1
        runs at 89% of its matmul floor). max |gelu_tanh - gelu_erf| ~ 1e-3
        absolute — orders below the certified action-token margins. Rides
        with int8 weights in the turbo tier; bf16 weights + this config is
        NOT the bit-parity mode."""
        return dataclasses.replace(
            self,
            llm=dataclasses.replace(self.llm, attn_scores_dtype=jnp.bfloat16,
                                    rope_dtype=jnp.bfloat16),
            vision=tuple(
                dataclasses.replace(
                    v, attn_scores_dtype=jnp.bfloat16,
                    act="gelu_tanh" if v.act == "gelu" else v.act)
                for v in self.vision),
        )

    @staticmethod
    def openvla_13b() -> "VLMConfig":
        """prism-dinosiglip-224px+13b dims: same dual ViT, Llama-2-13B trunk
        (13 GB int8 — serves on ONE 16 GB v5e; bf16 needs the tp=2 path)."""
        return VLMConfig(
            llm=llama.LlamaConfig.llama2_13b(),
            vision=(vit.ViTConfig.dinov2_vit_l(dtype=jnp.bfloat16),
                    vit.ViTConfig.siglip_so400m(dtype=jnp.bfloat16)),
        )

    @staticmethod
    def tiny(**kw) -> "VLMConfig":
        d = dict(
            llm=llama.LlamaConfig.tiny(),
            vision=(vit.ViTConfig.tiny(num_register_tokens=2, no_embed_class=True, use_layerscale=True),
                    vit.ViTConfig.tiny(use_cls_token=False, act="gelu_tanh")),
        )
        d.update(kw)
        return VLMConfig(**d)


def vision_features(params: Params, cfg: VLMConfig, pixel_values: jnp.ndarray) -> jnp.ndarray:
    """Channel-stacked [B, 3*K, S, S] -> concatenated patch features [B, N, sum(D_k)]."""
    feats = []
    for i, (name, vcfg) in enumerate(zip(cfg.vision_names, cfg.vision)):
        px = pixel_values[:, 3 * i : 3 * (i + 1)]
        feats.append(vit.forward_features(params["vision"][name], vcfg, px, cfg.feature_layer_index))
    return jnp.concatenate(feats, axis=-1)


def project_patches(params: Params, cfg: VLMConfig, patch_features: jnp.ndarray) -> jnp.ndarray:
    return projector.forward(params["projector"], cfg.projector_arch, patch_features)


def build_multimodal_inputs(
    params: Params,
    cfg: VLMConfig,
    input_ids: jnp.ndarray,        # [B, T]
    attn_mask: jnp.ndarray,        # [B, T]
    pixel_values: jnp.ndarray,     # [B, 3K, S, S]
    labels: Optional[jnp.ndarray] = None,
    multimodal_mask: Optional[jnp.ndarray] = None,   # [B] bool; False = text-only row
) -> Dict[str, jnp.ndarray]:
    """Splice projected patches after BOS: [BOS | patches | rest].

    Mixed batches (reference prismatic.py:422-467 fuses unimodal/multimodal
    examples): text-only rows keep the STATIC spliced layout but their patch
    block is masked out of attention — combined with mask-cumsum RoPE
    positions in `forward`, the row computes exactly the unspliced unimodal
    forward (the zero-image patches previously leaked into text-only rows)."""
    patches = project_patches(params, cfg, vision_features(params, cfg, pixel_values))
    patches = patches.astype(cfg.llm.dtype)
    embeds = _llm_embed(cfg)(params["llm"], input_ids)
    B, N = patches.shape[:2]
    mm_embeds = jnp.concatenate([embeds[:, :1], patches, embeds[:, 1:]], axis=1)
    if multimodal_mask is None:
        patch_valid = jnp.ones((B, N), attn_mask.dtype)
    else:
        patch_valid = jnp.broadcast_to(
            multimodal_mask.astype(attn_mask.dtype)[:, None], (B, N)
        )
    mm_mask = jnp.concatenate([attn_mask[:, :1], patch_valid, attn_mask[:, 1:]], axis=1)
    out = {"inputs_embeds": mm_embeds, "attn_mask": mm_mask, "patches": patches}
    if labels is not None:
        patch_labels = jnp.full((B, N), IGNORE_INDEX, labels.dtype)
        out["labels"] = jnp.concatenate([labels[:, :1], patch_labels, labels[:, 1:]], axis=1)
    return out


def forward(
    params: Params,
    cfg: VLMConfig,
    input_ids: jnp.ndarray,
    attn_mask: jnp.ndarray,
    pixel_values: Optional[jnp.ndarray] = None,
    labels: Optional[jnp.ndarray] = None,
    collect_hidden_states: bool = False,
    multimodal_mask: Optional[jnp.ndarray] = None,   # [B] bool for mixed batches
) -> Dict[str, Any]:
    """Training/eval forward. Multimodal when pixel_values given, else unimodal.
    For MIXED batches pass `multimodal_mask` (False rows = text-only): their
    patch block is excluded from attention and RoPE positions follow the
    attended tokens, reproducing the unspliced unimodal forward per row.

    Returns logits (+ shifted `labels` aligned with them when given,
    + hidden_pooled taps when requested).
    """
    if pixel_values is None:
        embeds = _llm_embed(cfg)(params["llm"], input_ids)
        mask, lbls = attn_mask, labels
    else:
        mm = build_multimodal_inputs(
            params, cfg, input_ids, attn_mask, pixel_values, labels,
            multimodal_mask=multimodal_mask,
        )
        embeds, mask = mm["inputs_embeds"], mm["attn_mask"]
        lbls = mm.get("labels")
    B, T = embeds.shape[:2]
    if multimodal_mask is not None and pixel_values is not None:
        # position = index among ATTENDED tokens (text-only rows skip the
        # masked patch block, matching the unspliced row's RoPE positions)
        positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)
    else:
        positions = jnp.broadcast_to(jnp.arange(T), (B, T))
    if _is_phi(cfg):
        from . import phi

        if collect_hidden_states:
            raise NotImplementedError("hidden-state taps are a llama-trunk feature")
        out = phi.forward(params["llm"], cfg.llm, embeds, mask, positions)
    else:
        out = llama.forward(
            params["llm"], cfg.llm, embeds, mask, positions,
            collect_hidden_states=collect_hidden_states,
        )
    if lbls is not None:
        out["labels"] = lbls
    return out


def _is_phi(cfg: "VLMConfig") -> bool:
    from . import phi

    return isinstance(cfg.llm, phi.PhiConfig)


def _llm_embed(cfg: "VLMConfig"):
    if _is_phi(cfg):
        from . import phi

        return phi.embed_tokens
    return llama.embed_tokens


def init_params(cfg: VLMConfig, key: jax.Array) -> Params:
    kv, kp, kl = jax.random.split(key, 3)
    vkeys = jax.random.split(kv, len(cfg.vision))
    if _is_phi(cfg):
        from . import phi

        llm_params = phi.init_params(cfg.llm, kl)
    else:
        llm_params = llama.init_params(cfg.llm, kl)
    return {
        "vision": {
            name: vit.init_params(vcfg, k)
            for name, vcfg, k in zip(cfg.vision_names, cfg.vision, vkeys)
        },
        "projector": projector.init_params(
            cfg.projector_arch, cfg.vision_dim, cfg.llm.hidden_size, kp, cfg.llm.dtype
        ),
        "llm": llm_params,
    }
