#!/usr/bin/env python
"""HBM budget planner: max feasible serving batch / required tp for a config.

Encodes the deployment arithmetic from PARITY_r02.md: weights + KV cache +
activation headroom vs per-chip HBM, per serving mode (bf16 / int8), and the
tp degree needed when weights alone exceed one chip (7B bf16, any 13B).

Usage: python scripts/hbm_budget.py [--llm llama2-7b-pure] [--hbm_gb 16]
       [--prompt_pad 32] [--action_dim 7]
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


@dataclass(frozen=True)
class BudgetConfig:
    llm: str = "llama2-7b-pure"
    vision: str = "dinosiglip-vit-so-224px"
    hbm_gb: float = 16.0            # v5e
    hbm_bw_gbps: float = 819.0      # v5e
    prompt_pad: int = 32
    action_dim: int = 7
    activation_headroom_gb: float = 0.8  # measured slack for the serving graph


def plan(cfg: BudgetConfig) -> dict:
    import numpy as np

    from openvla_probe_tpu.models import catalog, vit

    lcfg = catalog.LLM_BACKBONES[cfg.llm]["cfg"]
    vcfgs = catalog.VISION_BACKBONES[cfg.vision]["cfgs"]

    def vit_params(v):
        D, F, L = v.hidden_size, v.mlp_dim, v.num_layers
        return L * (4 * D * D + 2 * D * F) + v.hidden_size * 3 * v.patch_size**2

    attn_params = lcfg.num_hidden_layers * (
        2 * lcfg.hidden_size * lcfg.num_attention_heads * lcfg.head_dim
        + 2 * lcfg.hidden_size * lcfg.num_key_value_heads * lcfg.head_dim
    )
    ffn_per_layer = 3 * lcfg.hidden_size * lcfg.intermediate_size
    n_exp = getattr(lcfg, "moe_experts", 0)
    if n_exp:
        # sparse-MoE trunk: E expert FFNs + router per layer are STORED, but
        # each token only STREAMS top_k experts (bs=1 decode; at batch
        # decode with B*top_k >= E all experts are touched — the full-stream
        # figure below stays the batched-decode number)
        ffn_stored = n_exp * ffn_per_layer + n_exp * lcfg.hidden_size
        ffn_active = lcfg.moe_top_k * ffn_per_layer + n_exp * lcfg.hidden_size
    else:
        ffn_stored = ffn_active = ffn_per_layer
    embed_params = lcfg.vocab_size * lcfg.hidden_size * 2          # embed + lm_head
    llm_params = embed_params + attn_params + lcfg.num_hidden_layers * ffn_stored
    llm_active = embed_params + attn_params + lcfg.num_hidden_layers * ffn_active
    vis_params = sum(vit_params(v) for v in vcfgs)
    n_patches = (vcfgs[0].image_size // vcfgs[0].patch_size) ** 2
    seq = 1 + n_patches + cfg.prompt_pad - 1 + cfg.action_dim

    out = {"llm_params_b": round(llm_params / 1e9, 3),
           "vision_params_b": round(vis_params / 1e9, 3),
           "cache_seq_len": seq, "modes": {}}
    if n_exp:
        out["llm_active_params_b"] = round(llm_active / 1e9, 3)
    # (mode, resident bytes/elem, decode-STREAM bytes/elem): nibble and
    # int4 are resident==1.0/0.52 but stream only 0.5 B/elem at decode
    # (hi plane / s4 codes — PERF_r05.md roofline); mix holds both copies
    # resident (1.55) and streams the int4 copy (0.52)
    for mode, wbytes, dbytes in (("bf16", 2.0, 2.0), ("int8", 1.0, 1.0),
                                 ("nibble", 1.0, 0.5), ("mix", 1.55, 0.52),
                                 ("int4", 0.52, 0.52)):
        q = mode != "bf16"
        weights_gb = (llm_params * wbytes + vis_params * (1.0 if q else 2.0)) / 2**30
        kv_per_item = (2 * lcfg.num_hidden_layers * seq
                       * lcfg.num_key_value_heads * lcfg.head_dim * 2) / 2**30
        tp = 1
        while weights_gb / tp + cfg.activation_headroom_gb + kv_per_item > cfg.hbm_gb:
            tp *= 2
            if tp > 64:
                break
        free = cfg.hbm_gb - weights_gb / tp - cfg.activation_headroom_gb
        max_batch = int(max(free // kv_per_item, 0))
        decode_ms = (llm_params * dbytes / 2**30 / tp) / cfg.hbm_bw_gbps * 1e3
        out["modes"][mode] = {
            "weights_gb": round(weights_gb, 2),
            "kv_gb_per_item": round(kv_per_item, 4),
            "min_tp": tp,
            "max_batch_at_min_tp": max_batch,
            "decode_weight_stream_ms_per_token": round(decode_ms, 2),
        }
        if n_exp:
            # bs=1 decode streams only top_k experts' FFN per layer (the
            # MoE latency advantage); min_tp can equivalently be ep ways
            active_gb = (llm_active * dbytes + vis_params * (1.0 if q else 2.0)) / 2**30
            out["modes"][mode]["decode_weight_stream_ms_per_token_bs1"] = round(
                (active_gb / tp) / cfg.hbm_bw_gbps * 1e3, 2)
    return out


def main(cfg: BudgetConfig) -> None:
    print(json.dumps(plan(cfg), indent=2))


if __name__ == "__main__":
    main(parse_config(BudgetConfig))
