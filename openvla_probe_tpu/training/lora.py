"""LoRA fine-tuning: low-rank adapters over the functional param pytrees.

Equivalent of the reference's PEFT path (vla-scripts/finetune.py:173-182:
LoraConfig(r, alpha=min(r,16), target_modules="all-linear", init_lora_weights
="gaussian")): adapters on every linear weight (LLM projections, ViT
qkv/proj/mlp, projector fcs). Functionally:

    W_eff = W + (alpha / r) * B @ A,     A ~ N(0, 1/r), B = 0

Merging happens inside the jitted step (`merge_lora`); for layer-stacked
weights the merge is a batched einsum that XLA fuses into the scan, so only
the low-rank factors are trained/optimizer-tracked. `merge_and_unload`
produces a plain param pytree for serving (mirrors finetune.py:326-361's
adapter -> merged-model save).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# weight-leaf name suffixes that count as "linear" (all-linear target)
_LINEAR_SUFFIXES = (
    "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj",
    "qkv_w", "proj_w", "fc1_w", "fc2_w", "w",
    # phi trunk (models/phi.py layout)
    "q_w", "k_w", "v_w", "dense_w",
)


@dataclasses.dataclass(frozen=True)
class LoRAConfig:
    r: int = 32
    alpha: Optional[int] = None       # default min(r, 16), the reference's rule
    target_suffixes: Tuple[str, ...] = _LINEAR_SUFFIXES
    include_lm_head: bool = False
    include_embeddings: bool = False

    @property
    def scaling(self) -> float:
        a = self.alpha if self.alpha is not None else min(self.r, 16)
        return a / self.r


def _path_str(path) -> str:
    parts = []
    for p in path:
        if isinstance(p, jax.tree_util.DictKey):
            parts.append(str(p.key))
    return "/".join(parts)


def _is_target(path: str, shape, cfg: LoRAConfig) -> bool:
    if len(shape) < 2:
        return False
    leaf = path.rsplit("/", 1)[-1]
    if leaf in ("embed_tokens",):
        return cfg.include_embeddings
    if leaf in ("lm_head", "lm_head_w"):
        return cfg.include_lm_head
    if leaf == "weight" and "patch_embed" in path:
        return False  # conv patch embed: not a PEFT "linear"
    return leaf in cfg.target_suffixes


def init_lora_params(params: Any, cfg: LoRAConfig, key: jax.Array) -> Any:
    """Pytree of {'A': ..., 'B': ...} at target leaves, None elsewhere.

    Weights [*, out, in] -> A [*, r, in] gaussian, B [*, out, r] zeros.
    """
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    keys = jax.random.split(key, len(flat))
    out = []
    for (path, leaf), k in zip(flat, keys):
        p = _path_str(path)
        if _is_target(p, np.shape(leaf), cfg):
            *batch, o, i = np.shape(leaf)
            A = (jax.random.normal(k, (*batch, cfg.r, i), jnp.float32) / cfg.r).astype(leaf.dtype)
            B = jnp.zeros((*batch, o, cfg.r), leaf.dtype)
            out.append({"A": A, "B": B})
        else:
            out.append(None)
    return jax.tree_util.tree_unflatten(treedef, out)


def merge_lora(params: Any, lora: Any, cfg: LoRAConfig) -> Any:
    """W + scale * B @ A at adapted leaves (batched over any stack dims)."""
    scale = cfg.scaling

    def merge(w, lw):
        if lw is None:
            return w
        delta = jnp.einsum(
            "...or,...ri->...oi", lw["B"].astype(jnp.float32), lw["A"].astype(jnp.float32)
        )
        return (w.astype(jnp.float32) + scale * delta).astype(w.dtype)

    return jax.tree.map(merge, params, lora, is_leaf=lambda x: x is None or (
        isinstance(x, dict) and set(x.keys()) == {"A", "B"}
    ))


def merge_and_unload(params: Any, lora: Any, cfg: LoRAConfig) -> Any:
    """Produce a plain (serving) param pytree with adapters folded in."""
    return merge_lora(params, lora, cfg)


def make_lora_loss_fn(base_loss_fn: Callable, base_params: Any, cfg: LoRAConfig) -> Callable:
    """Wrap a loss over merged weights; only the adapters are the
    differentiated argument, so the base stays frozen."""

    def loss(lora_params, model_cfg, batch):
        merged = merge_lora(base_params, lora_params, cfg)
        return base_loss_fn(merged, model_cfg, batch)

    return loss
