"""LoRA fine-tuning: low-rank adapters over the functional param pytrees.

Equivalent of the reference's PEFT path (vla-scripts/finetune.py:173-182:
LoraConfig(r, alpha=min(r,16), target_modules="all-linear", init_lora_weights
="gaussian")): adapters on every linear weight (LLM projections, ViT
qkv/proj/mlp, projector fcs). Functionally:

    W_eff = W + (alpha / r) * B @ A,     A ~ N(0, 1/r), B = 0

Two execution modes, both training only the low-rank factors:

- **merged** (`merge_lora`): materializes W + scale*B@A inside the jitted
  step. Simple, but the merged tree is a full extra copy of the base — fine
  at test scale, 2x13.5 GB at 7B.
- **streamed** (`attach_lora`): zero-copy — target leaves become
  `{"base": W, "A", "B"}` wrappers that `ops.linear.matmul_t` dispatches on,
  computing `W(x) + (x A^T) B^T` per use. No merged weight ever exists, the
  base may itself be int8-quantized ({"q","s"} leaves, QLoRA-style), and the
  wrapped stacks slice transparently inside `lax.scan`. This is what lets the
  full 7B finetune on a single 16 GB v5e chip (the reference's LoRA path
  needs 27-72 GB of GPU HBM, vla-scripts/finetune.py:9-11).

`merge_and_unload` produces a plain param pytree for serving (mirrors
finetune.py:326-361's adapter -> merged-model save).
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


def _weight_shape_dtype(leaf) -> Tuple[Tuple[int, ...], Any]:
    from ..ops.linear import is_grouped_int4, is_quantized

    # adapters are ALWAYS fp32 masters (they are tiny — ~320 MB at 7B/r=32 —
    # and bf16 storage swallows small Adam updates late in convergence);
    # matmul_t casts them to the activation dtype at use
    if is_quantized(leaf):
        qs = tuple(np.shape(leaf["q"]))
        if is_grouped_int4(leaf):
            # group-major int4 codes [*, G, O, gsz] -> logical [*, O, I]
            *batch, G, O, gsz = qs
            return (*batch, O, G * gsz), jnp.float32
        return qs, jnp.float32
    return tuple(np.shape(leaf)), jnp.float32


def init_lora_params(params: Any, cfg: LoRAConfig, key: jax.Array) -> Any:
    """Pytree of {'A': ..., 'B': ...} at target leaves, None elsewhere.

    Weights [*, out, in] -> A [*, r, in] gaussian, B [*, out, r] zeros.
    Quantized {"q","s"} leaves count as single weights; adapters are fp32
    masters (see _weight_shape_dtype) cast to the activation dtype at use.
    """
    from ..ops.linear import is_nibble_quant, is_quantized

    if any(is_nibble_quant(l) for l in jax.tree_util.tree_leaves(
            params,
            is_leaf=lambda x: is_nibble_quant(x) or is_quantized(x))):
        # nibble-plane trees are a SERVING representation: flattening would
        # recurse into the hi/lo planes and silently target nothing. QLoRA
        # bases are int8 (footprint ≈ nibble's) or grouped int4 (half) —
        # load the base with quantize_bits=8 or 4 instead.
        raise NotImplementedError(
            "QLoRA over a nibble-plane base is unsupported; use an int8 "
            "(same resident bytes) or int4 base")
    flat, treedef = jax.tree_util.tree_flatten_with_path(params, is_leaf=is_quantized)
    keys = jax.random.split(key, len(flat))
    out = []
    for (path, leaf), k in zip(flat, keys):
        p = _path_str(path)
        shape, dtype = _weight_shape_dtype(leaf)
        if _is_target(p, shape, cfg):
            *batch, o, i = shape
            A = (jax.random.normal(k, (*batch, cfg.r, i), jnp.float32) / cfg.r).astype(dtype)
            B = jnp.zeros((*batch, o, cfg.r), dtype)
            out.append({"A": A, "B": B})
        else:
            out.append(None)
    return jax.tree_util.tree_unflatten(treedef, out)


def merge_lora(params: Any, lora: Any, cfg: LoRAConfig) -> Any:
    """W + scale * B @ A at adapted leaves (batched over any stack dims).

    A quantized {"q","s"} base leaf is dequantized, merged in fp32, and
    re-quantized (the exported tree keeps the base's representation: int8
    per-channel or grouped int4). Note for int4 under a trace: the merged
    codes come back as int8 CODES (emit_codes — s4 jit outputs carry
    poisoned layout metadata, ops.linear._canonical_s4_format); they serve
    correctly through matmul_t's dequant fallback, and a caller that wants
    the packed s4 form must materialize_int4 each code leaf eagerly."""
    from ..ops.linear import (
        dequantize_weight, is_grouped_int4, is_quantized, quantize_weight,
        quantize_weight_int4)

    scale = cfg.scaling

    def merge(lw, w):
        if lw is None:
            return w
        delta = scale * jnp.einsum(
            "...or,...ri->...oi", lw["B"].astype(jnp.float32), lw["A"].astype(jnp.float32)
        )
        if is_quantized(w):
            merged = dequantize_weight(w, jnp.float32) + delta
            if is_grouped_int4(w):
                gsz = int(w["q"].shape[-1])
                traced = isinstance(merged, jax.core.Tracer)
                return quantize_weight_int4(merged, group_size=gsz,
                                            emit_codes=traced)
            return quantize_weight(merged)
        return (w.astype(jnp.float32) + delta).astype(w.dtype)

    # lora first (see attach_lora): quantized base subtrees stay intact
    return jax.tree.map(merge, lora, params, is_leaf=lambda x: x is None or (
        isinstance(x, dict) and set(x.keys()) == {"A", "B"}
    ))


def merge_and_unload(params: Any, lora: Any, cfg: LoRAConfig) -> Any:
    """Produce a plain (serving) param pytree with adapters folded in."""
    return merge_lora(params, lora, cfg)


def merge_and_unload_host(params: Any, lora: Any, cfg: LoRAConfig) -> Any:
    """Full-scale merged export on the HOST (numpy), leaf by leaf.

    At 7B the device cannot hold base + merged simultaneously (13.5 GB each
    in bf16; int8 base + bf16 merged is 20 GB) — the on-device merge OOMs a
    16 GB chip at save time. Here each adapted leaf is pulled to host RAM,
    merged in fp32, and re-quantized/cast back; unadapted leaves transfer
    unchanged. Peak host memory is one merged tree + one fp32 leaf.

    Grouped-int4 bases export as per-channel INT8 (a strictly
    higher-precision representation of the merged weight; the int4 serving
    artifact is re-derived at load time via load_vla(quantize_bits=4)).
    Two reasons: s4 device arrays cannot round-trip through numpy on every
    backend, and checkpoint formats have no packed-4-bit story."""
    from ..ops.linear import is_grouped_int4, is_quantized

    scale = cfg.scaling

    def to_host(x):
        if getattr(x, "dtype", None) == jnp.int4:
            # device-side widen first: np.asarray(s4) is UNIMPLEMENTED on
            # some backends (axon TPU) and recurses on others
            return np.asarray(jax.jit(lambda a: a.astype(jnp.int8))(x))
        return np.asarray(x)

    def merge(lw, w):
        if lw is None:
            return jax.tree.map(to_host, w)
        A = np.asarray(lw["A"], np.float32)
        B = np.asarray(lw["B"], np.float32)
        delta = scale * np.einsum("...or,...ri->...oi", B, A)
        if is_quantized(w):
            if is_grouped_int4(w):
                codes = to_host(w["q"]).astype(np.float32)   # [.., G, O, gsz]
                sg = np.asarray(w["s"], np.float32)           # [.., O, G]
                wf = codes * np.moveaxis(sg, -1, -2)[..., None]
                *lead, G, O, gsz = codes.shape
                wf = np.moveaxis(wf, -3, -2).reshape(*lead, O, G * gsz)
            else:
                wf = np.asarray(w["q"], np.float32) * np.asarray(w["s"], np.float32)[..., None]
            wf += delta
            s = np.maximum(np.max(np.abs(wf), axis=-1) / 127.0, 1e-8)
            q = np.clip(np.round(wf / s[..., None]), -127, 127).astype(np.int8)
            return {"q": q, "s": s.astype(np.float32)}
        wd = np.asarray(w, np.float32) + delta
        return wd.astype(np.asarray(w).dtype)

    return jax.tree.map(merge, lora, params, is_leaf=_is_ab)


def _is_ab(x) -> bool:
    return x is None or (isinstance(x, dict) and set(x.keys()) == {"A", "B"})


def attach_lora(params: Any, lora: Any, cfg: LoRAConfig) -> Any:
    """Zero-copy streamed LoRA: wrap target leaves as {"base", "A", "B"}.

    `ops.linear.matmul_t` computes base(x) + (x A^T)(B^T) per use — no merged
    weight is ever materialized (at 7B the merge would double the 13.5 GB
    weight footprint and OOM a 16 GB chip). The base may be bf16 arrays or
    int8 {"q","s"} leaves (QLoRA-style: frozen int8 base, bf16 adapters —
    the quantized base takes the grad-safe dequant dot, see matmul_t).
    The alpha/r scaling is folded into the wrapped B (a tiny multiply XLA
    fuses; gradients flow through it to the unscaled factor).
    """
    scale = cfg.scaling

    def attach(lw, w):
        if lw is None:
            return w
        return {"base": w, "A": lw["A"], "B": lw["B"] * scale}

    # lora FIRST: its {"A","B"}/None nodes are the leaves, and the params tree
    # is flattened only down to those positions — so a quantized {"q","s"}
    # base arrives intact as the corresponding subtree
    return jax.tree.map(attach, lora, params, is_leaf=_is_ab)


def make_lora_loss_fn(
    base_loss_fn: Callable,
    base_params: Any,
    cfg: LoRAConfig,
    stream: bool = False,
) -> Callable:
    """Wrap a loss over adapted weights; only the adapters are the
    differentiated argument, so the base stays frozen.

    stream=True uses `attach_lora` (no merged-weight copy; required at 7B
    scale and for int8 bases), stream=False materializes the merge."""

    with_base = make_lora_loss_with_base(base_loss_fn, cfg, stream=stream)

    def loss(lora_params, model_cfg, batch):
        return with_base(lora_params, base_params, model_cfg, batch)

    return loss


def make_lora_loss_with_base(
    base_loss_fn: Callable,
    cfg: LoRAConfig,
    stream: bool = True,
) -> Callable:
    """Like make_lora_loss_fn, but the frozen base rides as an ARGUMENT:
    `loss(lora_params, base_params, model_cfg, batch)`.

    A base closed over in the loss gets captured into the jit lowering as
    constants — ~8.5 GB of duplicated buffers at 7B (JAX warns at lowering).
    Passing it as an argument keeps exactly one device copy. Use this form
    for any full-scale training jit."""

    def loss(lora_params, base_params, model_cfg, batch):
        if stream:
            adapted = attach_lora(base_params, lora_params, cfg)
        else:
            adapted = merge_lora(base_params, lora_params, cfg)
        return base_loss_fn(adapted, model_cfg, batch)

    return loss
