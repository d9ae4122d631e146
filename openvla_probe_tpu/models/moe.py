"""Sparse mixture-of-experts SwiGLU FFN with static-capacity dispatch and
expert parallelism over an `ep` mesh axis.

The reference has no MoE (its LLM backbones are dense Llama/Mistral/Phi,
prismatic/models/backbones/llm/*); this module extends the LLM family the
TPU-first way so Mixtral-style checkpoints (HF `MixtralForCausalLM`) load
onto the same stacked-scan trunk and experts shard over an `ep` mesh axis.

Routing semantics follow HF Mixtral (`modeling_mixtral.py` MixtralSparseMoeBlock):
  * router logits in fp32, softmax over ALL experts,
  * top-k experts per token, selected probabilities renormalized to sum 1,
  * each expert is a SwiGLU FFN: down(silu(gate(x)) * up(x)),
  * outputs combined with the renormalized weights.

TPU-first formulation (GShard/Switch): no gather/scatter with data-dependent
shapes — dispatch and combine are ONE-HOT EINSUMS with a static per-expert
capacity C, so the whole block is three batched matmuls the MXU tiles
natively and XLA can shard:

    dispatch [S, E, C] = sum_k onehot(expert_k) x onehot(slot_k) x keep_k
    xin  [E, C, D] = einsum('sec,sd->ecd', dispatch, x)
    y_e  [E, C, D] = SwiGLU per expert (weights stacked [E, F, D] / [E, D, F])
    y    [S, D]    = einsum('sec,ecd->sd', combine, y_e)

Under a mesh with an `ep` axis the expert-stacked weights shard on their E
dim (parallel.sharding ep rule) and XLA turns the dispatch/combine einsums
into the all-to-alls of expert parallelism; tokens stay on `dp`. Tokens
beyond an expert's capacity are DROPPED (contribute 0; the residual stream
carries them) — the standard static-shape trade. `capacity >= S` is exact /
dropless, which is what the HF-parity tests pin.

Layer-stacked params (leading L axis sliced away by the lax.scan in
models/llama.py before reaching here):
    router     [E, D]      (matmul convention [out, in], like q_proj)
    gate_proj  [E, F, D]
    up_proj    [E, F, D]
    down_proj  [E, D, F]
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def capacity(moe_experts: int, moe_top_k: int, capacity_factor: float, n_tokens: int) -> int:
    """Static per-expert slot count. A token selects top_k DISTINCT experts,
    so one expert can receive at most n_tokens slots — min() caps there,
    making large capacity_factor an exact (dropless) mode."""
    c = math.ceil(moe_top_k * n_tokens * capacity_factor / moe_experts)
    return max(1, min(n_tokens, c))


def _expert_einsum(eq: str, x: jnp.ndarray, w) -> jnp.ndarray:
    """Expert-stacked einsum accepting plain, weight-only-int8, or
    streamed-LoRA weights.

    Quantized form (ops.linear scheme): w = {"q": int8 [E, O, I], "s": f32
    [E, O]} — matmul on the raw int8 codes (cast to the activation dtype,
    same numerics as matmul_t's turbo path), per-output-channel scales
    applied to the [E, C, O] result. ops.linear.quantize_params already
    matches the expert leaves by name (gate/up/down_proj), so an MoE trunk
    quantizes with the same call as a dense one.

    LoRA form (training.lora.attach_lora): w = {"base", "A" [E, r, I],
    "B" [E, O, r]} — base(x) + (x A^T) B^T per use, no merged weight
    materialized (the streamed-LoRA contract; scale pre-folded into B).
    Both einsum equations here contract the last dims ('ecx,eox->eco'),
    so the low-rank path is shape-generic."""
    from ..ops.linear import is_lora_wrapped

    if is_lora_wrapped(w):
        y = _expert_einsum(eq, x, w["base"])
        t = jnp.einsum("ecx,erx->ecr", x, w["A"].astype(x.dtype))
        return y + jnp.einsum("ecr,eor->eco", t, w["B"].astype(x.dtype))
    if isinstance(w, dict) and "q" in w:
        acc = jnp.einsum(eq, x, w["q"].astype(x.dtype),
                         preferred_element_type=jnp.float32)
        return (acc * w["s"][:, None, :]).astype(x.dtype)
    return jnp.einsum(eq, x, w)


def moe_ffn(
    lp: Params,
    h: jnp.ndarray,            # [B, T, D]
    *,
    top_k: int,
    capacity: int,
    token_valid: jnp.ndarray = None,   # [B, T] 0/1; None = all valid
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sparse-MoE SwiGLU FFN. Returns ([B, T, D] output, scalar fp32 aux).

    aux is the Switch/Mixtral load-balancing loss E * sum_e f_e * P_e with
    f_e the fraction of routing slots sent to expert e and P_e the mean
    router probability — 1.0 at perfect balance.

    `token_valid` masks PAD positions out of routing entirely: they claim no
    capacity slots (so a row's padding can't displace another row's real
    tokens) and are excluded from the aux statistics (HF's
    load_balancing_loss_func applies the same attention_mask correction).
    """
    B, T, D = h.shape
    S = B * T
    E = lp["router"].shape[0]
    x = h.reshape(S, D)
    valid = None if token_valid is None else token_valid.reshape(S).astype(jnp.float32)

    # routing decisions in fp32 (tiny [S, E] matmul; argmax is precision-sensitive)
    logits = jnp.einsum(
        "sd,ed->se", x.astype(jnp.float32), lp["router"].astype(jnp.float32)
    )
    probs = jax.nn.softmax(logits, axis=-1)  # [S, E] fp32

    # iterative top-k: static K argmax rounds (no sort network over E)
    masked = probs
    idxs, gates = [], []
    for _ in range(top_k):
        idx = jnp.argmax(masked, axis=-1)  # [S]
        gates.append(jnp.take_along_axis(masked, idx[:, None], axis=-1)[:, 0])
        idxs.append(idx)
        masked = masked * (1.0 - jax.nn.one_hot(idx, E, dtype=probs.dtype))
    idx_k = jnp.stack(idxs)    # [K, S]
    gate_k = jnp.stack(gates)  # [K, S] fp32
    # Mixtral renorm: selected probabilities sum to 1 per token
    gate_k = gate_k / jnp.maximum(gate_k.sum(0, keepdims=True), 1e-9)

    # capacity slots: arrival order = all rank-0 choices first, then rank-1
    # (Switch convention — primary routes win slots over secondary ones)
    sel = jax.nn.one_hot(idx_k, E, dtype=jnp.int32)            # [K, S, E]
    if valid is not None:
        sel = sel * valid.astype(jnp.int32)[None, :, None]     # pads claim nothing
    flat = sel.reshape(top_k * S, E)
    slot = (jnp.cumsum(flat, axis=0) - flat).reshape(top_k, S, E)
    slot_k = (slot * sel).sum(-1)                               # [K, S]
    keep = slot_k < capacity                                    # [K, S]

    cdtype = h.dtype
    de = sel.astype(cdtype) * keep.astype(cdtype)[..., None]    # [K, S, E]
    slot_oh = jax.nn.one_hot(slot_k, capacity, dtype=cdtype)    # [K, S, C]
    dispatch = jnp.einsum("kse,ksc->sec", de, slot_oh)          # [S, E, C]
    combine = jnp.einsum(
        "kse,ksc->sec", de * gate_k.astype(cdtype)[..., None], slot_oh
    )

    xin = jnp.einsum("sec,sd->ecd", dispatch, x)                # [E, C, D]
    g = _expert_einsum("ecd,efd->ecf", xin, lp["gate_proj"])
    u = _expert_einsum("ecd,efd->ecf", xin, lp["up_proj"])
    act = jax.nn.silu(g.astype(jnp.float32)).astype(cdtype) * u  # fp32 silu, as _mlp
    y_e = _expert_einsum("ecf,edf->ecd", act, lp["down_proj"])  # [E, C, D]
    y = jnp.einsum("sec,ecd->sd", combine, y_e)                 # [S, D]

    # load-balance aux: fraction of VALID routing slots per expert x mean
    # router prob over valid tokens
    if valid is None:
        n_tok = jnp.float32(S)
        f = sel.astype(jnp.float32).sum((0, 1)) / (S * top_k)   # [E]
        p = probs.mean(0)                                       # [E]
    else:
        n_tok = jnp.maximum(valid.sum(), 1.0)
        f = sel.astype(jnp.float32).sum((0, 1)) / (n_tok * top_k)
        p = (probs * valid[:, None]).sum(0) / n_tok
    aux = E * jnp.sum(f * p)
    return y.reshape(B, T, D), aux


def init_layer_params(key: jax.Array, n_layers: int, n_experts: int,
                      hidden: int, ffn: int, dtype) -> Params:
    """Layer-and-expert-stacked random init matching llama.init_params' 0.02 normal."""
    ks = jax.random.split(key, 4)

    def nrm(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(dtype)

    L, E, D, F = n_layers, n_experts, hidden, ffn
    return {
        "router": nrm(ks[0], (L, E, D)),
        "gate_proj": nrm(ks[1], (L, E, F, D)),
        "up_proj": nrm(ks[2], (L, E, F, D)),
        "down_proj": nrm(ks[3], (L, E, D, F)),
    }
