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

DROPLESS costs: the one-hot dispatch/combine tensors are [S, E, C], so the
exact mode (C = S) is quadratic in token count — ~835 MB of [S, E, S] at
Mixtral serving shapes (S = 24x301). `moe_ffn_sorted` is the linear-cost
dropless formulation (MegaBlocks-style): sort the K*S (token, expert)
assignments by expert, run ONE grouped matmul per projection with
`lax.ragged_dot_general` (Mosaic grouped-matmul on TPU; GSPMD partitions
it under ep-sharded expert stacks), and scatter-add the gated outputs back.
Identical math to `moe_ffn` at capacity >= S — it cannot express drops, so
capped-capacity training configs stay on the einsum path
(`LlamaConfig.moe_dispatch` resolves this; "auto" = sorted iff dropless).

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
    from ..ops.linear import dequantize_weight, is_grouped_int4, is_lora_wrapped

    if is_lora_wrapped(w):
        y = _expert_einsum(eq, x, w["base"])
        t = jnp.einsum("ecx,erx->ecr", x, w["A"].astype(x.dtype))
        return y + jnp.einsum("ecr,eor->eco", t, w["B"].astype(x.dtype))
    if isinstance(w, dict) and "q" in w:
        if is_grouped_int4(w):
            # grouped-int4 experts ([E, G, O, gsz] codes): dequantize per
            # use — a footprint form (the per-group batched-dot w4a8
            # formulation does not map onto the expert einsums; matching
            # their int8 throughput here would need a grouped expert kernel)
            return jnp.einsum(eq, x, dequantize_weight(w, x.dtype))
        acc = jnp.einsum(eq, x, w["q"].astype(x.dtype),
                         preferred_element_type=jnp.float32)
        return (acc * w["s"][:, None, :]).astype(x.dtype)
    return jnp.einsum(eq, x, w)


def _route(lp: Params, x: jnp.ndarray, top_k: int):
    """Router forward shared by both dispatch formulations.
    x [S, D] -> (idx_k [K, S] int, gate_k [K, S] fp32 renormed, probs [S, E])."""
    E = lp["router"].shape[0]
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
    return idx_k, gate_k, probs, logits


def _aux_losses(idx_k, probs, logits, valid, E: int, top_k: int) -> jnp.ndarray:
    """Router auxiliary losses, fp32 [2]:

    [0] Switch/Mixtral load-balance loss E * sum_e f_e * P_e — f_e the
        fraction of VALID routing slots sent to expert e, P_e the mean
        router probability over valid tokens; 1.0 at perfect balance.
    [1] ST-MoE router z-loss mean((logsumexp_e logits)^2) — penalizes
        drifting router logit magnitudes (the fp32-softmax stabilizer;
        log(E)^2 at zero logits).

    `valid` [S] 0/1 fp32 or None; both statistics exclude PAD tokens (HF's
    load_balancing_loss_func applies the same attention_mask correction)."""
    S = probs.shape[0]
    z = jax.scipy.special.logsumexp(logits, axis=-1) ** 2  # [S] fp32
    if valid is None:
        n_tok = jnp.float32(S)
        f = jnp.bincount(idx_k.reshape(-1), length=E).astype(jnp.float32) / (n_tok * top_k)
        p = probs.mean(0)
        z_loss = z.mean()
    else:
        n_tok = jnp.maximum(valid.sum(), 1.0)
        f = jnp.bincount(idx_k.reshape(-1),
                         weights=jnp.tile(valid, (top_k,)), length=E) / (n_tok * top_k)
        p = (probs * valid[:, None]).sum(0) / n_tok
        z_loss = (z * valid).sum() / n_tok
    return jnp.stack([E * jnp.sum(f * p), z_loss])


def moe_ffn(
    lp: Params,
    h: jnp.ndarray,            # [B, T, D]
    *,
    top_k: int,
    capacity: int,
    token_valid: jnp.ndarray = None,   # [B, T] 0/1; None = all valid
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sparse-MoE SwiGLU FFN. Returns ([B, T, D] output, fp32 [2] aux =
    [load-balance loss, router z-loss] — see _aux_losses).

    `token_valid` masks PAD positions out of routing entirely: they claim no
    capacity slots (so a row's padding can't displace another row's real
    tokens) and are excluded from the aux statistics.
    """
    B, T, D = h.shape
    S = B * T
    E = lp["router"].shape[0]
    x = h.reshape(S, D)
    valid = None if token_valid is None else token_valid.reshape(S).astype(jnp.float32)

    idx_k, gate_k, probs, logits = _route(lp, x, top_k)

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

    aux = _aux_losses(idx_k, probs, logits, valid, E, top_k)
    return y.reshape(B, T, D), aux


def _ragged_dn() -> "jax.lax.RaggedDotDimensionNumbers":
    """Grouped-matmul dims for [M, I] tokens x [E, O, I] expert stacks:
    contract I, group on E, lhs rows ragged-grouped by group_sizes."""
    return jax.lax.RaggedDotDimensionNumbers(
        dot_dimension_numbers=(((1,), (2,)), ((), ())),
        lhs_ragged_dimensions=(0,), rhs_group_dimensions=(0,))


def _expert_ragged(x: jnp.ndarray, w, group_sizes: jnp.ndarray,
                   e_row: jnp.ndarray) -> jnp.ndarray:
    """Grouped matmul of expert-sorted rows x [M, I] against stacked expert
    weights (same three weight forms as _expert_einsum). `e_row` [M] is each
    row's expert id — only the quantized form needs it (per-expert
    out-channel scales; XLA fuses the row gather into the multiply)."""
    from ..ops.linear import dequantize_weight, is_grouped_int4, is_lora_wrapped

    dn = _ragged_dn()
    if is_lora_wrapped(w):
        y = _expert_ragged(x, w["base"], group_sizes, e_row)
        t = jax.lax.ragged_dot_general(x, w["A"].astype(x.dtype), group_sizes, dn)
        return y + jax.lax.ragged_dot_general(t, w["B"].astype(x.dtype), group_sizes, dn)
    if is_grouped_int4(w):
        # footprint form: dequantize grouped-int4 experts per use (see
        # _expert_einsum)
        return jax.lax.ragged_dot_general(
            x, dequantize_weight(w, x.dtype), group_sizes, dn)
    if isinstance(w, dict) and "q" in w:
        acc = jax.lax.ragged_dot_general(x, w["q"].astype(x.dtype), group_sizes, dn,
                                         preferred_element_type=jnp.float32)
        return (acc * w["s"][e_row]).astype(x.dtype)
    return jax.lax.ragged_dot_general(x, w.astype(x.dtype), group_sizes, dn)


def moe_ffn_sorted(
    lp: Params,
    h: jnp.ndarray,            # [B, T, D]
    *,
    top_k: int,
    token_valid: jnp.ndarray = None,   # [B, T] 0/1; None = all valid
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """DROPLESS sparse-MoE SwiGLU FFN, linear in token count. Returns
    ([B, T, D] output, fp32 [2] aux) like moe_ffn.

    Same routing and math as moe_ffn at capacity >= S (per-token results
    equal up to matmul reduction order), but instead of [S, E, C] one-hot
    dispatch/combine einsums it sorts the K*S (token, expert) assignments by
    expert (stable k-major order — the same rank-0-first arrival order as
    the einsum path) and runs each projection as ONE lax.ragged_dot_general
    grouped matmul over the expert-contiguous rows. Cost: O(K*S) gather/
    scatter + exactly the K*S*3*D*F expert FLOPs — no quadratic dispatch
    tensor, no drops, no capacity knob. PAD tokens keep their matmul rows
    (static shapes) but their gates are zeroed and aux excludes them.
    """
    B, T, D = h.shape
    S = B * T
    E = lp["router"].shape[0]
    cdtype = h.dtype
    x = h.reshape(S, D)
    valid = None if token_valid is None else token_valid.reshape(S).astype(jnp.float32)

    idx_k, gate_k, probs, logits = _route(lp, x, top_k)
    if valid is not None:
        gate_k = gate_k * valid[None, :]   # pads compute but contribute 0

    e_flat = idx_k.reshape(-1)                              # [K*S], k-major
    t_flat = jnp.tile(jnp.arange(S, dtype=jnp.int32), (top_k,))
    order = jnp.argsort(e_flat, stable=True)                # expert-contiguous
    tok = t_flat[order]                                     # [K*S]
    gates = gate_k.reshape(-1)[order]
    e_row = e_flat[order]
    group_sizes = jnp.bincount(e_flat, length=E).astype(jnp.int32)

    xs = x[tok]                                             # [K*S, D]
    g = _expert_ragged(xs, lp["gate_proj"], group_sizes, e_row)
    u = _expert_ragged(xs, lp["up_proj"], group_sizes, e_row)
    act = jax.nn.silu(g.astype(jnp.float32)).astype(cdtype) * u  # fp32 silu, as _mlp
    y_s = _expert_ragged(act, lp["down_proj"], group_sizes, e_row)  # [K*S, D]

    y = jnp.zeros((S, D), cdtype).at[tok].add(y_s * gates.astype(cdtype)[:, None])
    aux = _aux_losses(idx_k, probs, logits, valid, E, top_k)
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
