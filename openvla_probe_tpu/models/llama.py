"""Llama-2 decoder, TPU-first: layer-stacked params + lax.scan, fused KV-cache decode.

Functional re-design of the reference's LLM backbone (HF `LlamaForCausalLM`
wrapped at prismatic/models/backbones/llm/base_llm.py:101-223). Weight-layout
and math conventions follow the HF checkpoint format so OpenVLA safetensors load
directly:

  * RMSNorm in fp32 (variance over the last axis, then scale), output cast back.
  * Rotary embeddings in the HF "rotate_half" convention (cos/sin tables over
    positions, full head-dim duplication) — NOT Meta's interleaved complex form.
  * Attention softmax in fp32; scores scaled by 1/sqrt(head_dim).
  * SwiGLU MLP: down(silu(gate(x)) * up(x)).

TPU-first choices:
  * All 32 layers' weights are stacked on a leading axis and the block is a
    single `lax.scan` — one trace/compile of one layer instead of 32 inlined
    copies, and the natural layout for pipeline/fsdp sharding of the layer axis.
  * The KV cache is one [n_layers, B, S_max, n_kv_heads, head_dim] array per
    k/v, updated with dynamic_update_slice inside the scan — greedy decode of N
    tokens is itself a scan, so the whole predict_action path is two nested
    scans in one jit.
  * Hidden-state taps: prefill optionally emits mean-pooled per-layer hidden
    states (33 x D, computed in the scan) for the probe workflow — replacing
    the reference's second full forward (experiments/robot/openvla_utils.py:188-203).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.linear import matmul_t
from ..overwatch import initialize_overwatch
from . import moe

overwatch = initialize_overwatch(__name__)

Params = Dict[str, Any]

_RMSQ_STANDDOWN_WARNED = False


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32064          # 32000 + pad_to_multiple_of=64 round-up (OpenVLA)
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    max_position_embeddings: int = 2048
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    dtype: Any = jnp.bfloat16
    # fp32 is the bit-parity mode (HF softmax convention); bf16 halves the
    # attention-score HBM traffic (~775 MB/layer at B=16 prefill) for the
    # turbo serving mode
    attn_scores_dtype: Any = jnp.float32
    # RoPE rotation compute dtype. fp32 is this repo's bit-parity default;
    # bf16 (turbo) halves the rotation's HBM traffic AND removes the
    # f32 layout copies XLA inserts around it (profiled ~54 ms/call at B=24
    # prefill). Note HF's own LlamaRotaryEmbedding casts cos/sin to the
    # activation dtype and rotates in bf16, so bf16 here tracks the HF twin
    # more closely — it stays opt-in only to keep round-1 parity artifacts
    # (PARITY_r02.md) comparable.
    rope_dtype: Any = jnp.float32
    # rematerialize each decoder block in backward (the reference's
    # non-reentrant activation checkpointing on decoder layers, fsdp.py:170-183)
    remat: bool = False
    # sparse-MoE FFN (Mixtral-style; models/moe.py). 0 = dense SwiGLU.
    # Experts shard over an `ep` mesh axis (parallel/sharding.py); no
    # reference counterpart (its LLM backbones are all dense).
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 2.0     # >= E/top_k => exact (dropless)
    moe_aux_coef: float = 0.01           # load-balance loss weight (training)
    moe_z_coef: float = 1e-3             # ST-MoE router z-loss weight (training)
    # dispatch formulation: "einsum" (GShard one-hot; honors capacity drops,
    # quadratic in tokens at dropless capacity), "sorted" (ragged_dot grouped
    # matmul; linear, dropless-only), "auto" = sorted iff the resolved
    # capacity is dropless for this token count, einsum otherwise.
    moe_dispatch: str = "auto"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @staticmethod
    def llama2_7b(**kw) -> "LlamaConfig":
        return LlamaConfig(**kw)

    @staticmethod
    def llama2_13b(**kw) -> "LlamaConfig":
        """Llama-2-13B dims (reference prismatic/models/backbones/llm/llama2.py:24-51;
        catalog llama2-13b-*): 40 layers x 5120, 40 heads, ffn 13824."""
        d = dict(hidden_size=5120, intermediate_size=13824,
                 num_hidden_layers=40, num_attention_heads=40,
                 num_key_value_heads=40)
        d.update(kw)
        return LlamaConfig(**d)

    @staticmethod
    def tiny(**kw) -> "LlamaConfig":
        """Test-scale config (keeps ratios; compiles in seconds)."""
        d = dict(vocab_size=512, hidden_size=64, intermediate_size=128,
                 num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=4,
                 max_position_embeddings=256, dtype=jnp.float32)
        d.update(kw)
        return LlamaConfig(**d)


class KVCache(NamedTuple):
    """Per-model KV cache: [n_layers, B, S_max, n_kv_heads, head_dim] each."""

    k: jnp.ndarray
    v: jnp.ndarray

    @staticmethod
    def zeros(cfg: LlamaConfig, batch: int, max_len: int, dtype=None) -> "KVCache":
        shape = (cfg.num_hidden_layers, batch, max_len, cfg.num_key_value_heads, cfg.head_dim)
        dtype = dtype or cfg.dtype
        return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

    @staticmethod
    def zeros_flat(cfg: LlamaConfig, batch: int, max_len: int, dtype=None) -> "KVCache":
        """Flat [L, B, S, Hkv*Dh] layout (see _layer_forward: denies XLA the
        divergent prefill/decode cache layouts that cost two full-cache
        copies). `max_len` should be a sublane multiple (8) so the per-layer
        head view is a free bitcast."""
        shape = (cfg.num_hidden_layers, batch, max_len,
                 cfg.num_key_value_heads * cfg.head_dim)
        dtype = dtype or cfg.dtype
        return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


# --- building blocks --------------------------------------------------------

def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """HF-convention RMSNorm: fp32 variance + scale, cast back to input dtype."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return (xf.astype(dt) * weight.astype(dt)).astype(dt)


def rope_tables(cfg: LlamaConfig, positions: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin [..., T, head_dim] in fp32, HF rotate_half convention."""
    half = cfg.head_dim // 2
    inv_freq = 1.0 / (cfg.rope_theta ** (jnp.arange(0, half, dtype=jnp.float32) * 2.0 / cfg.head_dim))
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # [..., T, half]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(
    q: jnp.ndarray, k: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray,
    compute_dtype: Any = jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """q/k: [B, T, H, Dh]; cos/sin: [B, T, Dh] (fp32 tables).
    Rotation in `compute_dtype` (fp32 = bit-parity default; bf16 = turbo,
    which is also HF's own convention — cos/sin cast to the activation dtype)."""
    cos = cos.astype(compute_dtype)[:, :, None, :]
    sin = sin.astype(compute_dtype)[:, :, None, :]
    qf, kf = q.astype(compute_dtype), k.astype(compute_dtype)
    q_out = qf * cos + _rotate_half(qf) * sin
    k_out = kf * cos + _rotate_half(kf) * sin
    return q_out.astype(q.dtype), k_out.astype(k.dtype)


def _repeat_kv(x: jnp.ndarray, n_rep: int) -> jnp.ndarray:
    if n_rep == 1:
        return x
    return jnp.repeat(x, n_rep, axis=2)


def attention(
    q: jnp.ndarray,         # [B, Tq, H, Dh]
    k: jnp.ndarray,         # [B, Tk, Hkv, Dh]
    v: jnp.ndarray,         # [B, Tk, Hkv, Dh]
    mask: jnp.ndarray,      # [B, 1, Tq, Tk] additive fp32 (0 / -inf-ish)
    scores_dtype=jnp.float32,
    kv_valid: Optional[jnp.ndarray] = None,
    # kv_valid [B, Tk]: when present (uncached paths only, offset 0), the
    # Pallas flash path computes causal+padding masking IN-KERNEL from this
    # validity vector — no [B, H, Tq, Tk] additive mask materializes in HBM.
) -> jnp.ndarray:
    """Masked softmax(QK^T)V. fp32 scores = parity mode; bf16 = turbo.
    XLA path by default; with OVLA_PALLAS=1 prefill-sized calls route to the
    Pallas flash kernel (ops/attention.py) — scores never touch HBM."""
    n_rep = q.shape[2] // k.shape[2]
    k = _repeat_kv(k, n_rep)
    v = _repeat_kv(v, n_rep)
    import os

    # OVLA_PALLAS_INTERPRET=1: run the kernel wiring in interpret mode on CPU
    # (same escape hatch as models/vit.py — exercises gate + call-site shapes
    # without a chip)
    interp = os.environ.get("OVLA_PALLAS_INTERPRET", "0") == "1"
    if (
        os.environ.get("OVLA_PALLAS", "0") == "1"
        and os.environ.get("OVLA_PALLAS_ATTN", "1") == "1"
        and (jax.default_backend() == "tpu" or interp)
        # prefill-sized only: decode (Tq=1) stays on XLA, and so do the SHORT
        # speculative verify-prefills (Tq ~ 2A+1) — the verify pass must share
        # the sequential decode path's reduction-order dust or hairline-margin
        # drafts get rejected (measured: bs=1 acceptance 6 -> 1 when the
        # verify prefill alone switched kernels)
        and q.shape[1] >= 64
        and kv_valid is not None
    ):
        from ..ops.attention import flash_attention

        return flash_attention(q, k, v, kv_valid, offset=0, interpret=interp)
    scale = 1.0 / np.sqrt(q.shape[-1])
    scores = jnp.einsum("bthd,bshd->bhts", q, k, preferred_element_type=scores_dtype)
    scores = (scores * scale + mask.astype(scores_dtype)).astype(scores_dtype)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bshd->bthd", probs, v, preferred_element_type=jnp.float32).astype(q.dtype)


NEG_INF = -2.3819763e38  # matches XLA's finite mask value; avoids nan from full -inf rows


def make_causal_mask(attn_mask: jnp.ndarray, tq: int, tk: int, offset: int = 0) -> jnp.ndarray:
    """[B, Tk] padding mask (1 = attend) -> [B, 1, Tq, Tk] additive fp32 mask.
    `offset` = absolute position of query 0 (for cached decode)."""
    qi = jnp.arange(tq)[:, None] + offset
    ki = jnp.arange(tk)[None, :]
    causal = ki <= qi  # [Tq, Tk]
    ok = causal[None, :, :] & (attn_mask[:, None, :] > 0)
    return jnp.where(ok, 0.0, NEG_INF)[:, None, :, :].astype(jnp.float32)


# --- layer + model ----------------------------------------------------------

def _norm_maybe_quant(cfg: LlamaConfig, x: jnp.ndarray, norm_w: jnp.ndarray,
                      proj_leaves) -> Any:
    """RMSNorm — fused with the int8 activation quantize when EVERY consuming
    projection takes the w8a8 int8 dot and the fused kernel is enabled
    (OVLA_PALLAS=1 + OVLA_PALLAS_RMSQ=1; VERDICT r4 #8 prefill lever).

    Returns either the normed bf16 tensor (unfused) or a PrequantActivation
    (q8 + row scales) that matmul_t consumes directly. Per-leaf gating over
    ALL consumers (q/k/v or gate/up — a custom-targeted LoRA can wrap a
    subset) keeps every other path untouched: LoRA/multi-LoRA wrappers,
    bf16 leaves, and the mix tier's int4-copy regime (M <= group_m_max
    reads the int4 copy) all take the plain norm. The Pallas wi8 matmul
    (OVLA_PALLAS_MATMUL, on by default under the master gate) serves int8
    leaves with bf16 activations — a DIFFERENT numeric class than w8a8 —
    so the fusion also stands down whenever that kernel would run."""
    from ..ops import rmsnorm_quant as _rq
    from ..ops.linear import (PrequantActivation, _use_pallas, _use_w8a8,
                              _w4a8_group_m_max)

    def w8a8_leaf(leaf) -> bool:
        return (isinstance(leaf, dict)
                and "q" in leaf and "base" not in leaf
                and leaf["q"].dtype == jnp.int8
                and not ("q4" in leaf and M <= _w4a8_group_m_max()))

    M = x.shape[0] * x.shape[1]
    leaves = proj_leaves if isinstance(proj_leaves, (tuple, list)) else (proj_leaves,)
    leaves = [l for l in leaves if l is not None]
    if _rq.use_fused_rmsq() and _use_pallas():
        # one-time loud stand-down (ADVICE r4): OVLA_PALLAS=1 enables the wi8
        # matmul by default, which serves int8 leaves with bf16 activations —
        # RMSQ's int8 prequant would be a different numeric class, so it
        # yields. Without this warning the A/B this kernel exists for
        # silently measures nothing (set OVLA_PALLAS_MATMUL=0 to run RMSQ).
        global _RMSQ_STANDDOWN_WARNED
        if not _RMSQ_STANDDOWN_WARNED:
            _RMSQ_STANDDOWN_WARNED = True
            overwatch.warning(
                "OVLA_PALLAS_RMSQ requested but standing down: the Pallas wi8 "
                "matmul gate is active (set OVLA_PALLAS_MATMUL=0 to A/B RMSQ)")
    if (_rq.use_fused_rmsq() and _use_w8a8() and not _use_pallas()
            and M > 8 and leaves and all(w8a8_leaf(l) for l in leaves)):
        q8, sx = _rq.rms_norm_quant(
            x, norm_w, cfg.rms_norm_eps,
            interpret=jax.default_backend() != "tpu")
        return PrequantActivation(q8, sx, x.dtype)
    return rms_norm(x, norm_w, cfg.rms_norm_eps)


def _qkv(cfg: LlamaConfig, lp: Params, h: jnp.ndarray, B: int, T: int):
    """q/k/v projections; uses the fused qkv stack when present
    (fuse_serving_params)."""
    H, Hkv, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    if "qkv_proj" in lp:
        qkv = matmul_t(h, lp["qkv_proj"])
        q, k, v = jnp.split(qkv, [H * Dh, (H + Hkv) * Dh], axis=-1)
        return (q.reshape(B, T, H, Dh), k.reshape(B, T, Hkv, Dh),
                v.reshape(B, T, Hkv, Dh))
    # same-input targets: concat-fused multi-LoRA leaves group their rank
    # projections into ONE batched dot (ops.linear.matmul_t_grouped — the
    # VERDICT r4 #3 op-count lever); everything else is per-leaf matmul_t
    from ..ops.linear import matmul_t_grouped

    q, k, v = matmul_t_grouped(h, (lp["q_proj"], lp["k_proj"], lp["v_proj"]))
    return (q.reshape(B, T, H, Dh), k.reshape(B, T, Hkv, Dh),
            v.reshape(B, T, Hkv, Dh))


def _moe_mlp(cfg: LlamaConfig, lp: Params, h: jnp.ndarray, token_valid=None):
    """Sparse-MoE FFN (models/moe.py) -> (y, aux). Capacity is static per
    token count, so prefill and decode each compile one dispatch shape.
    `token_valid` [B, T] keeps PAD positions out of routing/aux.

    Dispatch selection (cfg.moe_dispatch): the sorted ragged-matmul path is
    dropless-only, so "auto" uses it exactly when the resolved capacity
    would be dropless anyway (same math, linear instead of quadratic cost);
    capped capacities keep the einsum path, which can express drops."""
    S = h.shape[0] * h.shape[1]
    cap = moe.capacity(cfg.moe_experts, cfg.moe_top_k,
                       cfg.moe_capacity_factor, S)
    mode = cfg.moe_dispatch
    if mode == "auto":
        mode = "sorted" if cap >= S else "einsum"
    if mode == "sorted":
        if cap < S:
            raise ValueError(
                f"moe_dispatch='sorted' is dropless-only but capacity {cap} < "
                f"{S} tokens would drop; use 'einsum' or 'auto', or raise "
                "moe_capacity_factor")
        return moe.moe_ffn_sorted(lp, h, top_k=cfg.moe_top_k,
                                  token_valid=token_valid)
    return moe.moe_ffn(lp, h, top_k=cfg.moe_top_k, capacity=cap,
                       token_valid=token_valid)


def _mlp(cfg: LlamaConfig, lp: Params, h: jnp.ndarray) -> jnp.ndarray:
    """SwiGLU; uses the fused gate_up stack when present. MoE layers route
    through moe_ffn (aux dropped — serving/eval paths don't train the router)."""
    if "router" in lp:
        return _moe_mlp(cfg, lp, h)[0]
    if "gate_up_proj" in lp:
        gu = matmul_t(h, lp["gate_up_proj"])
        g, up = jnp.split(gu, 2, axis=-1)
        gate = jax.nn.silu(g.astype(jnp.float32)).astype(h.dtype)
    else:
        from ..ops.linear import matmul_t_grouped

        g_raw, up = matmul_t_grouped(h, (lp["gate_proj"], lp["up_proj"]))
        gate = jax.nn.silu(g_raw.astype(jnp.float32)).astype(h.dtype)
    return matmul_t(gate * up, lp["down_proj"])


def _layer_forward(
    cfg: LlamaConfig,
    lp: Params,               # single-layer params (leading L axis already indexed away)
    x: jnp.ndarray,           # [B, T, D]
    mask: jnp.ndarray,        # [B, 1, T, Tk]
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    cache_ref: Optional[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]] = None,
    # cache_ref = (k_all [L,B,S,Hkv,Dh], v_all, layer_idx, cache_index):
    # the FULL stacked cache rides the scan carry; only the new tokens are
    # written (a [1,B,T,Hkv,Dh] dynamic_update_slice XLA keeps in place) —
    # stacking per-layer cache outputs through scan ys re-materializes the
    # whole multi-GB cache every decode step.
    kv_valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Optional[Tuple[jnp.ndarray, jnp.ndarray]], jnp.ndarray]:
    B, T, D = x.shape
    H, Hkv, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    h = _norm_maybe_quant(
        cfg, x, lp["input_layernorm"],
        ((lp["qkv_proj"],) if "qkv_proj" in lp
         else (lp.get("q_proj"), lp.get("k_proj"), lp.get("v_proj"))))
    q, k, v = _qkv(cfg, lp, h, B, T)
    q, k = apply_rope(q, k, cos, sin, cfg.rope_dtype)

    if cache_ref is not None:
        k_all, v_all, li, cache_index = cache_ref
        if k_all.ndim == 4:
            # FLAT cache [L, B, S, Hkv*Dh]: XLA assigns the 5D cache
            # different layouts in the prefill and decode scans and copies
            # the full 3.7 GB cache twice between them (profiled 11.3 ms at
            # B=24). The flat form leaves no transposed-layout choice; with
            # S a sublane multiple the 4D head view below is a free bitcast.
            S = k_all.shape[2]
            kf = k.reshape(B, T, Hkv * Dh)
            vf = v.reshape(B, T, Hkv * Dh)
            k_all = jax.lax.dynamic_update_slice(k_all, kf[None], (li, 0, cache_index, 0))
            v_all = jax.lax.dynamic_update_slice(v_all, vf[None], (li, 0, cache_index, 0))
            k = jax.lax.dynamic_index_in_dim(k_all, li, 0, keepdims=False).reshape(B, S, Hkv, Dh)
            v = jax.lax.dynamic_index_in_dim(v_all, li, 0, keepdims=False).reshape(B, S, Hkv, Dh)
        else:
            k_all = jax.lax.dynamic_update_slice(k_all, k[None], (li, 0, cache_index, 0, 0))
            v_all = jax.lax.dynamic_update_slice(v_all, v[None], (li, 0, cache_index, 0, 0))
            k = jax.lax.dynamic_index_in_dim(k_all, li, 0, keepdims=False)
            v = jax.lax.dynamic_index_in_dim(v_all, li, 0, keepdims=False)
        new_cache = (k_all, v_all)
    else:
        # no cache: hand back this block's (post-RoPE) K/V so `prefill` can
        # emit them through scan ys for the split-attention decode
        new_cache = (k, v)

    attn = attention(
        q, k, v, mask, scores_dtype=cfg.attn_scores_dtype, kv_valid=kv_valid
    ).reshape(B, T, D)
    x = x + matmul_t(attn, lp["o_proj"])

    if "router" in lp:
        # kv_valid's first T columns are exactly this block's per-token
        # validity (uncached: attn_mask[:, :T]; cached zero-offset prefill:
        # the first T cache slots; decode passes None — a decoded token is
        # always real). The router consumes the float normed activation, so
        # the MoE site never takes the fused norm+quantize.
        h = rms_norm(x, lp["post_attention_layernorm"], cfg.rms_norm_eps)
        tok_valid = None if kv_valid is None else kv_valid[:, :T]
        y, moe_aux = _moe_mlp(cfg, lp, h, token_valid=tok_valid)
        x = x + y
    else:
        h = _norm_maybe_quant(
            cfg, x, lp["post_attention_layernorm"],
            ((lp["gate_up_proj"],) if "gate_up_proj" in lp
             else (lp.get("gate_proj"), lp.get("up_proj"))))
        x = x + _mlp(cfg, lp, h)
        moe_aux = jnp.zeros((2,), jnp.float32)
    return x, new_cache, moe_aux


def fuse_serving_params(llm_params: Params) -> Params:
    """Serving-side weight fusion: q/k/v -> one [L, (H+2Hkv)Dh, D] stack and
    gate/up -> one [L, 2F, D] stack, so each decode layer runs 4 projections
    instead of 7 (decode is HBM/dispatch bound — same bytes, fewer streams).
    Works for plain, quantized ({q,s} — per-channel int8 AND group-major
    int4), and dual-precision mixed leaves: every copy concatenates along
    ITS output-channel axis (groups cover the shared in-dim, so the group
    structure is untouched), so numerics are IDENTICAL.
    Training paths keep the unfused layout (HF checkpoint parity)."""
    from ..ops.linear import is_grouped_int4

    layers = dict(llm_params["layers"])

    def cat(names, out):
        ws = [layers.pop(n) for n in names]
        if isinstance(ws[0], dict):  # quantized — concat each copy on its O axis
            assert all(set(w) == set(ws[0]) for w in ws), \
                f"fusing {names}: mismatched quant layouts {[set(w) for w in ws]}"
            # per-key output-channel axis: q [L,O,I] / grouped q|q4
            # [L,G,O,gsz] / grouped s|s4 [L,O,G] -> -2; per-channel s
            # [L,O] -> -1 (grouped-only leaves carry the GROUPED s)
            axis = {"s": -2 if is_grouped_int4(ws[0]) else -1}
            layers[out] = {
                k: jnp.concatenate([w[k] for w in ws], axis=axis.get(k, -2))
                for k in ws[0]
            }
        else:
            layers[out] = jnp.concatenate(ws, axis=1)

    cat(("q_proj", "k_proj", "v_proj"), "qkv_proj")
    if "router" not in layers:
        # MoE expert stacks are [L, E, F, D] — axis 1 is the expert dim, so
        # the gate/up fusion doesn't apply; experts stay unfused.
        cat(("gate_proj", "up_proj"), "gate_up_proj")
    return {**llm_params, "layers": layers}


def forward(
    params: Params,
    cfg: LlamaConfig,
    inputs_embeds: jnp.ndarray,             # [B, T, D]
    attn_mask: jnp.ndarray,                 # [B, Tk] (Tk == T without cache, S_max with)
    positions: jnp.ndarray,                 # [B, T] absolute positions
    cache: Optional[KVCache] = None,
    cache_index: Optional[jnp.ndarray] = None,
    collect_hidden_states: bool = False,
    pool_mask: Optional[jnp.ndarray] = None,   # [B, T] override for the tap pooling
    compute_logits: bool = True,
    static_zero_offset: bool = False,   # caller KNOWS cache_index == 0 (prefill)
) -> Dict[str, Any]:
    """Run the decoder stack via lax.scan over the stacked layer params.

    Returns dict with: logits [B, T, V]; cache (updated KVCache if given);
    hidden_pooled [B, n_layers+1, D] (masked mean over T of each layer's
    output, embeddings first) when collect_hidden_states — the probe tap.
    """
    B, T, D = inputs_embeds.shape
    x = inputs_embeds
    tk = attn_mask.shape[1]
    offset = 0 if cache is None else cache_index
    mask = make_causal_mask(attn_mask, T, tk, offset=offset)
    cos, sin = rope_tables(cfg, positions)

    # masked mean-pool over the sequence axis (pad tokens excluded), fp32
    if pool_mask is not None:
        pool_w = pool_mask.astype(jnp.float32)
    else:
        pool_w = (attn_mask[:, :T] if cache is None else jnp.ones((B, T))).astype(jnp.float32)
    denom = jnp.maximum(pool_w.sum(-1, keepdims=True), 1.0)

    def pool(h):
        return (h.astype(jnp.float32) * pool_w[..., None]).sum(1) / denom

    layers = params["layers"]
    L = cfg.num_hidden_layers

    layer_fn = _layer_forward
    if cfg.remat and cache is None:
        layer_fn = jax.checkpoint(_layer_forward, static_argnums=(0,))

    out: Dict[str, Any] = {}
    if cache is not None:
        # cached PREFILL (T>1) at a statically-zero offset may still use the
        # flash kernel: causal-by-slot + the padded validity row are exactly
        # its in-kernel rule. The caller declares the static fact via
        # `static_zero_offset` — an int() sniff on cache_index no longer
        # works (constants created inside a trace are tracers in current
        # JAX, so the sniff silently disabled the kernel everywhere).
        # Decode (T=1) and nonzero offsets fall back to the XLA path.
        cached_kv_valid = attn_mask if (static_zero_offset and T > 1) else None

        # cache rides the CARRY: per-layer writes stay in place instead of
        # re-stacking the multi-GB cache through scan outputs each step
        def body_cached(carry, inp):
            x, k_all, v_all = carry
            lp, li = inp
            x_out, (k_all, v_all), _ = layer_fn(
                cfg, lp, x, mask, cos, sin, (k_all, v_all, li, cache_index),
                cached_kv_valid,
            )
            ys = {"pooled": pool(x_out)} if collect_hidden_states else {}
            return (x_out, k_all, v_all), ys

        (x, k_all, v_all), scan_out = jax.lax.scan(
            body_cached, (x, cache.k, cache.v),
            (layers, jnp.arange(L, dtype=jnp.int32)),
        )
        out["cache"] = KVCache(k_all, v_all)
    else:
        kv_valid = attn_mask[:, :T]  # uncached: offset 0, Tk == T

        def body(x, lp):
            x_out, _, moe_aux = layer_fn(cfg, lp, x, mask, cos, sin, None, kv_valid)
            ys = {"pooled": pool(x_out)} if collect_hidden_states else {}
            if cfg.moe_experts:
                ys["moe_aux"] = moe_aux
            return x_out, ys

        x, scan_out = jax.lax.scan(body, x, layers)
        if cfg.moe_experts:
            # mean router losses over layers (training adds moe_aux_coef *
            # balance + moe_z_coef * z to the CE loss)
            aux_v = scan_out["moe_aux"].mean(0)   # [L, 2] -> [2]
            out["moe_aux"] = aux_v[0]
            out["moe_z"] = aux_v[1]

    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    if collect_hidden_states:
        # HF output_hidden_states convention (the reference pools exactly this:
        # openvla_utils.py:188-199): [embeddings, layer_1..layer_{L-1} outputs,
        # FINAL-NORMED last layer] — L+1 entries.
        per_layer = scan_out["pooled"]  # [L, B, D]; last entry is pre-norm
        emb_pool = pool(inputs_embeds)[None]  # [1, B, D]
        final_pool = pool(x)[None]
        out["hidden_pooled"] = jnp.concatenate(
            [emb_pool, per_layer[:-1], final_pool], axis=0
        ).transpose(1, 0, 2)
    out["last_hidden_state"] = x
    if compute_logits:
        out["logits"] = matmul_t(x, params["lm_head"]).astype(jnp.float32)
    return out


def embed_tokens(params: Params, input_ids: jnp.ndarray) -> jnp.ndarray:
    return params["embed_tokens"][input_ids]


def top2_margin(logits: jnp.ndarray, argmax_idx: jnp.ndarray) -> jnp.ndarray:
    """top1 - top2 logit gap via three max-reductions — cheaper than
    lax.top_k's sort network on a 32k vocab (it sits on the decode hot path)."""
    top1 = jnp.max(logits, axis=-1)
    masked = jnp.where(
        jnp.arange(logits.shape[-1])[None, :] == argmax_idx[:, None],
        -jnp.inf, logits,
    )
    return top1 - jnp.max(masked, axis=-1)


# --- serving fast path: prefill-KV + split-attention decode ------------------
#
# The generic `forward` threads one stacked [L, B, S_max, Hkv, Dh] cache
# through the layer scan and reads the current layer with
# `dynamic_index_in_dim` — a gather XLA materializes as a full layer-cache
# copy every decode step (~the entire cache re-written per token; measured
# ~4.5 ms/token overhead at B=16 on v5e). The serving path avoids the copy
# structurally:
#
#   * prefill emits each layer's K/V through scan **ys** — the one required
#     write of the prefill KV, laid out [L, B, T, Hkv, Dh] and FROZEN.
#   * decode feeds the frozen prefill K/V back as scan **xs** — the scan
#     machinery slices layer li the same way it slices the stacked weights
#     (no extra materialization), and attention reads it directly.
#   * the A generated tokens keep their K/V in a separate tiny
#     [L, B, A, Hkv, Dh] buffer on the carry (token-sized in-place writes;
#     the dynamic_index copy of an A-slot buffer is ~KBs, not GBs).
#   * attention is computed over the two segments and softmaxed jointly —
#     mathematically identical to one concatenated sequence.
#
# Decode HBM traffic per token = weights + prefill KV + O(A) — the bandwidth
# bound. Reference analogue: the HF cached decode branch
# (extern/hf/modeling_prismatic.py:324-341).


class PrefillKV(NamedTuple):
    """Frozen prefill K/V, [n_layers, B, T, n_kv_heads, head_dim] each."""

    k: jnp.ndarray
    v: jnp.ndarray


class PrefillKVQ(NamedTuple):
    """int8-quantized frozen prefill K/V (turbo serving tier).

    Values are symmetric per-(layer, batch, token, head) absmax int8; the
    fp32 scales ride alongside. Halves the decode-step KV stream (the cache
    read is ~40% of the per-token HBM traffic at B=24). Decode attention
    consumes this WITHOUT dequantizing to HBM: q·K runs as an int8×int8 MXU
    dot (q row-quantized on the fly) and probs·V folds the V-scales into the
    probabilities before an int8 dot — the int8 bytes are the only KV stream.
    """

    k: jnp.ndarray   # s8 [L, B, T, Hkv, Dh]
    v: jnp.ndarray
    ks: jnp.ndarray  # f32 [L, B, T, Hkv]
    vs: jnp.ndarray


def quantize_prefill_kv(kv: PrefillKV) -> PrefillKVQ:
    def q(x):
        xf = x.astype(jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-8) / 127.0
        qi = jnp.clip(jnp.round(xf / s[..., None]), -127, 127).astype(jnp.int8)
        return qi, s

    kq, ks = q(kv.k)
    vq, vs = q(kv.v)
    return PrefillKVQ(kq, vq, ks, vs)


def prefill(
    params: Params,
    cfg: LlamaConfig,
    inputs_embeds: jnp.ndarray,          # [B, T, D]
    attn_mask: jnp.ndarray,              # [B, T] (1 = real token)
    positions: jnp.ndarray,              # [B, T]
    collect_hidden_states: bool = False,
    pool_mask: Optional[jnp.ndarray] = None,
) -> Dict[str, Any]:
    """Self-attention prefill that also returns the per-layer K/V (post-RoPE)
    for the split-attention decode. Same math as `forward` without a cache."""
    B, T, D = inputs_embeds.shape
    mask = make_causal_mask(attn_mask, T, T, offset=0)
    cos, sin = rope_tables(cfg, positions)

    pool_w = (pool_mask if pool_mask is not None else attn_mask).astype(jnp.float32)
    denom = jnp.maximum(pool_w.sum(-1, keepdims=True), 1.0)

    def pool(h):
        return (h.astype(jnp.float32) * pool_w[..., None]).sum(1) / denom

    def body(x, lp):
        x_out, kv, _ = _layer_forward(cfg, lp, x, mask, cos, sin, None, attn_mask)
        ys = {"k": kv[0], "v": kv[1]}
        if collect_hidden_states:
            ys["pooled"] = pool(x_out)
        return x_out, ys

    x, ys = jax.lax.scan(body, inputs_embeds, params["layers"])
    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)

    out: Dict[str, Any] = {
        "last_hidden_state": x,
        "kv": PrefillKV(ys["k"], ys["v"]),
    }
    if collect_hidden_states:
        per_layer = ys["pooled"]                 # [L, B, D]; last is pre-norm
        emb_pool = pool(inputs_embeds)[None]
        final_pool = pool(x)[None]
        out["hidden_pooled"] = jnp.concatenate(
            [emb_pool, per_layer[:-1], final_pool], axis=0
        ).transpose(1, 0, 2)
    return out


def _split_attention(
    q: jnp.ndarray,        # [B, 1, H, Dh]
    kp: jnp.ndarray,       # [B, T, Hkv, Dh] frozen prefill keys
    vp: jnp.ndarray,
    kd: jnp.ndarray,       # [B, A, Hkv, Dh] generated-token keys
    vd: jnp.ndarray,
    add_pre: jnp.ndarray,  # [B, 1, 1, T] additive fp32
    add_dec: jnp.ndarray,  # [B, 1, 1, A] additive fp32
    scores_dtype=jnp.float32,
    valid_info: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    # valid_info = (pre_valid [B, T], dec_valid [B, A]): enables the Pallas
    # decode kernel (everything in VMEM, one HBM pass over the prefill KV)
) -> jnp.ndarray:
    """softmax([q·Kp | q·Kd]) @ [Vp; Vd] — joint softmax over both segments
    (identical to attention over the concatenated sequence)."""
    n_rep = q.shape[2] // kp.shape[2]
    kp, vp = _repeat_kv(kp, n_rep), _repeat_kv(vp, n_rep)
    kd, vd = _repeat_kv(kd, n_rep), _repeat_kv(vd, n_rep)
    import os

    interp = os.environ.get("OVLA_PALLAS_INTERPRET", "0") == "1"
    if (
        os.environ.get("OVLA_PALLAS", "0") == "1"
        and os.environ.get("OVLA_PALLAS_DECODE", "1") == "1"
        and (jax.default_backend() == "tpu" or interp)
        and valid_info is not None
    ):
        from ..ops.decode_attention import decode_flash_attention

        return decode_flash_attention(q, kp, vp, kd, vd, *valid_info,
                                      interpret=interp)
    scale = 1.0 / np.sqrt(q.shape[-1])
    sp = jnp.einsum("bthd,bshd->bhts", q, kp, preferred_element_type=scores_dtype)
    sd = jnp.einsum("bthd,bshd->bhts", q, kd, preferred_element_type=scores_dtype)
    sp = (sp * scale + add_pre.astype(scores_dtype)).astype(scores_dtype)
    sd = (sd * scale + add_dec.astype(scores_dtype)).astype(scores_dtype)
    T = kp.shape[1]
    probs = jax.nn.softmax(
        jnp.concatenate([sp, sd], axis=-1).astype(jnp.float32), axis=-1
    ).astype(q.dtype)
    out = (
        jnp.einsum("bhts,bshd->bthd", probs[..., :T], vp, preferred_element_type=jnp.float32)
        + jnp.einsum("bhts,bshd->bthd", probs[..., T:], vd, preferred_element_type=jnp.float32)
    )
    return out.astype(q.dtype)


def _split_attention_i8(
    q: jnp.ndarray,        # [B, 1, H, Dh]
    kq: jnp.ndarray,       # s8 [B, T, Hkv, Dh] quantized frozen prefill keys
    ks: jnp.ndarray,       # f32 [B, T, Hkv]
    vq: jnp.ndarray,
    vs: jnp.ndarray,
    kd: jnp.ndarray,       # bf16 [B, A, Hkv, Dh] generated-token keys
    vd: jnp.ndarray,
    add_pre: jnp.ndarray,  # [B, 1, 1, T] additive fp32
    add_dec: jnp.ndarray,  # [B, 1, 1, A]
    scores_dtype=jnp.float32,
) -> jnp.ndarray:
    """Split attention over an int8 prefill segment + bf16 decode buffer.

    The prefill K/V never dequantizes to HBM: q·Kp is an int8×int8 dot with
    q row-quantized on the fly (scores rescaled by s_q·s_k), and probs·Vp
    folds the per-token V-scales INTO the probabilities before row-quantizing
    them for a second int8 dot (a per-contraction-index scale cannot be
    pulled out of the sum, so it rides the probs). The tiny decode segment
    stays bf16. Joint softmax over both segments — same math as
    `_split_attention` up to int8 rounding (turbo tier only).
    """
    n_rep = q.shape[2] // kq.shape[2]
    kq, vq = _repeat_kv(kq, n_rep), _repeat_kv(vq, n_rep)
    ks, vs = _repeat_kv(ks[..., None], n_rep)[..., 0], _repeat_kv(vs[..., None], n_rep)[..., 0]
    kd, vd = _repeat_kv(kd, n_rep), _repeat_kv(vd, n_rep)

    scale = 1.0 / np.sqrt(q.shape[-1])
    # row-quantize q over Dh: scales per (B, 1, H)
    qf = q.astype(jnp.float32)
    sq = jnp.maximum(jnp.max(jnp.abs(qf), axis=-1), 1e-8) / 127.0
    qi = jnp.clip(jnp.round(qf / sq[..., None]), -127, 127).astype(jnp.int8)

    sp = jnp.einsum("bthd,bshd->bhts", qi, kq, preferred_element_type=jnp.int32)
    # rescale: s_q per (b,t,h) -> [b,h,t,1]; s_k per (b,s,h) -> [b,h,1,s]
    sp = sp.astype(jnp.float32) * sq.transpose(0, 2, 1)[..., None] \
        * ks.transpose(0, 2, 1)[:, :, None, :]
    sd = jnp.einsum("bthd,bshd->bhts", q, kd, preferred_element_type=scores_dtype)
    sp = (sp * scale + add_pre).astype(scores_dtype)
    sd = (sd.astype(jnp.float32) * scale + add_dec).astype(scores_dtype)
    T = kq.shape[1]
    probs = jax.nn.softmax(
        jnp.concatenate([sp, sd], axis=-1).astype(jnp.float32), axis=-1
    )
    # fold V-scales into the prefill probs, then row-quantize them
    pf = probs[..., :T] * vs.transpose(0, 2, 1)[:, :, None, :]   # [b,h,t,s] f32
    spp = jnp.maximum(jnp.max(jnp.abs(pf), axis=-1), 1e-12) / 127.0  # [b,h,t]
    pi = jnp.clip(jnp.round(pf / spp[..., None]), -127, 127).astype(jnp.int8)
    out_pre = jnp.einsum("bhts,bshd->bthd", pi, vq, preferred_element_type=jnp.int32)
    out_pre = out_pre.astype(jnp.float32) * spp.transpose(0, 2, 1)[..., None]
    out_dec = jnp.einsum(
        "bhts,bshd->bthd", probs[..., T:].astype(q.dtype), vd,
        preferred_element_type=jnp.float32,
    )
    return (out_pre + out_dec.astype(jnp.float32)).astype(q.dtype)


def decode_step(
    params: Params,
    cfg: LlamaConfig,
    x: jnp.ndarray,            # [B, 1, D] current-token embedding
    positions: jnp.ndarray,    # [B, 1] absolute position of the token
    kv_pre: PrefillKV,
    pre_mask: jnp.ndarray,     # [B, T] prefill validity (1 = attend)
    dec_k: jnp.ndarray,        # [L, B, A, Hkv, Dh] generated-token K buffer
    dec_v: jnp.ndarray,
    t: jnp.ndarray,            # scalar int32: decode-step index (slot for this token)
    unroll_layers: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One greedy decode step. Returns (last_hidden [B, D], dec_k, dec_v)."""
    B = x.shape[0]
    A = dec_k.shape[2]
    L = cfg.num_hidden_layers
    H, Hkv, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    cos, sin = rope_tables(cfg, positions)
    add_pre = jnp.where(pre_mask > 0, 0.0, NEG_INF)[:, None, None, :].astype(jnp.float32)
    dec_valid = jnp.broadcast_to((jnp.arange(A)[None, :] <= t).astype(jnp.int32), (B, A))
    add_dec = jnp.where(dec_valid > 0, 0.0, NEG_INF)[:, None, None, :].astype(jnp.float32)
    valid_info = (pre_mask, dec_valid)

    quantized_kv = isinstance(kv_pre, PrefillKVQ)
    if unroll_layers:
        # unrolled layer loop: every slice index is STATIC, so XLA fuses the
        # per-layer reads of weights and frozen prefill K/V straight into the
        # dots (the scan's dynamic xs slicing materializes per-layer copies)
        for i in range(L):
            lp = jax.tree.map(lambda a: a[i], params["layers"])
            h = rms_norm(x, lp["input_layernorm"], cfg.rms_norm_eps)
            q, k, v = _qkv(cfg, lp, h, B, 1)
            q, k = apply_rope(q, k, cos, sin, cfg.rope_dtype)
            kd_i = jax.lax.dynamic_update_slice(dec_k[i], k, (0, t, 0, 0))
            vd_i = jax.lax.dynamic_update_slice(dec_v[i], v, (0, t, 0, 0))
            dec_k = dec_k.at[i].set(kd_i)
            dec_v = dec_v.at[i].set(vd_i)
            if quantized_kv:
                attn = _split_attention_i8(
                    q, kv_pre.k[i], kv_pre.ks[i], kv_pre.v[i], kv_pre.vs[i],
                    kd_i, vd_i, add_pre, add_dec, cfg.attn_scores_dtype,
                ).reshape(B, 1, cfg.hidden_size)
            else:
                attn = _split_attention(
                    q, kv_pre.k[i], kv_pre.v[i], kd_i, vd_i,
                    add_pre, add_dec, cfg.attn_scores_dtype, valid_info,
                ).reshape(B, 1, cfg.hidden_size)
            x = x + matmul_t(attn, lp["o_proj"])
            h = rms_norm(x, lp["post_attention_layernorm"], cfg.rms_norm_eps)
            x = x + _mlp(cfg, lp, h)
    else:
        def body(carry, inp):
            x, kd_all, vd_all = carry
            lp, kv_i, li = inp

            h = rms_norm(x, lp["input_layernorm"], cfg.rms_norm_eps)
            q, k, v = _qkv(cfg, lp, h, B, 1)
            q, k = apply_rope(q, k, cos, sin, cfg.rope_dtype)

            kd_all = jax.lax.dynamic_update_slice(kd_all, k[None], (li, 0, t, 0, 0))
            vd_all = jax.lax.dynamic_update_slice(vd_all, v[None], (li, 0, t, 0, 0))
            kd = jax.lax.dynamic_index_in_dim(kd_all, li, 0, keepdims=False)
            vd = jax.lax.dynamic_index_in_dim(vd_all, li, 0, keepdims=False)

            if quantized_kv:
                attn = _split_attention_i8(
                    q, kv_i.k, kv_i.ks, kv_i.v, kv_i.vs,
                    kd, vd, add_pre, add_dec, cfg.attn_scores_dtype,
                ).reshape(B, 1, cfg.hidden_size)
            else:
                attn = _split_attention(
                    q, kv_i.k, kv_i.v, kd, vd, add_pre, add_dec,
                    cfg.attn_scores_dtype,
                ).reshape(B, 1, cfg.hidden_size)
            x = x + matmul_t(attn, lp["o_proj"])

            h = rms_norm(x, lp["post_attention_layernorm"], cfg.rms_norm_eps)
            x = x + _mlp(cfg, lp, h)
            return (x, kd_all, vd_all), None

        (x, dec_k, dec_v), _ = jax.lax.scan(
            body,
            (x, dec_k, dec_v),
            (params["layers"], kv_pre, jnp.arange(L, dtype=jnp.int32)),
        )
    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    return x[:, 0], dec_k, dec_v


def greedy_decode(
    params: Params,
    cfg: LlamaConfig,
    kv_pre: PrefillKV,
    pre_mask: jnp.ndarray,     # [B, T] prefill validity
    first_token: jnp.ndarray,  # [B] int32 (from the prefill logits)
    start_pos: jnp.ndarray,    # [B] absolute position of first_token
    n_steps: int,              # number of ADDITIONAL tokens to generate
    unroll_layers: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy-decode `n_steps` tokens after `first_token`.
    Returns (tokens [B, n_steps], top1-top2 logit margins [B, n_steps])."""
    B = first_token.shape[0]
    L, Hkv, Dh = cfg.num_hidden_layers, cfg.num_key_value_heads, cfg.head_dim
    A = max(n_steps, 1)
    # generated-token buffer stays bf16 even over an int8 prefill KV
    dec_dtype = cfg.dtype if isinstance(kv_pre, PrefillKVQ) else kv_pre.k.dtype
    dec_k = jnp.zeros((L, B, A, Hkv, Dh), dec_dtype)
    dec_v = jnp.zeros((L, B, A, Hkv, Dh), dec_dtype)

    def step(carry, t):
        dec_k, dec_v, tok = carry
        e = embed_tokens(params, tok[:, None])
        pos = (start_pos + t)[:, None]
        hidden, dec_k, dec_v = decode_step(
            params, cfg, e, pos, kv_pre, pre_mask, dec_k, dec_v, t,
            unroll_layers=unroll_layers,
        )
        logits = matmul_t(hidden, params["lm_head"]).astype(jnp.float32)
        nxt = logits.argmax(-1).astype(jnp.int32)
        return (dec_k, dec_v, nxt), (nxt, top2_margin(logits, nxt))

    if n_steps == 0:
        return jnp.zeros((B, 0), jnp.int32), jnp.zeros((B, 0), jnp.float32)
    (_, _, _), (toks, margins) = jax.lax.scan(
        step, (dec_k, dec_v, first_token), jnp.arange(n_steps, dtype=jnp.int32)
    )
    return toks.T, margins.T


# --- stacked-carry int8 decode (pallas_kv8 tier) -----------------------------
#
# The A/B-measured fastest decode keeps the WHOLE S-slot cache on the decode
# scan's carry (PERF_r03.md) — but XLA streams it in bf16, and every lax
# formulation of an int8 cache (turbo_kv8) re-materialized dequantized K/V in
# HBM and lost. This path stores the carry cache itself in int8 (flat
# [L, B, S, H*Dh] + per-(slot, head) scales) and hands attention to a Pallas
# kernel whose BlockSpec index maps consume the layer index via scalar
# prefetch: the DMA streams exactly one layer's int8 blocks and the dequant
# happens in VMEM — the cache's HBM traffic halves by construction.


class KVCacheQ(NamedTuple):
    """int8 stacked KV cache, FLAT head-minor layout.

    kq/vq: s8 [L, B, S, H*Dh] (a free bitcast of [L, B, S, H, Dh] — the
    projection-output layout, no transposes anywhere); ks/vs: f32
    [L, B, S, H] per-(slot, head) absmax scales. Generated tokens are
    quantized into the SAME cache (one segment, one softmax) — unlike
    turbo_kv8's bf16 side-buffer, so its numerics tier is its own row.
    """

    kq: jnp.ndarray
    ks: jnp.ndarray
    vq: jnp.ndarray
    vs: jnp.ndarray


def _quant_heads(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[..., H, Dh] -> (s8 [..., H*Dh] flat, f32 scales [..., H])."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-8) / 127.0
    qi = jnp.clip(jnp.round(xf / s[..., None]), -127, 127).astype(jnp.int8)
    return qi.reshape(*x.shape[:-2], x.shape[-2] * x.shape[-1]), s


def quantize_kv_cache(cache: KVCache) -> KVCacheQ:
    """One-shot post-prefill quantization of the stacked bf16 cache."""
    kq, ks = _quant_heads(cache.k)
    vq, vs = _quant_heads(cache.v)
    return KVCacheQ(kq, ks, vq, vs)


def quantize_prefill_to_stacked(kv: PrefillKV, s_slots: int) -> KVCacheQ:
    """ys-emitted prefill K/V [L, B, T, H, Dh] -> int8 stacked cache with
    `s_slots` slots (T prefill + generated-token room, tile-aligned).

    The pad runs BEFORE the quantize so XLA fuses it into the quantize's
    read: one pass, bf16 in / int8 + scales out. Quantizing the carry-path
    cache instead read XLA's transposed prefill-scan layout {4,2,3,1,0} and
    lowered to a 106 ms looped 5D transpose (profiled, B=24) — the ys
    emission keeps the source in natural layout, where the same pass costs
    ~8 ms. Padded slots quantize from zeros (scale floor 1e-8) and stay
    masked out by the decode validity row.
    """
    pad = s_slots - kv.k.shape[2]
    widths = ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0))
    kq, ks = _quant_heads(jnp.pad(kv.k, widths))
    vq, vs = _quant_heads(jnp.pad(kv.v, widths))
    return KVCacheQ(kq, ks, vq, vs)


def decode_step_stacked_i8(
    params: Params,
    cfg: LlamaConfig,
    x: jnp.ndarray,          # [B, 1, D] current-token embedding
    positions: jnp.ndarray,  # [B, 1] absolute position
    cq: KVCacheQ,
    valid: jnp.ndarray,      # [B, S] slot validity for THIS step (incl. self)
    slot: jnp.ndarray,       # scalar int32 cache slot of this token
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, KVCacheQ]:
    """One greedy decode step over the int8 stacked cache.

    Mirrors `forward`'s cached branch (cache on the scan carry, per-layer
    one-token writes) with the new token's K/V absmax-quantized into the int8
    cache and attention computed by the fused-dequant Pallas kernel
    (ops/decode_attention.stacked_decode_attention_i8; GQA handled in-kernel
    — each kv head's dequantized tile serves its n_rep query heads). Returns
    (last_hidden [B, D] post-norm, updated cache).
    """
    B = x.shape[0]
    L = cfg.num_hidden_layers
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    cos, sin = rope_tables(cfg, positions)
    from ..ops.decode_attention import stacked_decode_attention_i8

    def body(carry, inp):
        x, kq, ks, vq, vs = carry
        lp, li = inp
        h = rms_norm(x, lp["input_layernorm"], cfg.rms_norm_eps)
        q, k, v = _qkv(cfg, lp, h, B, 1)
        q, k = apply_rope(q, k, cos, sin, cfg.rope_dtype)
        kq_t, ks_t = _quant_heads(k)   # [B, 1, H*Dh], [B, 1, H]
        vq_t, vs_t = _quant_heads(v)
        kq = jax.lax.dynamic_update_slice(kq, kq_t[None], (li, 0, slot, 0))
        ks = jax.lax.dynamic_update_slice(ks, ks_t[None], (li, 0, slot, 0))
        vq = jax.lax.dynamic_update_slice(vq, vq_t[None], (li, 0, slot, 0))
        vs = jax.lax.dynamic_update_slice(vs, vs_t[None], (li, 0, slot, 0))
        attn = stacked_decode_attention_i8(
            q, kq, ks, vq, vs, valid, li, interpret=interpret
        ).reshape(B, 1, cfg.hidden_size)
        x = x + matmul_t(attn, lp["o_proj"])
        h = rms_norm(x, lp["post_attention_layernorm"], cfg.rms_norm_eps)
        x = x + _mlp(cfg, lp, h)
        return (x, kq, ks, vq, vs), None

    (x, kq, ks, vq, vs), _ = jax.lax.scan(
        body, (x, cq.kq, cq.ks, cq.vq, cq.vs),
        (params["layers"], jnp.arange(L, dtype=jnp.int32)),
    )
    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    return x[:, 0], KVCacheQ(kq, ks, vq, vs)


# --- init + HF weight import ------------------------------------------------

def init_params(cfg: LlamaConfig, key: jax.Array) -> Params:
    """Random init (normal 0.02) with the stacked-layer layout."""
    k1, k2, k3 = jax.random.split(key, 3)
    D, F, V, L = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size, cfg.num_hidden_layers
    H, Hkv, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    def nrm(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(cfg.dtype)

    keys = jax.random.split(k3, 7)
    layers = {
        "q_proj": nrm(keys[0], (L, H * Dh, D)),
        "k_proj": nrm(keys[1], (L, Hkv * Dh, D)),
        "v_proj": nrm(keys[2], (L, Hkv * Dh, D)),
        "o_proj": nrm(keys[3], (L, D, H * Dh)),
        "input_layernorm": jnp.ones((L, D), cfg.dtype),
        "post_attention_layernorm": jnp.ones((L, D), cfg.dtype),
    }
    if cfg.moe_experts:
        # expert stacks only — never materialize the dense FFN leaves
        # (three [L, F, D] tensors are ~22 GB fp32 at Mixtral-8x7B scale)
        layers.update(moe.init_layer_params(
            jax.random.fold_in(k3, 1), L, cfg.moe_experts, D, F, cfg.dtype))
    else:
        layers.update({
            "gate_proj": nrm(keys[4], (L, F, D)),
            "up_proj": nrm(keys[5], (L, F, D)),
            "down_proj": nrm(keys[6], (L, D, F)),
        })
    return {
        "embed_tokens": nrm(k1, (V, D)),
        "layers": layers,
        "norm": jnp.ones((D,), cfg.dtype),
        "lm_head": nrm(k2, (V, D)),
    }


_HF_LAYER_KEYS = {
    "self_attn.q_proj.weight": "q_proj",
    "self_attn.k_proj.weight": "k_proj",
    "self_attn.v_proj.weight": "v_proj",
    "self_attn.o_proj.weight": "o_proj",
    "mlp.gate_proj.weight": "gate_proj",
    "mlp.up_proj.weight": "up_proj",
    "mlp.down_proj.weight": "down_proj",
    "input_layernorm.weight": "input_layernorm",
    "post_attention_layernorm.weight": "post_attention_layernorm",
}


def params_from_hf(state: Dict[str, np.ndarray], cfg: LlamaConfig, prefix: str = "model.") -> Params:
    """Map an HF LlamaForCausalLM state dict (numpy arrays) onto the stacked
    pytree. `state` keys like `model.layers.3.self_attn.q_proj.weight`.
    With cfg.moe_experts > 0 the dense-MLP keys are replaced by the HF
    Mixtral layout (`block_sparse_moe.gate` + per-expert `w1/w2/w3`), stacked
    [L, E, ...]: w1=gate, w3=up, w2=down (modeling_mixtral.MixtralBlockSparseTop2MLP)."""
    L = cfg.num_hidden_layers
    layer_keys = dict(_HF_LAYER_KEYS)
    if cfg.moe_experts:
        for k in ("mlp.gate_proj.weight", "mlp.up_proj.weight", "mlp.down_proj.weight"):
            del layer_keys[k]
        layer_keys["block_sparse_moe.gate.weight"] = "router"
        for j in range(cfg.moe_experts):
            for w, ours in (("w1", "gate_proj"), ("w3", "up_proj"), ("w2", "down_proj")):
                layer_keys[f"block_sparse_moe.experts.{j}.{w}.weight"] = f"{ours}.{j}"
    layers: Dict[str, np.ndarray] = {}
    for hf_key, ours in layer_keys.items():
        per = [np.asarray(state[f"{prefix}layers.{i}.{hf_key}"]) for i in range(L)]
        layers[ours] = jnp.asarray(np.stack(per), cfg.dtype)
    if cfg.moe_experts:
        # gather the per-expert stacks into [L, E, ...]
        for ours in ("gate_proj", "up_proj", "down_proj"):
            per_e = [layers.pop(f"{ours}.{j}") for j in range(cfg.moe_experts)]
            layers[ours] = jnp.stack(per_e, axis=1)
    return {
        "embed_tokens": jnp.asarray(state[f"{prefix}embed_tokens.weight"], cfg.dtype),
        "layers": layers,
        "norm": jnp.asarray(state[f"{prefix}norm.weight"], cfg.dtype),
        "lm_head": jnp.asarray(state["lm_head.weight"], cfg.dtype),
    }
