"""Phi-2 decoder (parallel attention + MLP, partial rotary), TPU-first.

The reference exposes Phi-2 as an LLM backbone (prismatic/models/backbones/
llm/phi.py via HF PhiForCausalLM). Phi's block differs from Llama's:
LayerNorm (with bias) feeds BOTH the attention and the MLP in parallel, the
residual adds both outputs; projections carry biases; rotary embeddings cover
only `rotary_dim = partial_rotary_factor * head_dim` leading channels; final
LayerNorm + biased lm_head. Layer-stacked + lax.scan like the Llama stack.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .llama import KVCache, attention, make_causal_mask
from .vit import layer_norm

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class PhiConfig:
    vocab_size: int = 51200
    hidden_size: int = 2560
    intermediate_size: int = 10240
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    max_position_embeddings: int = 2048
    layer_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    partial_rotary_factor: float = 0.4
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def rotary_dim(self) -> int:
        return int(self.partial_rotary_factor * self.head_dim)

    @staticmethod
    def tiny(**kw) -> "PhiConfig":
        d = dict(vocab_size=256, hidden_size=64, intermediate_size=128,
                 num_hidden_layers=3, num_attention_heads=4,
                 max_position_embeddings=128, dtype=jnp.float32)
        d.update(kw)
        return PhiConfig(**d)


def _partial_rope(x: jnp.ndarray, positions: jnp.ndarray, cfg: PhiConfig) -> jnp.ndarray:
    """Rotate the leading rotary_dim channels (HF rotate_half convention)."""
    rd = cfg.rotary_dim
    half = rd // 2
    inv_freq = 1.0 / (cfg.rope_theta ** (jnp.arange(0, half, dtype=jnp.float32) * 2.0 / rd))
    freqs = positions[..., None].astype(jnp.float32) * inv_freq     # [B, T, half]
    emb = jnp.concatenate([freqs, freqs], axis=-1)                  # [B, T, rd]
    cos = jnp.cos(emb)[:, :, None, :]
    sin = jnp.sin(emb)[:, :, None, :]
    rot, rest = x[..., :rd].astype(jnp.float32), x[..., rd:]
    r1, r2 = rot[..., :half], rot[..., half:]
    rotated = jnp.concatenate([-r2, r1], axis=-1)
    out = rot * cos + rotated * sin
    return jnp.concatenate([out.astype(x.dtype), rest], axis=-1)


def _gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x.astype(jnp.float32), approximate=True).astype(x.dtype)


def _layer(cfg: PhiConfig, lp: Params, x, mask, positions, cache_kv=None, cache_index=None):
    B, T, D = x.shape
    H, Dh = cfg.num_attention_heads, cfg.head_dim
    h = layer_norm(x, lp["ln_scale"], lp["ln_bias"], cfg.layer_norm_eps)

    q = (h @ lp["q_w"].T + lp["q_b"]).reshape(B, T, H, Dh)
    k = (h @ lp["k_w"].T + lp["k_b"]).reshape(B, T, H, Dh)
    v = (h @ lp["v_w"].T + lp["v_b"]).reshape(B, T, H, Dh)
    q = _partial_rope(q, positions, cfg)
    k = _partial_rope(k, positions, cfg)

    new_cache = None
    if cache_kv is not None:
        ck, cv = cache_kv
        ck = jax.lax.dynamic_update_slice(ck, k, (0, cache_index, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, v, (0, cache_index, 0, 0))
        k, v = ck, cv
        new_cache = (ck, cv)

    attn = attention(q, k, v, mask).reshape(B, T, D)
    attn = attn @ lp["dense_w"].T + lp["dense_b"]

    # parallel MLP on the SAME normed input
    ff = _gelu_tanh(h @ lp["fc1_w"].T + lp["fc1_b"])
    ff = ff @ lp["fc2_w"].T + lp["fc2_b"]
    return x + attn + ff, new_cache


def forward(
    params: Params,
    cfg: PhiConfig,
    inputs_embeds: jnp.ndarray,
    attn_mask: jnp.ndarray,
    positions: jnp.ndarray,
    cache: Optional[KVCache] = None,
    cache_index: Optional[jnp.ndarray] = None,
) -> Dict[str, Any]:
    B, T, D = inputs_embeds.shape
    tk = attn_mask.shape[1]
    mask = make_causal_mask(attn_mask, T, tk, offset=0 if cache is None else cache_index)
    x = inputs_embeds

    def body(x, inp):
        lp, ck, cv = inp
        cache_kv = None if cache is None else (ck, cv)
        x_out, new_cache = _layer(cfg, lp, x, mask, positions, cache_kv, cache_index)
        return x_out, ({"cache": new_cache} if cache is not None else {})

    L = cfg.num_hidden_layers
    if cache is not None:
        xs = (params["layers"], cache.k, cache.v)
    else:
        dummy = jnp.zeros((L, 1))
        xs = (params["layers"], dummy, dummy)
    x, ys = jax.lax.scan(body, x, xs)

    out: Dict[str, Any] = {}
    if cache is not None:
        out["cache"] = KVCache(ys["cache"][0], ys["cache"][1])
    x = layer_norm(x, params["final_ln_scale"], params["final_ln_bias"], cfg.layer_norm_eps)
    out["last_hidden_state"] = x
    out["logits"] = (x @ params["lm_head_w"].T + params["lm_head_b"]).astype(jnp.float32)
    return out


def embed_tokens(params: Params, ids: jnp.ndarray) -> jnp.ndarray:
    return params["embed_tokens"][ids]


def init_params(cfg: PhiConfig, key) -> Params:
    """Random init (normal 0.02) in the stacked-layer phi layout."""
    k1, k2, k3 = jax.random.split(key, 3)
    D, F, V, L = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size, cfg.num_hidden_layers

    def nrm(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(cfg.dtype)

    ks = jax.random.split(k3, 6)
    layers = {
        "ln_scale": jnp.ones((L, D), cfg.dtype), "ln_bias": jnp.zeros((L, D), cfg.dtype),
        "q_w": nrm(ks[0], (L, D, D)), "q_b": jnp.zeros((L, D), cfg.dtype),
        "k_w": nrm(ks[1], (L, D, D)), "k_b": jnp.zeros((L, D), cfg.dtype),
        "v_w": nrm(ks[2], (L, D, D)), "v_b": jnp.zeros((L, D), cfg.dtype),
        "dense_w": nrm(ks[3], (L, D, D)), "dense_b": jnp.zeros((L, D), cfg.dtype),
        "fc1_w": nrm(ks[4], (L, F, D)), "fc1_b": jnp.zeros((L, F), cfg.dtype),
        "fc2_w": nrm(ks[5], (L, D, F)), "fc2_b": jnp.zeros((L, D), cfg.dtype),
    }
    return {
        "embed_tokens": nrm(k1, (V, D)),
        "layers": layers,
        "final_ln_scale": jnp.ones((D,), cfg.dtype),
        "final_ln_bias": jnp.zeros((D,), cfg.dtype),
        "lm_head_w": nrm(k2, (V, D)),
        "lm_head_b": jnp.zeros((V,), cfg.dtype),
    }


_HF_LAYER_KEYS = {
    "input_layernorm.weight": "ln_scale",
    "input_layernorm.bias": "ln_bias",
    "self_attn.q_proj.weight": "q_w", "self_attn.q_proj.bias": "q_b",
    "self_attn.k_proj.weight": "k_w", "self_attn.k_proj.bias": "k_b",
    "self_attn.v_proj.weight": "v_w", "self_attn.v_proj.bias": "v_b",
    "self_attn.dense.weight": "dense_w", "self_attn.dense.bias": "dense_b",
    "mlp.fc1.weight": "fc1_w", "mlp.fc1.bias": "fc1_b",
    "mlp.fc2.weight": "fc2_w", "mlp.fc2.bias": "fc2_b",
}


def params_from_hf(state: Dict[str, np.ndarray], cfg: PhiConfig, prefix: str = "model.") -> Params:
    L = cfg.num_hidden_layers
    layers = {
        ours: jnp.asarray(
            np.stack([np.asarray(state[f"{prefix}layers.{i}.{hf}"]) for i in range(L)]),
            cfg.dtype,
        )
        for hf, ours in _HF_LAYER_KEYS.items()
    }
    return {
        "embed_tokens": jnp.asarray(state[f"{prefix}embed_tokens.weight"], cfg.dtype),
        "layers": layers,
        "final_ln_scale": jnp.asarray(state[f"{prefix}final_layernorm.weight"], cfg.dtype),
        "final_ln_bias": jnp.asarray(state[f"{prefix}final_layernorm.bias"], cfg.dtype),
        "lm_head_w": jnp.asarray(state["lm_head.weight"], cfg.dtype),
        "lm_head_b": jnp.asarray(state["lm_head.bias"], cfg.dtype),
    }
