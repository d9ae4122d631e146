"""Vision->LLM projectors (linear / gelu-mlp / fused-gelu-mlp).

Functional equivalents of the reference's adapter modules
(prismatic/util/nn_utils.py:12-53); selected by `arch_specifier` exactly as in
prismatic/models/vlms/prismatic.py:60-68. GELU is the exact (erf) variant,
matching torch.nn.GELU's default. The fused variant (used for DinoSigLIP) is
vision_dim -> 4*vision_dim -> llm_dim -> llm_dim with two GELUs.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def _gelu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)


def _linear_init(key: jax.Array, out_dim: int, in_dim: int, dtype) -> Params:
    """torch nn.Linear default init: U(-1/sqrt(in), 1/sqrt(in)) for both w and b."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(in_dim)
    return {
        "w": (jax.random.uniform(kw, (out_dim, in_dim), jnp.float32, -bound, bound)).astype(dtype),
        "b": (jax.random.uniform(kb, (out_dim,), jnp.float32, -bound, bound)).astype(dtype),
    }


def init_params(arch: str, vision_dim: int, llm_dim: int, key: jax.Array, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 3)
    if arch == "linear":
        return {"fc1": _linear_init(ks[0], llm_dim, vision_dim, dtype)}
    if arch.endswith("fused-gelu-mlp"):
        mid = vision_dim * 4
        return {
            "fc1": _linear_init(ks[0], mid, vision_dim, dtype),
            "fc2": _linear_init(ks[1], llm_dim, mid, dtype),
            "fc3": _linear_init(ks[2], llm_dim, llm_dim, dtype),
        }
    if arch.endswith("gelu-mlp"):
        return {
            "fc1": _linear_init(ks[0], llm_dim, vision_dim, dtype),
            "fc2": _linear_init(ks[1], llm_dim, llm_dim, dtype),
        }
    raise ValueError(f"Projector arch `{arch}` is not supported!")


def forward(params: Params, arch: str, patches: jnp.ndarray) -> jnp.ndarray:
    """[B, N, vision_dim] -> [B, N, llm_dim].

    Weights apply through `matmul_t`, so projector "w" leaves accept the same
    representations as the trunk (bf16, int8 {"q","s"}, streamed-LoRA)."""
    from ..ops.linear import matmul_t

    x = matmul_t(patches, params["fc1"]["w"]) + params["fc1"]["b"]
    if arch == "linear":
        return x
    if arch.endswith("fused-gelu-mlp"):
        x = _gelu(x)
        x = matmul_t(x, params["fc2"]["w"]) + params["fc2"]["b"]
        x = _gelu(x)
        return matmul_t(x, params["fc3"]["w"]) + params["fc3"]["b"]
    if arch.endswith("gelu-mlp"):
        x = _gelu(x)
        return matmul_t(x, params["fc2"]["w"]) + params["fc2"]["b"]
    raise ValueError(f"Projector arch `{arch}` is not supported!")
