"""Vision Transformers (DINOv2 / SigLIP / CLIP / IN1K families), TPU-first.

Functional re-design of the reference's vision backbones
(prismatic/models/backbones/vision/base_vision.py:94-207 TimmViTBackbone and
the fused dual-backbone at dinosiglip_vit.py:43-147; serving twin at
extern/hf/modeling_prismatic.py:63-123). Parameter layout and math follow
timm's `VisionTransformer` conventions — the layout the OpenVLA checkpoints
are stored in (fused qkv, LayerScale gamma vectors, token order
[cls, reg, patches]) — so weights map 1:1.

Feature contract (the load-bearing quirk): features are the **patch tokens of
the second-to-last block**, NO final norm, prefix tokens dropped — the
reference monkey-patches timm's forward to `get_intermediate_layers(n=-2)`
(base_vision.py:126-128). `forward_features(..., layer_index=-2)` reproduces
this; the fused DinoSigLIP forward concatenates both backbones' features on
the channel axis inside one traced graph.

TPU-first: blocks are layer-stacked and scanned (single-block trace); the
patch-embed conv is expressed as a reshaped matmul (MXU-friendly, a 14x14
stride-14 conv is exactly a patch-flatten matmul).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.linear import matmul_t

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_dim: int = 4096
    use_cls_token: bool = True
    num_register_tokens: int = 0
    no_embed_class: bool = False     # timm: prefix tokens get NO pos embed (dinov2-reg)
    use_layerscale: bool = False
    pre_norm: bool = False           # CLIP-style LN before blocks
    patch_bias: bool = True
    act: str = "gelu"                # gelu | gelu_tanh | quick_gelu
    layer_norm_eps: float = 1e-6
    dtype: Any = jnp.float32
    attn_scores_dtype: Any = jnp.float32  # bf16 = turbo serving mode
    # rematerialize each block in backward — without it the [B, H, N, N]
    # score arrays of every tower layer live until the backward pass
    # (~350 MB/layer fp32 at B=8/224px), an OOM at 7B-training scale
    remat: bool = False

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def num_prefix_tokens(self) -> int:
        return (1 if self.use_cls_token else 0) + self.num_register_tokens

    # --- catalog (dims per the reference's timm model ids,
    #     configuration_prismatic.py:15-38) --------------------------------
    @staticmethod
    def dinov2_vit_l(**kw) -> "ViTConfig":
        """vit_large_patch14_reg4_dinov2.lvd142m"""
        d = dict(hidden_size=1024, num_layers=24, num_heads=16, mlp_dim=4096,
                 use_cls_token=True, num_register_tokens=4, no_embed_class=True,
                 use_layerscale=True, act="gelu")
        d.update(kw)
        return ViTConfig(**d)

    @staticmethod
    def siglip_so400m(**kw) -> "ViTConfig":
        """vit_so400m_patch14_siglip_224"""
        d = dict(hidden_size=1152, num_layers=27, num_heads=16, mlp_dim=4304,
                 use_cls_token=False, num_register_tokens=0, act="gelu_tanh")
        d.update(kw)
        return ViTConfig(**d)

    @staticmethod
    def clip_vit_l(**kw) -> "ViTConfig":
        """vit_large_patch14_clip_224 (quick_gelu override, pre-norm, no patch bias)"""
        d = dict(hidden_size=1024, num_layers=24, num_heads=16, mlp_dim=4096,
                 use_cls_token=True, pre_norm=True, patch_bias=False, act="quick_gelu")
        d.update(kw)
        return ViTConfig(**d)

    @staticmethod
    def in1k_vit_l(**kw) -> "ViTConfig":
        """vit_large_patch16_224.augreg_in21k_ft_in1k"""
        d = dict(patch_size=16, hidden_size=1024, num_layers=24, num_heads=16, mlp_dim=4096,
                 use_cls_token=True, act="gelu")
        d.update(kw)
        return ViTConfig(**d)

    @staticmethod
    def tiny(**kw) -> "ViTConfig":
        d = dict(image_size=28, patch_size=14, hidden_size=32, num_layers=3,
                 num_heads=2, mlp_dim=64, use_cls_token=True)
        d.update(kw)
        return ViTConfig(**d)


def _act(x: jnp.ndarray, kind: str) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    if kind == "gelu":
        y = jax.nn.gelu(xf, approximate=False)
    elif kind == "gelu_tanh":
        y = jax.nn.gelu(xf, approximate=True)
    elif kind == "quick_gelu":
        y = xf * jax.nn.sigmoid(1.702 * xf)
    else:
        raise ValueError(f"unknown act {kind}")
    return y.astype(x.dtype)


def layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, eps: float) -> jnp.ndarray:
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(dt)


def patchify(pixels: jnp.ndarray, cfg: ViTConfig) -> jnp.ndarray:
    """[B, 3, H, W] -> [B, N, p*p*3] patch-flattened, matching a stride-p conv.

    Flatten order matches conv-weight reshape [D, 3, p, p] -> [D, 3*p*p]:
    channel-major, then kernel rows, then cols.
    """
    B = pixels.shape[0]
    p, g = cfg.patch_size, cfg.grid
    x = pixels.reshape(B, 3, g, p, g, p)          # [B, C, gh, p, gw, p]
    x = x.transpose(0, 2, 4, 1, 3, 5)             # [B, gh, gw, C, p, p]
    return x.reshape(B, g * g, 3 * p * p)


def embed_patches(params: Params, cfg: ViTConfig, pixels: jnp.ndarray) -> jnp.ndarray:
    """Patch-embed as one matmul: [B,3,H,W] -> [B, N, D]."""
    w = params["patch_embed"]["weight"]           # [D, 3*p*p] (reshaped conv weight)
    x = patchify(pixels.astype(w.dtype), cfg)
    out = x @ w.T
    if cfg.patch_bias:
        out = out + params["patch_embed"]["bias"]
    return out


def _block(cfg: ViTConfig, bp: Params, x: jnp.ndarray, B: int, N: int) -> jnp.ndarray:
    """One transformer block over FLAT [B*N, D] activations.

    The tower scan carries activations flattened to 2D: with N not a
    sublane multiple (DINOv2-reg4's 261 tokens), [B, N, D] and [B*N, D] have
    DIFFERENT physical tile padding, so every reshape between them is a real
    HBM relayout pass — the profiled [B, N, D]-carry block spent ~0.6 ms/layer
    on reshape/bias/copy passes around its four matmuls (8 boundary reshapes:
    matmul_t flattens internally). Flat activations make the matmul
    boundaries identity and let bias adds fuse into the matmul epilogue;
    only attention's [B, N, H, Dh] view needs the relayout (2 per block).
    """
    H, Dh = cfg.num_heads, cfg.head_dim
    D = x.shape[-1]
    import os

    from ..ops.linear import is_grouped_int4, is_quantized

    def _pc_int8(w) -> bool:
        # the fused tower kernels (ops/vit_mlp.py) consume per-channel int8
        # codes [O, K] — a mix leaf qualifies via its int8 copy, but grouped
        # int4 ([G, O, gsz] codes) must stay on the XLA w4a8 path
        return is_quantized(w) and not is_grouped_int4(w)

    # OVLA_PALLAS_INTERPRET=1 routes every tower kernel in interpret mode on
    # CPU — exercises the exact _block wiring (stacked-tree scan slices,
    # LayerScale fallbacks, flat-activation shapes) that otherwise only runs
    # on a real chip (tests/test_vit_mlp_kernel.py e2e wiring test)
    interpret = os.environ.get("OVLA_PALLAS_INTERPRET", "0") == "1"
    kernels_on = (
        os.environ.get("OVLA_PALLAS", "0") == "1"
        and (jax.default_backend() == "tpu" or interpret)
    )
    fused_linears = (
        kernels_on
        and os.environ.get("OVLA_PALLAS_VITLIN", "1") == "1"
        and _pc_int8(bp["qkv_w"])
        and _pc_int8(bp["proj_w"])
    )
    if fused_linears:
        # LN1 + activation-quantize + int8 qkv in one dispatch (ops/vit_mlp.py)
        from ..ops.vit_mlp import fused_ln_w8a8

        qkv = fused_ln_w8a8(
            x, bp["qkv_w"], bp["qkv_b"],
            ln=(bp["norm1_scale"], bp["norm1_bias"]), eps=cfg.layer_norm_eps,
            interpret=interpret,
        )
    else:
        h = layer_norm(x, bp["norm1_scale"], bp["norm1_bias"], cfg.layer_norm_eps)
        qkv = matmul_t(h, bp["qkv_w"]) + bp["qkv_b"]  # [B*N, 3D]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, N, H, Dh)
    k = k.reshape(B, N, H, Dh)
    v = v.reshape(B, N, H, Dh)

    # OVLA_PALLAS_VITATTN gates the TOWER flash kernel independently of the
    # llama prefill flash kernel (both used to share OVLA_PALLAS_ATTN, which
    # made per-kernel A/Bs impossible); it defaults to OVLA_PALLAS_ATTN.
    vit_attn_gate = os.environ.get(
        "OVLA_PALLAS_VITATTN", os.environ.get("OVLA_PALLAS_ATTN", "1"))
    if kernels_on and vit_attn_gate == "1":
        # tower flash kernel: the XLA chain materializes the [B, H, N, N]
        # score tile twice + a softmax pass (~0.45 ms/layer at B=24) for
        # ~0.03 ms of FLOPs; the kernel keeps the per-head problem in VMEM
        from ..ops.attention import vit_flash_attention

        attn = vit_flash_attention(q, k, v, interpret=interpret).reshape(B * N, D)
    else:
        scores = jnp.einsum("bthd,bshd->bhts", q, k,
                            preferred_element_type=cfg.attn_scores_dtype)
        # scale in scores_dtype, cast at the softmax boundary: with bf16
        # scores (turbo) XLA then materializes the [B, H, N, N] score array
        # in bf16 instead of fp32 (profiled: the f32 pattern wrote ~650
        # MB/tower-layer at B=24). fp32 scores (parity mode) are numerically
        # unchanged — the scale multiply commutes with the no-op cast.
        scores = (scores * (1.0 / np.sqrt(Dh))).astype(cfg.attn_scores_dtype)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        attn = jnp.einsum("bhts,bshd->bthd", probs, v, preferred_element_type=jnp.float32)
        attn = attn.astype(x.dtype).reshape(B * N, D)
    if fused_linears:
        # quantize + int8 proj + LayerScale + residual in one dispatch
        from ..ops.vit_mlp import fused_ln_w8a8

        x = fused_ln_w8a8(
            attn, bp["proj_w"], bp["proj_b"], res=x,
            ls=bp["ls1"] if cfg.use_layerscale else None,
            interpret=interpret,
        )
    else:
        attn = matmul_t(attn, bp["proj_w"]) + bp["proj_b"]
        if cfg.use_layerscale:
            attn = attn * bp["ls1"]
        x = x + attn

    if (
        kernels_on
        and os.environ.get("OVLA_PALLAS_VITMLP", "1") == "1"
        and _pc_int8(bp["fc1_w"])
        and _pc_int8(bp["fc2_w"])
    ):
        # fused MLP half-block: LN2 + quantize + int8 fc1 + GELU + re-quantize
        # + int8 fc2 + LayerScale + residual in ONE dispatch — the [B*N, F]
        # intermediate never touches HBM (see ops/vit_mlp.py)
        from ..ops.vit_mlp import fused_mlp_residual

        ls2 = bp["ls2"] if cfg.use_layerscale else jnp.ones((D,), x.dtype)
        return fused_mlp_residual(
            x, bp["norm2_scale"], bp["norm2_bias"],
            bp["fc1_w"], bp["fc1_b"], bp["fc2_w"], bp["fc2_b"], ls2,
            eps=cfg.layer_norm_eps, act=cfg.act, interpret=interpret,
        )

    h = layer_norm(x, bp["norm2_scale"], bp["norm2_bias"], cfg.layer_norm_eps)
    h = _act(matmul_t(h, bp["fc1_w"]) + bp["fc1_b"], cfg.act)
    h = matmul_t(h, bp["fc2_w"]) + bp["fc2_b"]
    if cfg.use_layerscale:
        h = h * bp["ls2"]
    return x + h


def assemble_tokens(params: Params, cfg: ViTConfig, patches: jnp.ndarray) -> jnp.ndarray:
    """Prefix-token + positional-embedding assembly (timm conventions).

    no_embed_class=True (dinov2-reg4): pos added to patches only, prefix
    [cls, reg] prepended afterwards with no pos. Otherwise: pos covers
    [cls?, patches]; register tokens (if any) inserted after cls without pos.
    """
    B = patches.shape[0]
    pos = params["pos_embed"]
    if cfg.no_embed_class:
        x = patches + pos
        prefix = []
        if cfg.use_cls_token:
            prefix.append(jnp.broadcast_to(params["cls_token"], (B, 1, patches.shape[-1])))
        if cfg.num_register_tokens:
            prefix.append(jnp.broadcast_to(params["reg_token"], (B, cfg.num_register_tokens, patches.shape[-1])))
        if prefix:
            x = jnp.concatenate(prefix + [x], axis=1)
        return x
    if cfg.use_cls_token:
        cls = jnp.broadcast_to(params["cls_token"], (B, 1, patches.shape[-1]))
        x = jnp.concatenate([cls, patches], axis=1) + pos
        if cfg.num_register_tokens:
            # HF Dinov2WithRegisters convention (parity-tested vs HF): pos
            # embed over [cls, patches] FIRST, registers inserted after with
            # no positional embedding. timm reg-token models instead use
            # no_embed_class=True (the branch above); a timm checkpoint with
            # (reg>0, no_embed_class=False) would be a layout mismatch — see
            # the guard in params_from_timm.
            reg = jnp.broadcast_to(params["reg_token"], (B, cfg.num_register_tokens, patches.shape[-1]))
            x = jnp.concatenate([x[:, :1], reg, x[:, 1:]], axis=1)
        return x
    return patches + pos


def forward_features(
    params: Params,
    cfg: ViTConfig,
    pixels: jnp.ndarray,
    layer_index: int = -2,
) -> jnp.ndarray:
    """[B, 3, H, W] -> patch features [B, N, D] of block `layer_index`'s output
    (default second-to-last), prefix tokens dropped, NO final norm — the
    reference's get_intermediate_layers(-2) contract."""
    patches = embed_patches(params, cfg, pixels)
    x = assemble_tokens(params, cfg, patches)
    if cfg.pre_norm:
        x = layer_norm(x, params["norm_pre_scale"], params["norm_pre_bias"], cfg.layer_norm_eps)

    k = layer_index % cfg.num_layers  # -2 -> num_layers - 2; run blocks 0..k
    blocks_k = jax.tree.map(lambda a: a[: k + 1], params["blocks"])
    block = jax.checkpoint(_block, static_argnums=(0, 3, 4)) if cfg.remat else _block
    B, N, D = x.shape
    # flat [B*N, D] carry: one relayout in, one out (see _block docstring)
    x2, _ = jax.lax.scan(
        lambda c, bp: (block(cfg, bp, c, B, N), ()), x.reshape(B * N, D), blocks_k)
    x = x2.reshape(B, N, D)
    return x[:, cfg.num_prefix_tokens :, :]


# --- init + timm/HF-style weight import -------------------------------------

def init_params(cfg: ViTConfig, key: jax.Array) -> Params:
    ks = jax.random.split(key, 12)
    D, F, L, P = cfg.hidden_size, cfg.mlp_dim, cfg.num_layers, cfg.patch_size

    def nrm(k, shape, scale=0.02):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(cfg.dtype)

    n_pos = cfg.num_patches + (0 if (cfg.no_embed_class or not cfg.use_cls_token) else 1)
    p: Params = {
        "patch_embed": {"weight": nrm(ks[0], (D, 3 * P * P))},
        "pos_embed": nrm(ks[1], (1, n_pos, D)),
        "blocks": {
            "norm1_scale": jnp.ones((L, D), cfg.dtype),
            "norm1_bias": jnp.zeros((L, D), cfg.dtype),
            "qkv_w": nrm(ks[2], (L, 3 * D, D)),
            "qkv_b": jnp.zeros((L, 3 * D), cfg.dtype),
            "proj_w": nrm(ks[3], (L, D, D)),
            "proj_b": jnp.zeros((L, D), cfg.dtype),
            "norm2_scale": jnp.ones((L, D), cfg.dtype),
            "norm2_bias": jnp.zeros((L, D), cfg.dtype),
            "fc1_w": nrm(ks[4], (L, F, D)),
            "fc1_b": jnp.zeros((L, F), cfg.dtype),
            "fc2_w": nrm(ks[5], (L, D, F)),
            "fc2_b": jnp.zeros((L, D), cfg.dtype),
        },
    }
    if cfg.patch_bias:
        p["patch_embed"]["bias"] = jnp.zeros((D,), cfg.dtype)
    if cfg.use_cls_token:
        p["cls_token"] = nrm(ks[6], (1, 1, D))
    if cfg.num_register_tokens:
        p["reg_token"] = nrm(ks[7], (1, cfg.num_register_tokens, D))
    if cfg.use_layerscale:
        p["blocks"]["ls1"] = jnp.full((L, D), 1e-5, cfg.dtype)
        p["blocks"]["ls2"] = jnp.full((L, D), 1e-5, cfg.dtype)
    if cfg.pre_norm:
        p["norm_pre_scale"] = jnp.ones((D,), cfg.dtype)
        p["norm_pre_bias"] = jnp.zeros((D,), cfg.dtype)
    return p


_TIMM_BLOCK_KEYS = {
    "norm1.weight": "norm1_scale",
    "norm1.bias": "norm1_bias",
    "attn.qkv.weight": "qkv_w",
    "attn.qkv.bias": "qkv_b",
    "attn.proj.weight": "proj_w",
    "attn.proj.bias": "proj_b",
    "norm2.weight": "norm2_scale",
    "norm2.bias": "norm2_bias",
    "mlp.fc1.weight": "fc1_w",
    "mlp.fc1.bias": "fc1_b",
    "mlp.fc2.weight": "fc2_w",
    "mlp.fc2.bias": "fc2_b",
    "ls1.gamma": "ls1",
    "ls2.gamma": "ls2",
    # the HF export renames LayerScale gamma -> scale_factor
    # (modeling_prismatic.py:49-59 / convert script :83-115)
    "ls1.scale_factor": "ls1",
    "ls2.scale_factor": "ls2",
}


def params_from_timm(state: Dict[str, np.ndarray], cfg: ViTConfig, prefix: str = "") -> Params:
    """Map a timm VisionTransformer state dict (numpy) onto the stacked pytree."""
    if cfg.num_register_tokens and not cfg.no_embed_class and cfg.use_cls_token:
        # timm's reg-token models put pos_embed over [cls, reg, patches];
        # this config family implements the HF Dinov2WithRegisters layout
        # (pos over [cls, patches], registers inserted after) — a timm
        # checkpoint would load with a silently-wrong pos table
        raise NotImplementedError(
            "timm import for register tokens with no_embed_class=False is a "
            "positional-embedding layout mismatch; use no_embed_class=True "
            "(timm dinov2-reg convention) or the HF import path"
        )
    L = cfg.num_layers

    def get(k):
        return np.asarray(state[prefix + k])

    blocks: Dict[str, np.ndarray] = {}
    for timm_key, ours in _TIMM_BLOCK_KEYS.items():
        if f"{prefix}blocks.0.{timm_key}" not in state:
            continue
        per = [np.asarray(state[f"{prefix}blocks.{i}.{timm_key}"]) for i in range(L)]
        blocks[ours] = jnp.asarray(np.stack(per), cfg.dtype)
    p: Params = {
        "patch_embed": {
            "weight": jnp.asarray(
                get("patch_embed.proj.weight").reshape(cfg.hidden_size, -1), cfg.dtype
            )
        },
        "pos_embed": jnp.asarray(get("pos_embed"), cfg.dtype),
        "blocks": blocks,
    }
    if cfg.patch_bias:
        p["patch_embed"]["bias"] = jnp.asarray(get("patch_embed.proj.bias"), cfg.dtype)
    if cfg.use_cls_token:
        p["cls_token"] = jnp.asarray(get("cls_token"), cfg.dtype)
    if cfg.num_register_tokens:
        p["reg_token"] = jnp.asarray(get("reg_token"), cfg.dtype)
    if cfg.pre_norm:
        p["norm_pre_scale"] = jnp.asarray(get("norm_pre.weight"), cfg.dtype)
        p["norm_pre_bias"] = jnp.asarray(get("norm_pre.bias"), cfg.dtype)
    return p
