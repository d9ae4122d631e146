"""Test helpers: convert HF torch modules -> openvla_probe_tpu param pytrees.

Used to parity-test against torch reference twins on tiny configs.
"""

import numpy as np

import jax.numpy as jnp


def _np(t):
    return t.detach().numpy()


def _stack(ts):
    return jnp.asarray(np.stack([_np(t) for t in ts]))


def siglip_to_params(model):
    m = model.vision_model
    layers = m.encoder.layers
    D = m.config.hidden_size
    return {
        "patch_embed": {
            "weight": jnp.asarray(_np(m.embeddings.patch_embedding.weight).reshape(D, -1)),
            "bias": jnp.asarray(_np(m.embeddings.patch_embedding.bias)),
        },
        "pos_embed": jnp.asarray(_np(m.embeddings.position_embedding.weight))[None],
        "blocks": {
            "norm1_scale": _stack([l.layer_norm1.weight for l in layers]),
            "norm1_bias": _stack([l.layer_norm1.bias for l in layers]),
            "qkv_w": jnp.asarray(np.stack([
                np.concatenate([_np(l.self_attn.q_proj.weight),
                                _np(l.self_attn.k_proj.weight),
                                _np(l.self_attn.v_proj.weight)]) for l in layers])),
            "qkv_b": jnp.asarray(np.stack([
                np.concatenate([_np(l.self_attn.q_proj.bias),
                                _np(l.self_attn.k_proj.bias),
                                _np(l.self_attn.v_proj.bias)]) for l in layers])),
            "proj_w": _stack([l.self_attn.out_proj.weight for l in layers]),
            "proj_b": _stack([l.self_attn.out_proj.bias for l in layers]),
            "norm2_scale": _stack([l.layer_norm2.weight for l in layers]),
            "norm2_bias": _stack([l.layer_norm2.bias for l in layers]),
            "fc1_w": _stack([l.mlp.fc1.weight for l in layers]),
            "fc1_b": _stack([l.mlp.fc1.bias for l in layers]),
            "fc2_w": _stack([l.mlp.fc2.weight for l in layers]),
            "fc2_b": _stack([l.mlp.fc2.bias for l in layers]),
        },
    }


def dinov2_to_params(model):
    layers = model.encoder.layer
    emb = model.embeddings
    D = model.config.hidden_size
    return {
        "patch_embed": {
            "weight": jnp.asarray(_np(emb.patch_embeddings.projection.weight).reshape(D, -1)),
            "bias": jnp.asarray(_np(emb.patch_embeddings.projection.bias)),
        },
        "pos_embed": jnp.asarray(_np(emb.position_embeddings)),
        "cls_token": jnp.asarray(_np(emb.cls_token)),
        "reg_token": jnp.asarray(_np(emb.register_tokens)),
        "blocks": {
            "norm1_scale": _stack([l.norm1.weight for l in layers]),
            "norm1_bias": _stack([l.norm1.bias for l in layers]),
            "qkv_w": jnp.asarray(np.stack([
                np.concatenate([_np(l.attention.attention.query.weight),
                                _np(l.attention.attention.key.weight),
                                _np(l.attention.attention.value.weight)]) for l in layers])),
            "qkv_b": jnp.asarray(np.stack([
                np.concatenate([_np(l.attention.attention.query.bias),
                                _np(l.attention.attention.key.bias),
                                _np(l.attention.attention.value.bias)]) for l in layers])),
            "proj_w": _stack([l.attention.output.dense.weight for l in layers]),
            "proj_b": _stack([l.attention.output.dense.bias for l in layers]),
            "norm2_scale": _stack([l.norm2.weight for l in layers]),
            "norm2_bias": _stack([l.norm2.bias for l in layers]),
            "fc1_w": _stack([l.mlp.fc1.weight for l in layers]),
            "fc1_b": _stack([l.mlp.fc1.bias for l in layers]),
            "fc2_w": _stack([l.mlp.fc2.weight for l in layers]),
            "fc2_b": _stack([l.mlp.fc2.bias for l in layers]),
            "ls1": _stack([l.layer_scale1.lambda1 for l in layers]),
            "ls2": _stack([l.layer_scale2.lambda1 for l in layers]),
        },
    }


def projector_params_to_torch(params, arch="fused-gelu-mlp"):
    """Build the torch twin of our projector with identical weights."""
    import torch
    import torch.nn as nn

    def lin(p):
        w = np.asarray(p["w"], np.float32)
        layer = nn.Linear(w.shape[1], w.shape[0])
        with torch.no_grad():
            layer.weight.copy_(torch.tensor(w))
            layer.bias.copy_(torch.tensor(np.asarray(p["b"], np.float32)))
        return layer

    if arch.endswith("fused-gelu-mlp"):
        return nn.Sequential(lin(params["fc1"]), nn.GELU(), lin(params["fc2"]),
                             nn.GELU(), lin(params["fc3"]))
    if arch.endswith("gelu-mlp"):
        return nn.Sequential(lin(params["fc1"]), nn.GELU(), lin(params["fc2"]))
    return nn.Sequential(lin(params["fc1"]))
