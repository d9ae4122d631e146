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


def _t(arr):
    import torch

    return torch.tensor(np.asarray(arr, np.float32))


def _subdict(state, prefix):
    return {k[len(prefix):]: v for k, v in state.items() if k.startswith(prefix)}


def load_hf_export_into_twin(state, hf_llama, hf_dino, hf_siglip, torch_proj):
    """Consume OUR HF export (params_to_hf_state key layout == the reference
    converter's remap_state_dicts_for_hf schema) into torch twin modules —
    the torch-ecosystem direction of the round trip. The vision keys are
    timm-format (fused qkv, ls*.scale_factor); this performs the same
    timm->transformers split the reference's HF modeling code embeds."""
    import torch

    with torch.no_grad():
        # --- LLM: keys match HF LlamaForCausalLM verbatim ---
        llm_sd = {k: _t(v) for k, v in _subdict(state, "language_model.").items()}
        missing, unexpected = hf_llama.load_state_dict(llm_sd, strict=False)
        # rotary inv_freq is a non-persistent buffer in modern transformers
        assert not unexpected, f"unexpected LLM keys: {unexpected}"
        assert all("inv_freq" in k for k in missing), f"missing LLM keys: {missing}"

        # --- projector: fc1/fc2/fc3 -> Sequential [0, 2, 4] ---
        proj = _subdict(state, "projector.")
        for fc, idx in (("fc1", 0), ("fc2", 2), ("fc3", 4)):
            if f"{fc}.weight" in proj:
                torch_proj[idx].weight.copy_(_t(proj[f"{fc}.weight"]))
                torch_proj[idx].bias.copy_(_t(proj[f"{fc}.bias"]))

        # --- DINOv2 featurizer (timm layout -> Dinov2WithRegistersModel) ---
        d = _subdict(state, "vision_backbone.featurizer.")
        emb = hf_dino.embeddings
        emb.patch_embeddings.projection.weight.copy_(_t(d["patch_embed.proj.weight"]))
        emb.patch_embeddings.projection.bias.copy_(_t(d["patch_embed.proj.bias"]))
        emb.position_embeddings.copy_(_t(d["pos_embed"]))
        emb.cls_token.copy_(_t(d["cls_token"]))
        emb.register_tokens.copy_(_t(d["reg_token"]))
        for i, l in enumerate(hf_dino.encoder.layer):
            qkv_w, qkv_b = _t(d[f"blocks.{i}.attn.qkv.weight"]), _t(d[f"blocks.{i}.attn.qkv.bias"])
            D = qkv_w.shape[0] // 3
            att = l.attention.attention
            for j, lin in enumerate((att.query, att.key, att.value)):
                lin.weight.copy_(qkv_w[j * D:(j + 1) * D])
                lin.bias.copy_(qkv_b[j * D:(j + 1) * D])
            l.attention.output.dense.weight.copy_(_t(d[f"blocks.{i}.attn.proj.weight"]))
            l.attention.output.dense.bias.copy_(_t(d[f"blocks.{i}.attn.proj.bias"]))
            l.norm1.weight.copy_(_t(d[f"blocks.{i}.norm1.weight"]))
            l.norm1.bias.copy_(_t(d[f"blocks.{i}.norm1.bias"]))
            l.norm2.weight.copy_(_t(d[f"blocks.{i}.norm2.weight"]))
            l.norm2.bias.copy_(_t(d[f"blocks.{i}.norm2.bias"]))
            l.mlp.fc1.weight.copy_(_t(d[f"blocks.{i}.mlp.fc1.weight"]))
            l.mlp.fc1.bias.copy_(_t(d[f"blocks.{i}.mlp.fc1.bias"]))
            l.mlp.fc2.weight.copy_(_t(d[f"blocks.{i}.mlp.fc2.weight"]))
            l.mlp.fc2.bias.copy_(_t(d[f"blocks.{i}.mlp.fc2.bias"]))
            l.layer_scale1.lambda1.copy_(_t(d[f"blocks.{i}.ls1.scale_factor"]))
            l.layer_scale2.lambda1.copy_(_t(d[f"blocks.{i}.ls2.scale_factor"]))

        # --- SigLIP fused featurizer (timm layout -> SiglipVisionModel) ---
        s = _subdict(state, "vision_backbone.fused_featurizer.")
        m = hf_siglip.vision_model
        D = m.config.hidden_size
        m.embeddings.patch_embedding.weight.copy_(_t(s["patch_embed.proj.weight"]))
        m.embeddings.patch_embedding.bias.copy_(_t(s["patch_embed.proj.bias"]))
        m.embeddings.position_embedding.weight.copy_(_t(s["pos_embed"])[0])
        for i, l in enumerate(m.encoder.layers):
            qkv_w, qkv_b = _t(s[f"blocks.{i}.attn.qkv.weight"]), _t(s[f"blocks.{i}.attn.qkv.bias"])
            for j, lin in enumerate((l.self_attn.q_proj, l.self_attn.k_proj, l.self_attn.v_proj)):
                lin.weight.copy_(qkv_w[j * D:(j + 1) * D])
                lin.bias.copy_(qkv_b[j * D:(j + 1) * D])
            l.self_attn.out_proj.weight.copy_(_t(s[f"blocks.{i}.attn.proj.weight"]))
            l.self_attn.out_proj.bias.copy_(_t(s[f"blocks.{i}.attn.proj.bias"]))
            l.layer_norm1.weight.copy_(_t(s[f"blocks.{i}.norm1.weight"]))
            l.layer_norm1.bias.copy_(_t(s[f"blocks.{i}.norm1.bias"]))
            l.layer_norm2.weight.copy_(_t(s[f"blocks.{i}.norm2.weight"]))
            l.layer_norm2.bias.copy_(_t(s[f"blocks.{i}.norm2.bias"]))
            l.mlp.fc1.weight.copy_(_t(s[f"blocks.{i}.mlp.fc1.weight"]))
            l.mlp.fc1.bias.copy_(_t(s[f"blocks.{i}.mlp.fc1.bias"]))
            l.mlp.fc2.weight.copy_(_t(s[f"blocks.{i}.mlp.fc2.weight"]))
            l.mlp.fc2.bias.copy_(_t(s[f"blocks.{i}.mlp.fc2.bias"]))


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
