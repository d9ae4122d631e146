"""Parity tests: functional ViT vs HF SiglipVisionModel / Dinov2WithRegistersModel.

Validates the load-bearing feature contract — patch tokens of the
second-to-last block, no final norm, prefix dropped — plus both positional-
embedding conventions and LayerScale.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from openvla_probe_tpu.models import vit


def _stack(tensors):
    return jnp.asarray(np.stack([t.detach().numpy() for t in tensors]))


@pytest.fixture(scope="module")
def siglip_pair():
    import torch
    from transformers import SiglipVisionConfig, SiglipVisionModel

    torch.manual_seed(0)
    hf_cfg = SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=2, image_size=28, patch_size=14,
        hidden_act="gelu_pytorch_tanh", layer_norm_eps=1e-6,
    )
    model = SiglipVisionModel(hf_cfg).eval()
    cfg = vit.ViTConfig(
        image_size=28, patch_size=14, hidden_size=32, num_layers=3, num_heads=2,
        mlp_dim=64, use_cls_token=False, act="gelu_tanh",
    )

    m = model.vision_model
    layers = m.encoder.layers
    blocks = {
        "norm1_scale": _stack([l.layer_norm1.weight for l in layers]),
        "norm1_bias": _stack([l.layer_norm1.bias for l in layers]),
        "qkv_w": jnp.asarray(np.stack([
            np.concatenate([
                l.self_attn.q_proj.weight.detach().numpy(),
                l.self_attn.k_proj.weight.detach().numpy(),
                l.self_attn.v_proj.weight.detach().numpy(),
            ]) for l in layers
        ])),
        "qkv_b": jnp.asarray(np.stack([
            np.concatenate([
                l.self_attn.q_proj.bias.detach().numpy(),
                l.self_attn.k_proj.bias.detach().numpy(),
                l.self_attn.v_proj.bias.detach().numpy(),
            ]) for l in layers
        ])),
        "proj_w": _stack([l.self_attn.out_proj.weight for l in layers]),
        "proj_b": _stack([l.self_attn.out_proj.bias for l in layers]),
        "norm2_scale": _stack([l.layer_norm2.weight for l in layers]),
        "norm2_bias": _stack([l.layer_norm2.bias for l in layers]),
        "fc1_w": _stack([l.mlp.fc1.weight for l in layers]),
        "fc1_b": _stack([l.mlp.fc1.bias for l in layers]),
        "fc2_w": _stack([l.mlp.fc2.weight for l in layers]),
        "fc2_b": _stack([l.mlp.fc2.bias for l in layers]),
    }
    params = {
        "patch_embed": {
            "weight": jnp.asarray(
                m.embeddings.patch_embedding.weight.detach().numpy().reshape(32, -1)
            ),
            "bias": jnp.asarray(m.embeddings.patch_embedding.bias.detach().numpy()),
        },
        "pos_embed": jnp.asarray(m.embeddings.position_embedding.weight.detach().numpy())[None],
        "blocks": blocks,
    }
    return model, cfg, params


def test_siglip_second_to_last_features(siglip_pair, rng):
    import torch

    model, cfg, params = siglip_pair
    px = rng.normal(size=(2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        hs = model(pixel_values=torch.tensor(px), output_hidden_states=True).hidden_states
    want = hs[-2].numpy()  # output of block index L-2 (no final norm)

    got = np.asarray(vit.forward_features(params, cfg, jnp.asarray(px), layer_index=-2))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_siglip_other_layer_index(siglip_pair, rng):
    import torch

    model, cfg, params = siglip_pair
    px = rng.normal(size=(1, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        hs = model(pixel_values=torch.tensor(px), output_hidden_states=True).hidden_states
    got = np.asarray(vit.forward_features(params, cfg, jnp.asarray(px), layer_index=0))
    np.testing.assert_allclose(got, hs[1].numpy(), atol=2e-5, rtol=1e-4)


@pytest.fixture(scope="module")
def dinov2_pair():
    import torch
    from transformers import Dinov2WithRegistersConfig, Dinov2WithRegistersModel

    torch.manual_seed(1)
    hf_cfg = Dinov2WithRegistersConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=2, image_size=28, patch_size=14,
        num_register_tokens=2, layerscale_value=1.0, hidden_act="gelu",
        layer_norm_eps=1e-6,
    )
    model = Dinov2WithRegistersModel(hf_cfg).eval()
    # HF convention: pos embed over [cls, patches] BEFORE register insertion
    cfg = vit.ViTConfig(
        image_size=28, patch_size=14, hidden_size=32, num_layers=3, num_heads=2,
        mlp_dim=64, use_cls_token=True, num_register_tokens=2,
        no_embed_class=False, use_layerscale=True, act="gelu",
    )
    layers = model.encoder.layer
    blocks = {
        "norm1_scale": _stack([l.norm1.weight for l in layers]),
        "norm1_bias": _stack([l.norm1.bias for l in layers]),
        "qkv_w": jnp.asarray(np.stack([
            np.concatenate([
                l.attention.attention.query.weight.detach().numpy(),
                l.attention.attention.key.weight.detach().numpy(),
                l.attention.attention.value.weight.detach().numpy(),
            ]) for l in layers
        ])),
        "qkv_b": jnp.asarray(np.stack([
            np.concatenate([
                l.attention.attention.query.bias.detach().numpy(),
                l.attention.attention.key.bias.detach().numpy(),
                l.attention.attention.value.bias.detach().numpy(),
            ]) for l in layers
        ])),
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
    }
    emb = model.embeddings
    params = {
        "patch_embed": {
            "weight": jnp.asarray(
                emb.patch_embeddings.projection.weight.detach().numpy().reshape(32, -1)
            ),
            "bias": jnp.asarray(emb.patch_embeddings.projection.bias.detach().numpy()),
        },
        "pos_embed": jnp.asarray(emb.position_embeddings.detach().numpy()),
        "cls_token": jnp.asarray(emb.cls_token.detach().numpy()),
        "reg_token": jnp.asarray(emb.register_tokens.detach().numpy()),
        "blocks": blocks,
    }
    return model, cfg, params


def test_dinov2_second_to_last_features(dinov2_pair, rng):
    import torch

    model, cfg, params = dinov2_pair
    px = rng.normal(size=(2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        hs = model(pixel_values=torch.tensor(px), output_hidden_states=True).hidden_states
    # prefix = [cls, reg, reg]; features drop them
    want = hs[-2].numpy()[:, 3:, :]
    got = np.asarray(vit.forward_features(params, cfg, jnp.asarray(px), layer_index=-2))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_timm_no_embed_class_convention(rng):
    """timm dinov2-reg4 semantics: pos on patches only, prefix without pos."""
    cfg = vit.ViTConfig.tiny(num_register_tokens=2, no_embed_class=True, use_layerscale=True)
    import jax

    params = vit.init_params(cfg, jax.random.key(0))
    assert params["pos_embed"].shape == (1, cfg.num_patches, cfg.hidden_size)
    px = jnp.asarray(rng.normal(size=(1, 3, 28, 28)).astype(np.float32))
    feats = vit.forward_features(params, cfg, px)
    assert feats.shape == (1, cfg.num_patches, cfg.hidden_size)


def test_patchify_matches_conv(rng):
    """The patch-embed matmul == lax conv with stride=patch."""
    import jax

    cfg = vit.ViTConfig.tiny(use_cls_token=False)
    params = vit.init_params(cfg, jax.random.key(0))
    px = jnp.asarray(rng.normal(size=(2, 3, 28, 28)).astype(np.float32))
    got = vit.embed_patches(params, cfg, px)
    w = np.asarray(params["patch_embed"]["weight"]).reshape(cfg.hidden_size, 3, 14, 14)
    conv = jax.lax.conv_general_dilated(
        px, jnp.asarray(w), window_strides=(14, 14), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    conv = conv.reshape(2, cfg.hidden_size, -1).transpose(0, 2, 1) + params["patch_embed"]["bias"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(conv), atol=1e-5)
