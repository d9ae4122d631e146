"""Config system, catalog resolution, and HF-checkpoint loading tests."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from openvla_probe_tpu.conf.registry import parse_config, wrap
from openvla_probe_tpu.conf.vla import VLAConfig
from openvla_probe_tpu.conf.models import ModelConfig
from openvla_probe_tpu.models import catalog, llama, load as load_mod, vit, vlm


def test_parse_defaults():
    cfg = parse_config(VLAConfig, [])
    assert cfg.data_mix == "bridge"
    assert cfg.per_device_batch_size == 32


def test_parse_overrides_nested_and_types():
    cfg = parse_config(VLAConfig, [
        "--learning_rate", "1e-4", "--max_steps", "5000",
        "--image_aug", "true", "--data_mix=libero_object_no_noops",
    ])
    assert cfg.learning_rate == pytest.approx(1e-4)
    assert cfg.max_steps == 5000
    assert cfg.image_aug is True
    assert cfg.data_mix == "libero_object_no_noops"


def test_parse_choice_swap():
    cfg = parse_config(VLAConfig, ["--type", "prism-dinosiglip-224px+mx-libero-object",
                                   "--learning_rate", "5e-4"])
    assert cfg.vla_id == "prism-dinosiglip-224px+mx-libero-object"
    assert cfg.data_mix == "libero_object_no_noops"
    assert cfg.learning_rate == pytest.approx(5e-4)


def test_registry_choices():
    names = VLAConfig.get_choice_names()
    assert "prism-dinosiglip-224px+mx-oxe-magic-soup-plus" in names
    assert "siglip-224px+7b" in ModelConfig.get_choice_names()


def test_wrap_decorator():
    captured = {}

    @wrap(VLAConfig)
    def main(cfg):
        captured["cfg"] = cfg

    main.inner(parse_config(VLAConfig, ["--epochs", "3"]))
    assert captured["cfg"].epochs == 3


def test_catalog_dinosiglip_resolution():
    cfg, img_cfg, prompt_cls = catalog.build_vlm_config(dtype=jnp.float32)
    assert cfg.vision_names == ("dino", "siglip")
    assert cfg.vision[0].num_register_tokens == 4
    assert cfg.vision[1].hidden_size == 1152
    assert cfg.vision_dim == 1024 + 1152
    assert len(img_cfg.specs) == 2
    assert img_cfg.specs[0].mean != img_cfg.specs[1].mean


def test_model_registry_surface():
    assert "openvla-7b" in load_mod.available_models()
    assert "OpenVLA" in load_mod.get_model_description("openvla-7b")
    with pytest.raises(ValueError):
        load_mod.get_model_description("nope")


def test_hf_checkpoint_roundtrip(tmp_path):
    """Synthesize a tiny HF-layout checkpoint and load it end-to-end."""
    import torch
    from safetensors.numpy import save_file

    # tiny configs matching the catalog schema
    tiny_vit_kw = dict(image_size=28, patch_size=14, hidden_size=32, num_layers=3,
                       num_heads=2, mlp_dim=64)
    dino_cfg = vit.ViTConfig(**tiny_vit_kw, use_cls_token=True, num_register_tokens=4,
                             no_embed_class=True, use_layerscale=True)
    sig_cfg = vit.ViTConfig(**tiny_vit_kw, use_cls_token=False, act="gelu_tanh")
    lcfg = llama.LlamaConfig.tiny(vocab_size=128)
    cfg = vlm.VLMConfig(llm=lcfg, vision=(dino_cfg, sig_cfg))

    g = np.random.default_rng(0)

    def timm_vit_state(prefix, c):
        s = {}
        D, P, L, F = c.hidden_size, c.patch_size, c.num_layers, c.mlp_dim
        s[f"{prefix}patch_embed.proj.weight"] = g.normal(size=(D, 3, P, P)).astype(np.float32)
        s[f"{prefix}patch_embed.proj.bias"] = g.normal(size=(D,)).astype(np.float32)
        n_pos = c.num_patches + (0 if (c.no_embed_class or not c.use_cls_token) else 1)
        s[f"{prefix}pos_embed"] = g.normal(size=(1, n_pos, D)).astype(np.float32)
        if c.use_cls_token:
            s[f"{prefix}cls_token"] = g.normal(size=(1, 1, D)).astype(np.float32)
        if c.num_register_tokens:
            s[f"{prefix}reg_token"] = g.normal(size=(1, c.num_register_tokens, D)).astype(np.float32)
        for i in range(L):
            for k, shape in [
                ("norm1.weight", (D,)), ("norm1.bias", (D,)),
                ("attn.qkv.weight", (3 * D, D)), ("attn.qkv.bias", (3 * D,)),
                ("attn.proj.weight", (D, D)), ("attn.proj.bias", (D,)),
                ("norm2.weight", (D,)), ("norm2.bias", (D,)),
                ("mlp.fc1.weight", (F, D)), ("mlp.fc1.bias", (F,)),
                ("mlp.fc2.weight", (D, F)), ("mlp.fc2.bias", (D,)),
            ]:
                s[f"{prefix}blocks.{i}.{k}"] = g.normal(size=shape).astype(np.float32)
            if c.use_layerscale:
                # HF export renames gamma -> scale_factor
                s[f"{prefix}blocks.{i}.ls1.scale_factor"] = g.normal(size=(D,)).astype(np.float32)
                s[f"{prefix}blocks.{i}.ls2.scale_factor"] = g.normal(size=(D,)).astype(np.float32)
        return s

    state = {}
    state.update(timm_vit_state("vision_backbone.featurizer.", dino_cfg))
    state.update(timm_vit_state("vision_backbone.fused_featurizer.", sig_cfg))
    V, Dl = lcfg.vocab_size, lcfg.hidden_size
    vd = cfg.vision_dim
    for fc, (o, i) in [("fc1", (vd * 4, vd)), ("fc2", (Dl, vd * 4)), ("fc3", (Dl, Dl))]:
        state[f"projector.{fc}.weight"] = g.normal(size=(o, i)).astype(np.float32)
        state[f"projector.{fc}.bias"] = g.normal(size=(o,)).astype(np.float32)
    state["language_model.model.embed_tokens.weight"] = g.normal(size=(V, Dl)).astype(np.float32)
    state["language_model.model.norm.weight"] = np.ones(Dl, np.float32)
    state["language_model.lm_head.weight"] = g.normal(size=(V, Dl)).astype(np.float32)
    for i in range(lcfg.num_hidden_layers):
        for k, shape in [
            ("self_attn.q_proj.weight", (Dl, Dl)), ("self_attn.k_proj.weight", (Dl, Dl)),
            ("self_attn.v_proj.weight", (Dl, Dl)), ("self_attn.o_proj.weight", (Dl, Dl)),
            ("mlp.gate_proj.weight", (lcfg.intermediate_size, Dl)),
            ("mlp.up_proj.weight", (lcfg.intermediate_size, Dl)),
            ("mlp.down_proj.weight", (Dl, lcfg.intermediate_size)),
            ("input_layernorm.weight", (Dl,)), ("post_attention_layernorm.weight", (Dl,)),
        ]:
            state[f"language_model.model.layers.{i}.{k}"] = g.normal(size=shape).astype(np.float32)

    save_file(state, str(tmp_path / "model.safetensors"))
    params = catalog.params_from_hf_state(state, cfg)
    assert params["vision"]["dino"]["blocks"]["ls1"].shape == (3, 32)
    assert params["projector"]["fc1"]["w"].shape == (vd * 4, vd)
    assert params["llm"]["layers"]["q_proj"].shape == (4, Dl, Dl)

    # forward runs with the imported weights
    out = vlm.forward(
        params, cfg,
        input_ids=jnp.asarray([[1, 5, 9]]), attn_mask=jnp.ones((1, 3), jnp.int32),
        pixel_values=jnp.asarray(g.normal(size=(1, 6, 28, 28)).astype(np.float32)),
    )
    # spliced length = input tokens (3, incl. BOS) + patches (4)
    assert out["logits"].shape == (1, 3 + dino_cfg.num_patches, V)
