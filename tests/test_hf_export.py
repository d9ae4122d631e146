"""Reference-complete HF export (VERDICT r3 missing #3).

The reference converter (vla-scripts/extern/convert_openvla_weights_to_hf.py:
243-250) emits an HF dir a torch user can load directly: sharded weights +
OpenVLAConfig config.json + PrismaticImageProcessor/PrismaticProcessor
sidecars + tokenizer files + dataset_statistics.json. These tests prove our
`scripts/convert_weights_to_hf.py` now produces that complete layout, and —
the round-trip contract — that a PURE-TORCH consumer reconstructing the
model from our exported safetensors gets token-equal greedy decodes.
"""

import json
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openvla_probe_tpu.models import hf_export, llama, projector, vit, vla, vlm
from openvla_probe_tpu.models import catalog
from openvla_probe_tpu.ops.image import ImageTransformConfig

from hf_convert import load_hf_export_into_twin, projector_params_to_torch

VOCAB = 512
A_DIM = 7

REQUIRED_CONFIG_KEYS = [
    # the OpenVLAConfig field set (configuration_prismatic.py:72-141) that
    # the reference's __init__ persists — a torch-side from_pretrained
    # reconstructs the model from exactly these
    "model_type", "vision_backbone_id", "llm_backbone_id", "arch_specifier",
    "use_fused_vision_backbone", "image_resize_strategy", "timm_model_ids",
    "timm_override_act_layers", "image_sizes", "hf_llm_id", "llm_max_length",
    "pad_token_id", "pad_to_multiple_of", "output_projector_states",
    "text_config", "n_action_bins", "norm_stats",
]


def test_converter_script_writes_reference_complete_dir(tmp_path):
    """Drive the REAL script entrypoint over a tiny orbax run dir and check
    every file of the reference export layout exists with the right schema."""
    # namespace-package import — putting scripts/ itself on sys.path would
    # shadow stdlib `profile` with scripts/profile.py and poison transformers'
    # lazy import machinery for every later test in the process
    from scripts import convert_weights_to_hf as script

    from openvla_probe_tpu.training import checkpointing as ckpt

    cfg, _, _ = catalog.build_vlm_config(
        "dinosiglip-tiny-28px", "llama-tiny", "no-align+fused-gelu-mlp",
        "resize-naive")
    params = vlm.init_params(cfg, jax.random.key(0))
    run = tmp_path / "run"
    ckpt.save_checkpoint(run, {"params": params}, step=10)
    stats = {"bridge_orig": {"action": {"q01": [-1.0] * 7, "q99": [1.0] * 7,
                                        "mask": [True] * 6 + [False]}}}
    (run / "dataset_statistics.json").write_text(json.dumps(stats))

    # a local "tokenizer dir" fixture (zero egress): files the reference's
    # save_pretrained would produce
    tok_src = tmp_path / "tok"
    tok_src.mkdir()
    (tok_src / "tokenizer.json").write_text("{\"version\": \"1.0\"}")
    (tok_src / "tokenizer_config.json").write_text(
        json.dumps({"tokenizer_class": "LlamaTokenizerFast"}))
    (tok_src / "special_tokens_map.json").write_text(json.dumps({"bos_token": "<s>"}))

    out = tmp_path / "export"
    script.main(script.HFConvertConfig(
        run_dir=str(run), output_dir=str(out),
        vision_backbone_id="dinosiglip-tiny-28px", llm_backbone_id="llama-tiny",
        tokenizer_path=str(tok_src)))

    for name in ("model.safetensors", "config.json", "preprocessor_config.json",
                 "processor_config.json", "tokenizer.json",
                 "tokenizer_config.json", "special_tokens_map.json",
                 "dataset_statistics.json"):
        assert (out / name).exists(), f"export missing {name}"

    hf_cfg = json.loads((out / "config.json").read_text())
    for key in REQUIRED_CONFIG_KEYS:
        assert key in hf_cfg, f"config.json missing OpenVLAConfig field {key}"
    assert hf_cfg["model_type"] == "openvla"
    assert hf_cfg["norm_stats"] == stats
    assert hf_cfg["text_config"]["vocab_size"] == cfg.llm.vocab_size
    assert hf_cfg["text_config"]["model_type"] == "llama"
    assert hf_cfg["use_fused_vision_backbone"] is True

    pp = json.loads((out / "preprocessor_config.json").read_text())
    assert pp["image_processor_type"] == "PrismaticImageProcessor"
    assert pp["input_sizes"] == [[3, 28, 28], [3, 28, 28]]
    assert pp["means"][1] == [0.5, 0.5, 0.5]  # SigLIP tower norm

    proc = json.loads((out / "processor_config.json").read_text())
    assert proc["processor_class"] == "PrismaticProcessor"

    # the exported dir also still loads through OUR loader (HF layout)
    from openvla_probe_tpu.models import load as load_mod

    bundle = load_mod.load(out)
    for g, w in zip(jax.tree.leaves(bundle["params"]), jax.tree.leaves(params)):
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(w, np.float32), atol=2e-2)


def test_preprocessor_config_matches_reference_for_dinosiglip224():
    """Exact values the reference PrismaticImageProcessor persists for the
    OpenVLA backbone (processing_prismatic.py:96-124, resize-naive)."""
    pp = hf_export.build_preprocessor_config(
        ImageTransformConfig.dinosiglip_224(), "resize-naive")
    assert pp["use_fused_vision_backbone"] is True
    assert pp["interpolations"] == ["bicubic", "bicubic"]
    # resize-naive: size becomes the (h, w) pair; bicubic == PIL code 3
    assert pp["tvf_resize_params"][0] == {
        "size": [224, 224], "interpolation": 3, "max_size": None,
        "antialias": True}
    assert pp["tvf_crop_params"] == [{"output_size": [224, 224]}] * 2
    assert pp["tvf_normalize_params"][0]["mean"] == [0.485, 0.456, 0.406]
    assert pp["tvf_do_letterbox"] is False and pp["tvf_letterbox_fill"] is None

    # letterbox strategy flips the pad flags with the mean-derived fill
    pp_lb = hf_export.build_preprocessor_config(
        ImageTransformConfig.dinosiglip_224("letterbox"), "letterbox")
    assert pp_lb["tvf_do_letterbox"] is True
    assert pp_lb["tvf_letterbox_fill"] == [127, 127, 127]


def test_full_scale_config_uses_published_tables():
    cfg, _, _ = catalog.build_vlm_config()
    hf_cfg = hf_export.build_hf_config(
        cfg, "dinosiglip-vit-so-224px", "llama2-7b-pure",
        "no-align+fused-gelu-mlp", "resize-naive")
    assert hf_cfg["timm_model_ids"] == ["vit_large_patch14_reg4_dinov2.lvd142m",
                                        "vit_so400m_patch14_siglip_224"]
    assert hf_cfg["image_sizes"] == [224, 224]
    assert hf_cfg["hf_llm_id"] == "meta-llama/Llama-2-7b-hf"
    assert hf_cfg["pad_token_id"] == 32000 and hf_cfg["pad_to_multiple_of"] == 64
    assert hf_cfg["text_config"]["hidden_size"] == 4096
    assert hf_cfg["auto_map"]["AutoModelForVision2Seq"] == (
        "modeling_prismatic.OpenVLAForActionPrediction")


@pytest.fixture(scope="module")
def twin_cfg():
    """Tiny config whose towers have EXACT HF-transformers twins (the
    test_vla_e2e conventions: HF dinov2 pos-embed over [cls, patches])."""
    return vlm.VLMConfig(
        llm=llama.LlamaConfig.tiny(vocab_size=VOCAB),
        vision=(
            vit.ViTConfig(image_size=28, patch_size=14, hidden_size=32,
                          num_layers=3, num_heads=2, mlp_dim=64,
                          use_cls_token=True, num_register_tokens=2,
                          no_embed_class=False, use_layerscale=True, act="gelu"),
            vit.ViTConfig(image_size=28, patch_size=14, hidden_size=32,
                          num_layers=3, num_heads=2, mlp_dim=64,
                          use_cls_token=False, act="gelu_tanh"),
        ),
    )


def test_torch_twin_consumes_export_token_equal(twin_cfg, tmp_path):
    """OUR weights -> exported safetensors -> FRESH torch modules -> greedy
    decode must be token-equal with our serving path. This is the direction
    the reference ecosystem exercises: load the export, run the model."""
    import torch
    from safetensors.numpy import load_file, save_file
    from transformers import (
        Dinov2WithRegistersConfig,
        Dinov2WithRegistersModel,
        LlamaConfig as HFLlamaConfig,
        LlamaForCausalLM,
        SiglipVisionConfig,
        SiglipVisionModel,
    )

    from test_vla_e2e import torch_predict_action

    cfg = twin_cfg
    params = vlm.init_params(cfg, jax.random.key(11))

    # export through the same path the script uses
    state = catalog.params_to_hf_state(params, cfg)
    save_file(state, str(tmp_path / "model.safetensors"))
    loaded = load_file(str(tmp_path / "model.safetensors"))

    # FRESH torch modules (random init — every weight must come from the file)
    torch.manual_seed(0)
    hf_llama = LlamaForCausalLM(HFLlamaConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256, rms_norm_eps=1e-5,
        attn_implementation="eager", tie_word_embeddings=False)).eval()
    hf_dino = Dinov2WithRegistersModel(Dinov2WithRegistersConfig(
        hidden_size=32, mlp_ratio=2,  # HF dinov2 sizes MLP via ratio: 32*2=64
        num_hidden_layers=3,
        num_attention_heads=2, image_size=28, patch_size=14,
        num_register_tokens=2, layerscale_value=1.0, hidden_act="gelu",
        layer_norm_eps=1e-6)).eval()
    hf_siglip = SiglipVisionModel(SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=2, image_size=28, patch_size=14,
        hidden_act="gelu_pytorch_tanh", layer_norm_eps=1e-6)).eval()
    torch_proj = projector_params_to_torch(
        projector.init_params("fused-gelu-mlp", 64, 64, jax.random.key(99)),
        "fused-gelu-mlp")  # wrong weights on purpose; loader must overwrite

    load_hf_export_into_twin(loaded, hf_llama, hf_dino, hf_siglip, torch_proj)

    r = np.random.default_rng(5)
    pixels = r.normal(size=(1, 6, 28, 28)).astype(np.float32)
    ids = np.array([[1, 17, 202, 33, 47, 211]], np.int64)
    q01 = r.uniform(-2, 0, A_DIM).astype(np.float32)
    q99 = r.uniform(0.5, 2, A_DIM).astype(np.float32)
    mask = np.array([True] * (A_DIM - 1) + [False])

    want_toks, want_actions = torch_predict_action(
        hf_llama, hf_dino, hf_siglip, torch_proj, pixels, ids, q01, q99, mask)

    serving = vla.VLAServingConfig(vlm=cfg, action_dim=A_DIM,
                                   prompt_pad_len=16, codec_vocab_size=VOCAB)
    P = serving.prompt_pad_len
    padded = np.zeros((1, P), np.int32)
    padded[0, :ids.shape[1]] = ids[0]
    out = vla.predict_action_core(
        params, serving, jnp.asarray(pixels), jnp.asarray(padded),
        prompt_len=jnp.asarray([ids.shape[1]], jnp.int32),
        q01=jnp.asarray(q01), q99=jnp.asarray(q99),
        action_mask=jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(out["action_tokens"]), want_toks)
    np.testing.assert_allclose(np.asarray(out["actions"]), want_actions,
                               atol=1e-5, rtol=1e-4)
