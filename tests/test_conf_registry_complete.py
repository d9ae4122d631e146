"""Config-registry completeness: every registered variant materializes.

The reference registers 46 ModelConfig variants (prismatic/conf/models.py
ModelRegistry) and 11 VLAConfig variants (conf/vla.py VLARegistry). Every id
must (a) instantiate, (b) resolve its backbone ids through the catalog, and
(c) for VLA variants, resolve data_mix through the mixture registry and
base_vlm through the model registry.
"""

import pytest

from openvla_probe_tpu.conf.models import ModelConfig
from openvla_probe_tpu.conf.vla import VLAConfig
from openvla_probe_tpu.models import catalog
from openvla_probe_tpu.vla.datasets.rlds.oxe.mixtures import OXE_NAMED_MIXTURES

# the reference's 46 ModelRegistry ids (prismatic/conf/models.py:502-567)
REFERENCE_MODEL_IDS = [
    "reproduction-llava-v15+7b", "reproduction-llava-v15+13b",
    "one-stage+7b", "one-stage+13b",
    "full-ft-multi-stage+7b", "full-ft-one-stage+7b",
    "in1k-224px+7b", "dinov2-224px+7b", "clip-224px+7b", "siglip-224px+7b",
    "clip-336px-resize-crop+7b", "clip-336px-resize-naive+7b",
    "siglip-384px-letterbox+7b", "siglip-384px-resize-crop+7b",
    "siglip-384px-resize-naive+7b",
    "dinoclip-336px-letterbox+7b", "dinoclip-336px-resize-naive+7b",
    "dinosiglip-384px-letterbox+7b", "dinosiglip-384px-resize-naive+7b",
    "llama2+7b", "llama2+13b", "llama2-chat+7b", "llama2-chat+13b",
    "mistral-v0.1+7b", "mistral-instruct-v0.1+7b", "phi-2+3b",
    "vicuna-no-cotraining+7b", "llama2-no-cotraining+7b",
    "train-1.25-epochs+7b", "train-1.5-epochs+7b",
    "train-2-epochs+7b", "train-3-epochs+7b",
    "llava-lvis4v+7b", "llava-lrv+7b", "llava-lvis4v-lrv+7b",
    "prism-clip-controlled+7b", "prism-clip-controlled+13b",
    "prism-clip+7b", "prism-clip+13b",
    "prism-siglip-controlled+7b", "prism-siglip-controlled+13b",
    "prism-siglip+7b", "prism-siglip+13b",
    "prism-dinosiglip-controlled+7b", "prism-dinosiglip-controlled+13b",
    "prism-dinosiglip+7b", "prism-dinosiglip+13b",
    "dinosiglip-224px-resize-naive+7b",
    "prism-dinosiglip-224px-controlled+7b", "prism-dinosiglip-224px+7b",
]

# the reference's 11 VLARegistry ids (prismatic/conf/vla.py:202-231)
REFERENCE_VLA_IDS = [
    "siglip-224px+mx-bridge", "prism-dinosiglip-224px+mx-bridge",
    "siglip-224px-icy+mx-bridge",
    "siglip-224px+mx-oxe-magic-soup",
    "prism-dinosiglip-224px+mx-oxe-magic-soup-plus",
    "siglip-224px+mx-tdroid_carrot_in_bowl",
    "siglip-224px+mx-tdroid_pour_corn_in_pot",
    "siglip-224px-icy+mx-tdroid_carrot_in_bowl",
    "siglip-224px-last_layer+mx-tdroid_carrot_in_bowl",
    "siglip-224px-sandwich+mx-tdroid_carrot_in_bowl",
    "siglip-224px+mx-droid_wipe",
]


def test_all_reference_model_ids_registered():
    missing = [m for m in REFERENCE_MODEL_IDS if m not in ModelConfig.get_choice_names()]
    assert not missing, missing


def test_all_reference_vla_ids_registered():
    missing = [v for v in REFERENCE_VLA_IDS if v not in VLAConfig.get_choice_names()]
    assert not missing, missing


@pytest.mark.parametrize("model_id", sorted(ModelConfig.get_choice_names()))
def test_model_variant_materializes(model_id):
    cfg = ModelConfig.get_choice_class(model_id)()
    assert cfg.model_id == model_id
    # backbone ids must resolve through the catalog (config-only check; no
    # params are built)
    assert cfg.vision_backbone_id in catalog.VISION_BACKBONES, cfg.vision_backbone_id
    assert cfg.llm_backbone_id in catalog.LLM_BACKBONES, cfg.llm_backbone_id
    assert cfg.image_resize_strategy in ("resize-naive", "resize-crop", "letterbox")
    assert cfg.arch_specifier in (
        "linear", "gelu-mlp", "fused-gelu-mlp",
        "no-align+linear", "no-align+gelu-mlp", "no-align+fused-gelu-mlp",
    )


@pytest.mark.parametrize("vla_id", sorted(VLAConfig.get_choice_names()))
def test_vla_variant_materializes(vla_id):
    cfg = VLAConfig.get_choice_class(vla_id)()
    assert cfg.vla_id == vla_id
    assert cfg.data_mix in OXE_NAMED_MIXTURES or cfg.data_mix == "bridge", cfg.data_mix
    # base_vlm resolves in the model registry (the qwen mini-VLA extra is the
    # one allowed exception — its base VLM is an external release)
    if not cfg.base_vlm.startswith("prism-qwen25"):
        assert cfg.base_vlm in ModelConfig.get_choice_names(), cfg.base_vlm
    assert cfg.global_batch_size % cfg.per_device_batch_size == 0


def test_model_variant_values_spotcheck():
    # exact reference values for a few variants (prismatic/conf/models.py)
    m = ModelConfig.get_choice_class("prism-dinosiglip-224px+7b")()
    assert m.vision_backbone_id == "dinosiglip-vit-so-224px"
    assert m.llm_backbone_id == "llama2-7b-pure"
    assert m.arch_specifier == "no-align+fused-gelu-mlp"
    assert m.image_resize_strategy == "resize-naive"
    assert m.finetune_epochs == 2

    m = ModelConfig.get_choice_class("siglip-224px+7b")()
    assert m.vision_backbone_id == "siglip-vit-so400m"
    assert m.llm_backbone_id == "vicuna-v15-7b"
    assert m.image_resize_strategy == "letterbox"  # inherited from one-stage

    m = ModelConfig.get_choice_class("train-1.25-epochs+7b")()
    assert m.finetune_max_steps == 6500

    v = VLAConfig.get_choice_class("siglip-224px-sandwich+mx-tdroid_carrot_in_bowl")()
    assert v.freeze_llm_backbone and not v.freeze_vision_backbone
    assert v.unfreeze_last_llm_layer
    assert v.data_mix == "tdroid_carrot_in_bowl"
