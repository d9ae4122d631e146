"""Robot-harness helpers, probe plots, and HF export round-trip tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openvla_probe_tpu.models import catalog, vlm
from openvla_probe_tpu.probe import plots
from openvla_probe_tpu.robot import libero_utils, robot_utils


def test_gripper_conventions():
    a = np.array([0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.8])
    out = robot_utils.normalize_gripper_action(a, binarize=True)
    assert out[-1] == 1.0
    out2 = robot_utils.normalize_gripper_action(np.array([0, 0, 0, 0, 0, 0, 0.2]), binarize=True)
    assert out2[-1] == -1.0
    inv = robot_utils.invert_gripper_action(out)
    assert inv[-1] == -1.0
    np.testing.assert_allclose(inv[:-1], out[:-1])


def test_quat2axisangle():
    np.testing.assert_allclose(libero_utils.quat2axisangle(np.array([0, 0, 0, 1.0])), np.zeros(3))
    # 90° about z
    q = np.array([0, 0, np.sin(np.pi / 4), np.cos(np.pi / 4)])
    np.testing.assert_allclose(libero_utils.quat2axisangle(q), [0, 0, np.pi / 2], atol=1e-6)


def test_libero_image_pipeline(rng):
    obs = {"agentview_image": rng.integers(0, 256, (256, 256, 3), dtype=np.uint8)}
    img = libero_utils.get_libero_image(obs, resize_size=224)
    assert img.shape == (224, 224, 3) and img.dtype == np.uint8
    # 180° rotation: corner pixel provenance (up to jpeg/resize loss, just shape/rotation sanity)
    plain = libero_utils.resize_image(obs["agentview_image"][::-1, ::-1], (224, 224))
    np.testing.assert_array_equal(img, plain)


def test_center_crop_90_percent(rng):
    from openvla_probe_tpu.robot.openvla_utils import center_crop_image_u8

    img = rng.integers(0, 256, (256, 256, 3), dtype=np.uint8)
    out = center_crop_image_u8(img, 0.9)
    assert out.shape == (224, 224, 3) and out.dtype == np.uint8


def test_family_heatmap_and_curves(tmp_path):
    rows = []
    for layer in range(4):
        for k, name in enumerate(["(inside a b)", "(inside c d)", "(grasped x)"]):
            rows.append({"layer": layer, "label": name, "f1": 0.2 * layer + 0.05 * k,
                         "support": 10 * (k + 1)})
    mat = plots.family_layer_matrix(rows, "f1")
    assert mat["matrix"].shape == (4, 2)
    assert mat["families"] == ["grasped", "inside"]
    p = plots.plot_family_heatmap(rows, tmp_path / "hm.png")
    assert p.exists() and p.stat().st_size > 0
    recs = [{"layer": l, "val_acc": 0.5, "val_f1": 0.6, "val_ap": 0.7} for l in range(4)]
    p2 = plots.plot_layer_metric_curves(recs, tmp_path / "curves.png")
    assert p2.exists()


def test_label_frequency_stats(tmp_path, rng):
    eps = [{
        "symbolic_state_object_relations": rng.integers(-1, 2, (10, 5)).astype(np.int8),
        "symbolic_state_action_subgoals": rng.integers(-1, 2, (10, 2)).astype(np.int8),
    } for _ in range(3)]
    stats = plots.label_frequency_stats(eps)
    assert stats["pos_rate"].shape == (7,)
    np.testing.assert_allclose(stats["pos_rate"] + stats["neg_rate"] + stats["na_rate"], 1.0)
    p = plots.plot_label_frequencies(stats, tmp_path / "freq.png")
    assert p.exists()


def test_hf_export_import_roundtrip():
    """params -> HF state -> params preserves every tensor."""
    cfg = vlm.VLMConfig.tiny(
        vision=(  # use timm-style dino to exercise reg tokens + layerscale
            __import__("openvla_probe_tpu.models.vit", fromlist=["ViTConfig"]).ViTConfig(
                image_size=28, patch_size=14, hidden_size=32, num_layers=3, num_heads=2,
                mlp_dim=64, use_cls_token=True, num_register_tokens=4,
                no_embed_class=True, use_layerscale=True),
            __import__("openvla_probe_tpu.models.vit", fromlist=["ViTConfig"]).ViTConfig(
                image_size=28, patch_size=14, hidden_size=32, num_layers=3, num_heads=2,
                mlp_dim=64, use_cls_token=False, act="gelu_tanh"),
        ),
    )
    params = vlm.init_params(cfg, jax.random.key(0))
    state = catalog.params_to_hf_state(params, cfg)
    assert "vision_backbone.featurizer.blocks.0.ls1.scale_factor" in state
    assert "language_model.model.layers.2.mlp.down_proj.weight" in state
    import dataclasses

    f32cfg = dataclasses.replace(
        cfg, llm=dataclasses.replace(cfg.llm, dtype=jnp.float32)
    )
    back = catalog.params_from_hf_state(state, f32cfg)
    np.testing.assert_allclose(
        np.asarray(back["llm"]["layers"]["q_proj"], np.float32),
        np.asarray(params["llm"]["layers"]["q_proj"], np.float32), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(back["vision"]["dino"]["blocks"]["ls1"], np.float32),
        np.asarray(params["vision"]["dino"]["blocks"]["ls1"], np.float32), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(back["projector"]["fc2"]["w"], np.float32),
        np.asarray(params["projector"]["fc2"]["w"], np.float32), atol=1e-6)


def test_download_registry_shape():
    from openvla_probe_tpu.preprocessing.download import DATASET_COMPONENTS

    assert "llava-laion-cc-sbu-558k" in DATASET_COMPONENTS
    assert all("url" in c and "name" in c for comps in DATASET_COMPONENTS.values() for c in comps)


def test_seeding_utils():
    from openvla_probe_tpu.utils.seeding import (
        check_bfloat16_supported,
        set_global_seed,
        worker_init_function,
    )

    fn = set_global_seed(1234, get_worker_init_fn=True)
    assert fn is worker_init_function
    a = np.random.random()
    set_global_seed(1234)
    assert np.random.random() == a
    # distinct, reproducible worker streams
    worker_init_function(0, base_seed=7)
    x0 = np.random.random()
    worker_init_function(1, base_seed=7)
    x1 = np.random.random()
    worker_init_function(0, base_seed=7)
    assert np.random.random() == x0 and x0 != x1
    assert check_bfloat16_supported()


def test_get_vla_action_speculative_state():
    """spec_state feeds the previous step's tokens as the draft and tracks
    acceptance (the LIBERO control-loop wiring)."""
    import numpy as np

    from openvla_probe_tpu.robot.openvla_utils import (
        SpeculativeActionState,
        get_vla_action,
    )

    class StubVLA:
        def __init__(self):
            self.drafts = []

        def predict_action(self, image, prompt, unnorm_key=None,
                           return_hidden_states=False, draft_tokens=None):
            self.drafts.append(None if draft_tokens is None
                               else np.asarray(draft_tokens).copy())
            out = {"actions": np.zeros(7), "action_tokens": np.arange(7) + len(self.drafts)}
            if draft_tokens is not None:
                out["n_accepted"] = np.asarray(5)
            if return_hidden_states:
                out["hidden_pooled"] = np.zeros((4, 8))
            return out

    vla = StubVLA()
    st = SpeculativeActionState()
    obs = {"full_image": np.zeros((224, 224, 3), np.uint8)}

    out1 = get_vla_action(vla, obs, "Pick Up", spec_state=st)
    assert vla.drafts[0] is None                       # step 1: no draft yet
    out2 = get_vla_action(vla, obs, "Pick Up", spec_state=st)
    np.testing.assert_array_equal(vla.drafts[1], out1["action_tokens"])
    out3 = get_vla_action(vla, obs, "Pick Up", spec_state=st)
    np.testing.assert_array_equal(vla.drafts[2], out2["action_tokens"])
    assert 0.0 < st.acceptance_rate <= 1.0

    st.reset()
    get_vla_action(vla, obs, "Pick Up", spec_state=st)
    assert vla.drafts[3] is None                       # episode boundary reset
