"""13B validation at ratio scale (VERDICT r1 #9).

The 13B catalog entries were dims-only data in round 1. These tests (a) pin
the exact Llama-2-13B dimensions against the HF reference values, (b) run a
RATIO-scaled 13B config (40 layers / 40 heads / 5120:13824 ffn ratio shrunk
uniformly, preserving every structural relationship: layer count ratio vs 7B,
GQA=MHA, ffn multiple) end-to-end through predict_action AND a train step,
(c) validate the tp=2 sharding plan the real 13B needs (26 GB bf16 vs 16 GB
HBM/v5e; see COMPONENTS.md HBM budget note).

Ref: prismatic/models/backbones/llm/llama2.py:24-51 (13B registry entries).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openvla_probe_tpu.models import catalog, llama, vla, vlm
from openvla_probe_tpu.models.vit import ViTConfig
from openvla_probe_tpu.ops.image import BackboneTransformSpec, ImageTransformConfig
from openvla_probe_tpu.parallel.mesh import make_mesh


def test_13b_catalog_dims_exact():
    for bid in ("llama2-13b-pure", "llama2-13b-chat", "vicuna-v15-13b"):
        cfg = catalog.LLM_BACKBONES[bid]["cfg"]
        assert cfg.hidden_size == 5120
        assert cfg.intermediate_size == 13824
        assert cfg.num_hidden_layers == 40
        assert cfg.num_attention_heads == 40
        assert cfg.num_key_value_heads == 40
        assert cfg.head_dim == 128
        assert cfg.vocab_size == 32064
    # the full-scale factories agree with the catalog dims
    f = llama.LlamaConfig.llama2_13b()
    c = catalog.LLM_BACKBONES["llama2-13b-pure"]["cfg"]
    assert (f.hidden_size, f.intermediate_size, f.num_hidden_layers,
            f.num_attention_heads) == (
        c.hidden_size, c.intermediate_size, c.num_hidden_layers,
        c.num_attention_heads)
    v = vlm.VLMConfig.openvla_13b()
    assert v.llm.hidden_size == 5120 and v.vision_dim == 1024 + 1152


def _llama_13b_ratio():
    """13B shrunk by 64x on width, 8x on depth — all ratios preserved:
    depth 40->5 (vs 7B's 32->4 in LlamaConfig.tiny), width 5120->80 with
    40->5 heads (head_dim 16), ffn 13824->216 (exact 2.7x multiple)."""
    return llama.LlamaConfig(
        vocab_size=512, hidden_size=80, intermediate_size=216,
        num_hidden_layers=5, num_attention_heads=5, num_key_value_heads=5,
        max_position_embeddings=256, dtype=jnp.float32,
    )


@pytest.fixture(scope="module")
def ratio_model():
    lcfg = _llama_13b_ratio()
    cfg = vlm.VLMConfig(
        llm=lcfg,
        vision=(ViTConfig.tiny(num_register_tokens=4, no_embed_class=True), ViTConfig.tiny()),
        vision_names=("dino", "siglip"),
        arch_specifier="no-align+fused-gelu-mlp",
    )
    serving = vla.VLAServingConfig(vlm=cfg, action_dim=7, prompt_pad_len=12,
                                   codec_vocab_size=lcfg.vocab_size)
    params = vlm.init_params(cfg, jax.random.key(0))
    return cfg, serving, params


def test_13b_ratio_predict_action_e2e(ratio_model):
    cfg, serving, params = ratio_model
    s = cfg.vision[0].image_size
    img_cfg = ImageTransformConfig(specs=(
        BackboneTransformSpec((s, s), "bicubic", (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
        BackboneTransformSpec((s, s), "bicubic", (0.5, 0.5, 0.5), (0.5, 0.5, 0.5)),
    ))
    r = np.random.default_rng(0)
    B = 2
    ids = np.zeros((B, serving.prompt_pad_len), np.int32)
    ids[:, 0] = 1
    ids[:, 1:7] = r.integers(3, 500, (B, 6))
    out = vla.predict_action_from_image(
        params, serving,
        jnp.asarray(r.integers(0, 256, (B, 40, 40, 3), dtype=np.uint8)), img_cfg,
        jnp.asarray(ids), jnp.full((B,), 7, jnp.int32),
        jnp.asarray(-np.ones(7, np.float32)), jnp.asarray(np.ones(7, np.float32)),
        jnp.asarray(np.array([True] * 6 + [False])),
    )
    toks = np.asarray(out["action_tokens"])
    assert toks.shape == (B, 7)
    assert (toks >= 0).all() and (toks < cfg.llm.vocab_size).all()
    assert np.isfinite(np.asarray(out["actions"])).all()


def test_13b_ratio_train_step(ratio_model):
    from openvla_probe_tpu.training.train_state import OptimizerConfig, TrainState, make_optimizer
    from openvla_probe_tpu.training.train_step import make_train_step
    from openvla_probe_tpu.vla.action_tokenizer import ActionCodec

    cfg, serving, params = ratio_model
    optimizer = make_optimizer(OptimizerConfig(max_steps=10), params)
    state = TrainState.create(params, optimizer)
    step = make_train_step(cfg, optimizer, codec=ActionCodec(vocab_size=cfg.llm.vocab_size),
                           donate=False)
    r = np.random.default_rng(0)
    B, T, S = 2, 16, cfg.vision[0].image_size
    labels = np.full((B, T), -100, np.int64)
    labels[:, -8:] = r.integers(cfg.llm.vocab_size - 256, cfg.llm.vocab_size, (B, 8))
    batch = {
        "input_ids": jnp.asarray(r.integers(2, 500, (B, T)), jnp.int32),
        "attention_mask": jnp.ones((B, T), jnp.int32),
        "pixel_values": jnp.asarray(r.normal(size=(B, 6, S, S)), jnp.float32),
        "labels": jnp.asarray(labels),
    }
    new_state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert int(jax.device_get(new_state.step)) == 1


def test_13b_tp2_sharding_plan(ratio_model):
    """The real 13B needs tp=2 (26 GB bf16 > 16 GB HBM). Validate the plan at
    ratio scale: every 13B-shaped trunk tensor divides cleanly over tp=2 with
    the existing rules, and sharded serving matches single-device tokens."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    cfg, serving, params = ratio_model
    # divisibility of the REAL 13B dims over tp=2/4 (heads 40, ffn 13824, vocab 32064)
    for tp in (2, 4):
        assert 40 % tp == 0 and 13824 % tp == 0 and 32064 % tp == 0

    mesh = make_mesh({"dp": 4, "fsdp": 1, "tp": 2})
    s = cfg.vision[0].image_size
    img_cfg = ImageTransformConfig(specs=(
        BackboneTransformSpec((s, s), "bicubic", (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
        BackboneTransformSpec((s, s), "bicubic", (0.5, 0.5, 0.5), (0.5, 0.5, 0.5)),
    ))
    r = np.random.default_rng(1)
    B = 4
    ids = np.zeros((B, serving.prompt_pad_len), np.int32)
    ids[:, 0] = 1
    ids[:, 1:7] = r.integers(3, 500, (B, 6))
    image = r.integers(0, 256, (B, 40, 40, 3), dtype=np.uint8)
    args = (image, ids, np.full((B,), 7, np.int32),
            -np.ones(7, np.float32), np.ones(7, np.float32),
            np.array([True] * 6 + [False]))

    import functools

    single = jax.jit(functools.partial(
        vla.predict_action_from_image, cfg=serving, image_cfg=img_cfg))
    want = np.asarray(single(
        params, image_u8=jnp.asarray(image), input_ids=jnp.asarray(ids),
        prompt_len=jnp.asarray(args[2]), q01=jnp.asarray(args[3]),
        q99=jnp.asarray(args[4]), action_mask=jnp.asarray(args[5]),
    )["action_tokens"])

    call, sharded = vla.make_sharded_predict(params, serving, mesh,
                                             image_cfg=img_cfg, strategy="tp")
    got = np.asarray(call(sharded, *args)["action_tokens"])
    np.testing.assert_array_equal(got, want)
