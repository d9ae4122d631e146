"""Sharded serving (tp / tp+dp / fsdp) token-equality vs single-device.

VERDICT r1 #2: predict_action had never executed under a tp/fsdp mesh. These
tests run the full serving path under jit with sharded parameters on the
8-device CPU mesh and assert greedy action tokens are identical to the
unsharded run.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from openvla_probe_tpu.models import vla, vlm
from openvla_probe_tpu.models.vit import ViTConfig
from openvla_probe_tpu.models.llama import LlamaConfig
from openvla_probe_tpu.ops.image import BackboneTransformSpec, ImageTransformConfig
from openvla_probe_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def setup():
    # tiny dual-tower VLA; dims divisible by tp=2 (heads=4, ffn=128, vocab=512)
    cfg = vlm.VLMConfig(
        llm=LlamaConfig.tiny(),
        vision=(ViTConfig.tiny(num_register_tokens=4, no_embed_class=True), ViTConfig.tiny()),
        vision_names=("dino", "siglip"),
        arch_specifier="no-align+fused-gelu-mlp",
    )
    serving = vla.VLAServingConfig(vlm=cfg, action_dim=5, prompt_pad_len=12,
                                   codec_vocab_size=cfg.llm.vocab_size)
    params = vlm.init_params(cfg, jax.random.key(0))
    s = cfg.vision[0].image_size
    img_cfg = ImageTransformConfig(specs=(
        BackboneTransformSpec((s, s), "bicubic", (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
        BackboneTransformSpec((s, s), "bicubic", (0.5, 0.5, 0.5), (0.5, 0.5, 0.5)),
    ))

    r = np.random.default_rng(0)
    B = 4
    image = r.integers(0, 256, size=(B, 40, 40, 3), dtype=np.uint8)
    P = serving.prompt_pad_len
    ids = np.zeros((B, P), np.int32)
    ids[:, 0] = 1
    ids[:, 1:7] = r.integers(3, 500, (B, 6))
    args = dict(
        image_u8=image,
        input_ids=ids,
        prompt_len=np.full((B,), 7, np.int32),
        q01=-np.ones(5, np.float32),
        q99=np.ones(5, np.float32),
        action_mask=np.array([True] * 4 + [False]),
    )

    # unsharded ground truth
    import functools

    base_fn = jax.jit(functools.partial(
        vla.predict_action_from_image, cfg=serving, image_cfg=img_cfg))
    want = base_fn(params, **{k: jnp.asarray(v) for k, v in args.items()})
    want_toks = np.asarray(want["action_tokens"])
    return cfg, serving, params, img_cfg, args, want_toks


@pytest.mark.parametrize("mesh_shape,strategy", [
    ({"dp": 4, "fsdp": 1, "tp": 2}, "tp"),
    ({"dp": 1, "fsdp": 2, "tp": 4}, "fsdp+tp"),
    ({"dp": 1, "fsdp": 8, "tp": 1}, "fsdp"),
    ({"dp": 2, "fsdp": 2, "tp": 2}, "fsdp+tp"),
])
def test_sharded_tokens_match_single_device(setup, mesh_shape, strategy):
    cfg, serving, params, img_cfg, args, want_toks = setup
    n = int(np.prod(list(mesh_shape.values())))
    if n > jax.device_count():
        pytest.skip(f"needs {n} devices")
    mesh = make_mesh(mesh_shape)

    call, sharded = vla.make_sharded_predict(
        params, serving, mesh, image_cfg=img_cfg, strategy=strategy)
    out = call(sharded, args["image_u8"], args["input_ids"], args["prompt_len"],
               args["q01"], args["q99"], args["action_mask"])
    np.testing.assert_array_equal(np.asarray(out["action_tokens"]), want_toks)
    # params actually live sharded (not replicated): at least one leaf is split
    leaves = jax.tree.leaves(sharded)
    assert any(
        not s.is_fully_replicated
        for s in (l.sharding for l in leaves if hasattr(l, "sharding"))
    )


def test_sharded_capture_matches(setup):
    cfg, serving, params, img_cfg, args, _ = setup
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    mesh = make_mesh({"dp": 4, "fsdp": 1, "tp": 2})

    import functools

    base_fn = jax.jit(functools.partial(
        vla.predict_action_from_image, cfg=serving, image_cfg=img_cfg,
        collect_hidden_states=True))
    want = base_fn(params, **{k: jnp.asarray(v) for k, v in args.items()})

    call, sharded = vla.make_sharded_predict(
        params, serving, mesh, image_cfg=img_cfg, strategy="tp",
        collect_hidden_states=True)
    out = call(sharded, args["image_u8"], args["input_ids"], args["prompt_len"],
               args["q01"], args["q99"], args["action_mask"])
    np.testing.assert_allclose(
        np.asarray(out["hidden_pooled"]), np.asarray(want["hidden_pooled"]),
        atol=2e-4,
    )


def test_sharded_int8_tokens_match(setup):
    """Quantized (turbo-mode) weights shard over tp too: {"q","s"} leaves
    follow the parent weight's rule (q like the weight, s along the output
    dim). Tokens must match the unsharded quantized run."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    from openvla_probe_tpu.ops.linear import quantize_params

    cfg, serving, params, img_cfg, args, _ = setup
    qparams = {**params, "llm": quantize_params(params["llm"])}

    import functools

    base_fn = jax.jit(functools.partial(
        vla.predict_action_from_image, cfg=serving, image_cfg=img_cfg))
    want = np.asarray(base_fn(
        qparams, **{k: jnp.asarray(v) for k, v in args.items()})["action_tokens"])

    mesh = make_mesh({"dp": 4, "fsdp": 1, "tp": 2})
    call, sharded = vla.make_sharded_predict(
        qparams, serving, mesh, image_cfg=img_cfg, strategy="tp")
    out = call(sharded, args["image_u8"], args["input_ids"], args["prompt_len"],
               args["q01"], args["q99"], args["action_mask"])
    np.testing.assert_array_equal(np.asarray(out["action_tokens"]), want)

    # the int8 payloads are actually tp-sharded (not replicated)
    q_leaf = sharded["llm"]["layers"]["q_proj"]["q"]
    assert not q_leaf.sharding.is_fully_replicated
    # tiny-model s falls under MIN_SHARD_ELEMS; check the RULE at 7B shapes
    from jax.sharding import PartitionSpec as P
    from openvla_probe_tpu.parallel.sharding import param_spec

    assert param_spec("llm/layers/q_proj/q", (32, 4096, 4096), mesh, "tp") == P(None, "tp", None)
    assert param_spec("llm/layers/q_proj/s", (32, 4096), mesh, "tp") == P(None, "tp")
    # contraction-sharded weights keep s replicated (output dim stays whole)
    assert param_spec("llm/layers/o_proj/q", (32, 4096, 4096), mesh, "tp") == P(None, None, "tp")
    assert param_spec("llm/layers/o_proj/s", (32, 4096), mesh, "tp") == P(None, None)
    assert param_spec("llm/lm_head/q", (32064, 4096), mesh, "tp") == P("tp", None)
    assert param_spec("llm/lm_head/s", (32064,), mesh, "tp") == P("tp")


def test_sharded_int4_tokens_match(setup):
    """Grouped-int4 (w4a8) weights shard over tp: group-major [L, G, O, gsz]
    codes split O for output-sharded weights and the GROUP axis for
    contraction-sharded ones (gsz stays whole; each device holds whole
    groups, so the per-group batched dot's partial sums psum exactly).
    Tokens must match the unsharded int4 run."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    from openvla_probe_tpu.ops.linear import quantize_params

    cfg, serving, params, img_cfg, args, _ = setup
    qparams = {**params, "llm": quantize_params(params["llm"], bits=4,
                                                group_size=16)}

    import functools

    base_fn = jax.jit(functools.partial(
        vla.predict_action_from_image, cfg=serving, image_cfg=img_cfg))
    want = np.asarray(base_fn(
        qparams, **{k: jnp.asarray(v) for k, v in args.items()})["action_tokens"])

    mesh = make_mesh({"dp": 4, "fsdp": 1, "tp": 2})
    call, sharded = vla.make_sharded_predict(
        qparams, serving, mesh, image_cfg=img_cfg, strategy="tp")
    out = call(sharded, args["image_u8"], args["input_ids"], args["prompt_len"],
               args["q01"], args["q99"], args["action_mask"])
    np.testing.assert_array_equal(np.asarray(out["action_tokens"]), want)

    # the RULES at 7B shapes (tiny-model s falls under MIN_SHARD_ELEMS):
    # q [L, G, O, gsz] / s [L, O, G] — output-sharded splits O in both;
    # contraction-sharded splits G in both (s's G must track q's groups)
    from jax.sharding import PartitionSpec as P
    from openvla_probe_tpu.parallel.sharding import param_spec

    assert param_spec("llm/layers/q_proj/q", (32, 32, 4096, 128), mesh, "tp",
                      grouped_int4=True) == P(None, None, "tp", None)
    assert param_spec("llm/layers/q_proj/s", (32, 4096, 32), mesh, "tp",
                      grouped_int4=True) == P(None, "tp", None)
    assert param_spec("llm/layers/o_proj/q", (32, 32, 4096, 128), mesh, "tp",
                      grouped_int4=True) == P(None, "tp", None, None)
    assert param_spec("llm/layers/o_proj/s", (32, 4096, 32), mesh, "tp",
                      grouped_int4=True) == P(None, None, "tp")
    # MoE int4 experts keep E at dim 1 for ep (one extra dim vs int8)
    epmesh = make_mesh({"dp": 2, "ep": 2, "tp": 2})
    assert param_spec("llm/layers/gate_proj/q", (8, 4, 32, 512, 128), epmesh,
                      "tp", grouped_int4=True)[1] == "ep"


def test_sharded_mix_tokens_match(setup):
    """Dual-precision ("mix") leaves shard over tp with each copy following
    ITS layout rule (q/s per-channel int8, q4/s4 grouped — shard_params keys
    q4/s4 back to the q/s rules with grouped_int4=True). Tokens must match
    the unsharded mix run, which itself dispatches int8 at prefill M and the
    grouped-int4 dot at decode M."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    from openvla_probe_tpu.ops.linear import is_mixed_quant, quantize_params

    cfg, serving, params, img_cfg, args, _ = setup
    qparams = {**params, "llm": quantize_params(params["llm"], bits="mix",
                                                group_size=16)}
    assert is_mixed_quant(qparams["llm"]["layers"]["q_proj"])

    import functools

    base_fn = jax.jit(functools.partial(
        vla.predict_action_from_image, cfg=serving, image_cfg=img_cfg))
    want = np.asarray(base_fn(
        qparams, **{k: jnp.asarray(v) for k, v in args.items()})["action_tokens"])

    mesh = make_mesh({"dp": 4, "fsdp": 1, "tp": 2})
    call, sharded = vla.make_sharded_predict(
        qparams, serving, mesh, image_cfg=img_cfg, strategy="tp")
    out = call(sharded, args["image_u8"], args["input_ids"], args["prompt_len"],
               args["q01"], args["q99"], args["action_mask"])
    np.testing.assert_array_equal(np.asarray(out["action_tokens"]), want)
