"""Dual-precision ("mix") serving tier: int8 prefill + grouped-int4 decode.

The tier holds BOTH quantized copies of every decode-stream weight
(quantize_weight_mixed) and matmul_t dispatches on the row count: large M
(prefill) reads the int8 copy at the int8 MXU rate, small M (cached decode)
takes the grouped-int4 batched dot whose weight stream is half the int8
bytes (PERF_r03.md: 0.016 vs 0.022 ms at the 4096^2 decode shape). These
tests pin the dispatch and the tier's composition contracts on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openvla_probe_tpu.models import llama, vla, vlm
from openvla_probe_tpu.ops import linear


def test_mixed_leaf_structure_and_dequant(rng):
    w = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))
    mw = linear.quantize_weight_mixed(w, group_size=32)
    assert linear.is_mixed_quant(mw)
    assert set(mw) == {"q", "s", "q4", "s4"}
    assert mw["q"].dtype == jnp.int8 and mw["q"].shape == (64, 128)
    assert mw["q4"].dtype == jnp.int4 and mw["q4"].shape == (4, 64, 32)
    assert mw["s4"].shape == (64, 4)
    # a mixed leaf is NOT a grouped-int4 leaf (its q/s are per-channel int8)
    assert not linear.is_grouped_int4(mw)
    # dequantize_weight reads the int8 copy (prefill numerics == int8 tier)
    want = np.asarray(linear.dequantize_weight(linear.quantize_weight(w)))
    got = np.asarray(linear.dequantize_weight(mw))
    np.testing.assert_array_equal(got, want)


def test_mixed_ungroupable_in_dim_collapses_to_int8(rng):
    w = jnp.asarray(rng.normal(size=(16, 48)).astype(np.float32))  # 48 % 32 != 0
    mw = linear.quantize_weight_mixed(w, group_size=32)
    assert not linear.is_mixed_quant(mw)
    assert mw["q"].dtype == jnp.int8 and mw["s"].shape == (16,)


def test_mixed_matmul_dispatch_by_m(rng):
    """Small M == the w4a8 grouped dot on (q4, s4); large M == the w8a8 dot
    on (q, s) — bit-identical to each single-precision tier's matmul."""
    w = jnp.asarray(rng.normal(size=(48, 64)).astype(np.float32))
    mw = linear.quantize_weight_mixed(w, group_size=32)
    w8 = {"q": mw["q"], "s": mw["s"]}
    w4 = {"q": mw["q4"], "s": mw["s4"]}

    x_small = jnp.asarray(rng.normal(size=(8, 64)), jnp.bfloat16)   # M <= 32
    got = np.asarray(linear.matmul_t(x_small, mw).astype(jnp.float32))
    want = np.asarray(linear.matmul_t(x_small, w4).astype(jnp.float32))
    np.testing.assert_array_equal(got, want)

    x_big = jnp.asarray(rng.normal(size=(40, 64)), jnp.bfloat16)    # M > 32
    got = np.asarray(linear.matmul_t(x_big, mw).astype(jnp.float32))
    want = np.asarray(linear.matmul_t(x_big, w8).astype(jnp.float32))
    np.testing.assert_array_equal(got, want)

    # M == 1 stays on the int4 copy (slow — XLA's grouped dot collapses at
    # one row — but COPY-CONSISTENT with the M=B*T speculative verify: the
    # decode copy must be M-independent or spec-vs-sequential token
    # equality breaks by construction, not just by reduction order)
    x_one = jnp.asarray(rng.normal(size=(1, 64)), jnp.bfloat16)
    got = np.asarray(linear.matmul_t(x_one, mw).astype(jnp.float32))
    want = np.asarray(linear.matmul_t(x_one, w4).astype(jnp.float32))
    np.testing.assert_array_equal(got, want)


def test_mixed_quantize_params_selectivity():
    """bits="mix": decode-stream (trunk) leaves go dual-copy; ViT leaves
    (prefill-only — they never run at decode M) stay single-copy int8."""
    params = {
        "layers": {"q_proj": jnp.zeros((2, 64, 64), jnp.float32)},
        "lm_head": jnp.ones((128, 64), jnp.float32),
        "fc1_w": jnp.ones((64, 64), jnp.float32),      # ViT suffix
        "norm": jnp.ones((64,), jnp.float32),          # untouched
    }
    qp = linear.quantize_params(
        params, suffixes=linear.TURBO_QUANT_SUFFIXES, bits="mix", group_size=32)
    assert linear.is_mixed_quant(qp["layers"]["q_proj"])
    assert linear.is_mixed_quant(qp["lm_head"])
    assert linear.is_quantized(qp["fc1_w"]) and "q4" not in qp["fc1_w"]
    assert qp["norm"].dtype == jnp.float32


def test_mixed_random_params_like_direct_init():
    """bench.py's direct init over a bits="mix" eval_shape tree: int4 codes in
    range, both scale families positive."""
    cfg = llama.LlamaConfig.tiny()
    shapes = jax.eval_shape(
        lambda k: linear.quantize_params(llama.init_params(cfg, k),
                                         bits="mix", group_size=32),
        jax.random.key(0))
    p = linear.random_params_like_eager_int4(shapes, jax.random.key(1))
    q = p["layers"]["q_proj"]
    assert q["q"].dtype == jnp.int8 and q["q4"].dtype == jnp.int4
    assert np.asarray(q["q4"].astype(jnp.int8)).min() >= -7
    assert np.all(np.asarray(q["s"]) > 0) and np.all(np.asarray(q["s4"]) > 0)


def test_mixed_stacked_forward_close_to_bf16(rng):
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.key(0))
    qp = linear.quantize_params(params, bits="mix", group_size=32)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 12)))
    mask = jnp.ones((1, 12), jnp.int32)
    pos = jnp.arange(12)[None]
    e = llama.embed_tokens(params, ids)
    want = np.asarray(llama.forward(params, cfg, e, mask, pos)["logits"])
    got = np.asarray(llama.forward(qp, cfg, e, mask, pos)["logits"])
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert rel < 0.3, rel


class _Tok:
    def encode(self, t):
        return [1] + [(len(w) % 300) + 3 for w in t.split()]


def test_mixed_serving_e2e_first_token_matches_hybrid(rng):
    """Full tiny serving path on a mixed tree. The FIRST decoded token comes
    from prefill: trunk matmuls run at M = prefill_len > the grouped-dispatch
    threshold (int8 copies), but the lm_head on the last-position hidden runs
    at M = B (decode-shaped -> int4 copy, vla.py:333). So mixed's first token
    must bit-match a HYBRID tree — int8 everywhere, grouped-int4 lm_head —
    where both paths reach the identical _w4a8_dot_grouped/_w8a8_dot graphs."""
    from openvla_probe_tpu.models import vit
    from openvla_probe_tpu.ops.image import BackboneTransformSpec, ImageTransformConfig

    # a 6x6-patch tiny tower so prefill rows (1 + 36 patches + prompt) exceed
    # the grouped-dispatch threshold (32) — the dispatch must be provable
    cfg = vlm.VLMConfig.tiny(vision=(
        vit.ViTConfig.tiny(image_size=84),
        vit.ViTConfig.tiny(image_size=84, use_cls_token=False, act="gelu_tanh"),
    ))
    serving = vla.VLAServingConfig.for_tier(
        cfg, "turbo", action_dim=5, prompt_pad_len=12,
        codec_vocab_size=cfg.llm.vocab_size)
    params = vlm.init_params(cfg, jax.random.key(0))
    s = cfg.vision[0].image_size
    img_cfg = ImageTransformConfig(specs=tuple(
        BackboneTransformSpec((s, s), "bicubic", (0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
        for _ in cfg.vision))
    stats = {"x": {"action": {"q01": -np.ones(5, np.float32),
                              "q99": np.ones(5, np.float32)}}}
    img = rng.integers(0, 256, (s, s, 3), dtype=np.uint8)

    # prefill rows = B * (1 + patches + prompt) must exceed the dispatch
    # threshold so trunk prefill provably reads the int8 copies
    assert serving.prefill_len > linear._w4a8_group_m_max()

    qmix = linear.quantize_params(params, linear.TURBO_QUANT_SUFFIXES,
                                  bits="mix", group_size=32)
    q8 = linear.quantize_params(params, linear.TURBO_QUANT_SUFFIXES,
                                bits=8, group_size=32)
    q_hybrid = dict(q8)
    q_hybrid["llm"] = {**q8["llm"],
                       "lm_head": {"q": qmix["llm"]["lm_head"]["q4"],
                                   "s": qmix["llm"]["lm_head"]["s4"]}}
    m_mix = vla.OpenVLA(qmix, serving, _Tok(), stats, img_cfg)
    m_hyb = vla.OpenVLA(q_hybrid, serving, _Tok(), stats, img_cfg)
    o_mix = m_mix.predict_action(img, "pick up the mug", unnorm_key="x")
    o_hyb = m_hyb.predict_action(img, "pick up the mug", unnorm_key="x")
    assert np.asarray(o_mix["action_tokens"])[0] == np.asarray(o_hyb["action_tokens"])[0]
    a = np.asarray(o_mix["actions"], np.float32)
    assert np.isfinite(a).all() and a.shape == (5,)
    # determinism across calls
    o2 = m_mix.predict_action(img, "pick up the mug", unnorm_key="x")
    np.testing.assert_array_equal(np.asarray(o_mix["action_tokens"]),
                                  np.asarray(o2["action_tokens"]))


def test_mixed_sharding_specs():
    """shard_params on a mixed leaf: q/s take the int8 rules, q4/s4 the
    grouped-int4 rules (tp splits O in all four for an output-sharded
    weight; the contraction-sharded o_proj splits I in q but the GROUP axis
    in q4)."""
    from jax.sharding import Mesh
    from openvla_probe_tpu.parallel.sharding import shard_params

    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("dp", "tp"))
    L, D, G, gsz = 2, 256, 8, 32
    tree = {"layers": {
        "q_proj": {"q": jnp.zeros((L, D, D), jnp.int8),
                   "s": jnp.zeros((L, D), jnp.float32),
                   "q4": jnp.zeros((L, G, D, gsz), jnp.int8),
                   "s4": jnp.zeros((L, D, G), jnp.float32)},
        "o_proj": {"q": jnp.zeros((L, D, D), jnp.int8),
                   "s": jnp.zeros((L, D), jnp.float32),
                   "q4": jnp.zeros((L, G, D, gsz), jnp.int8),
                   "s4": jnp.zeros((L, D, G), jnp.float32)},
    }}
    sh = shard_params(tree, mesh, "tp")
    qp = sh["layers"]["q_proj"]
    assert qp["q"].spec == jax.sharding.PartitionSpec(None, "tp", None)
    assert qp["q4"].spec == jax.sharding.PartitionSpec(None, None, "tp", None)
    op = sh["layers"]["o_proj"]
    assert op["q"].spec == jax.sharding.PartitionSpec(None, None, "tp")
    assert op["q4"].spec == jax.sharding.PartitionSpec(None, "tp", None, None)
