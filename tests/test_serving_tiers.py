"""Serving-tier config matrix: first-class fields, env overrides, drift guard.

Round-3 unification (VERDICT r2 Weak #3): the six OVLA_* serving knobs were
trace-time env reads behind a jit cache keyed only on call flags, so flipping
one after warmup was a silent no-op. They are now VLAServingConfig fields;
these tests pin the contract: a knob either takes effect (config change → new
compiled graph) or raises (env flip after construction).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openvla_probe_tpu.models import vla, vlm
from openvla_probe_tpu.models.llama import LlamaConfig
from openvla_probe_tpu.models.vit import ViTConfig
from openvla_probe_tpu.ops.image import BackboneTransformSpec, ImageTransformConfig


class _Tok:
    def encode(self, t):
        return [1] + [(len(w) % 300) + 3 for w in t.split()]


@pytest.fixture(scope="module")
def wrapper_parts():
    cfg = vlm.VLMConfig(
        llm=LlamaConfig.tiny(),
        vision=(ViTConfig.tiny(num_register_tokens=4, no_embed_class=True),
                ViTConfig.tiny()),
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
    stats = {"x": {"action": {"q01": -np.ones(5, np.float32),
                              "q99": np.ones(5, np.float32)}}}
    img = np.random.default_rng(0).integers(0, 256, (s, s, 3), dtype=np.uint8)
    return serving, params, img_cfg, stats, img


def _model(serving, parts):
    _, params, img_cfg, stats, _ = parts
    return vla.OpenVLA(params, serving, _Tok(), stats, img_cfg)


# --- config validation + tier constructors -----------------------------------

def test_tier_constructors():
    base = vlm.VLMConfig.tiny()
    parity = vla.VLAServingConfig.for_tier(base, "parity")
    assert parity.tier == "parity" and parity.decode_impl == "stacked"
    turbo = vla.VLAServingConfig.for_tier(base, "turbo")
    assert turbo.tier == "turbo" and turbo.vlm == base.turbo()
    kv8 = vla.VLAServingConfig.for_tier(base, "turbo_kv8")
    assert kv8.decode_impl == "frozen_kv" and kv8.kv_int8
    pal = vla.VLAServingConfig.for_tier(base, "pallas")
    assert pal.decode_impl == "frozen_kv" and not pal.kv_int8
    with pytest.raises(ValueError, match="unknown serving tier"):
        vla.VLAServingConfig.for_tier(base, "warp")


def test_config_validation():
    base = vlm.VLMConfig.tiny()
    with pytest.raises(ValueError, match="frozen-KV"):
        vla.VLAServingConfig(vlm=base, kv_int8=True)          # stacked default
    with pytest.raises(ValueError, match="stacked-decode"):
        vla.VLAServingConfig(vlm=base, decode_impl="frozen_kv", split_prefill=True)
    with pytest.raises(ValueError, match="decode_impl"):
        vla.VLAServingConfig(vlm=base, decode_impl="warp")


def test_env_overrides(monkeypatch):
    base = vla.VLAServingConfig(vlm=vlm.VLMConfig.tiny())
    monkeypatch.setenv("OVLA_LEGACY_DECODE", "0")
    assert base.with_env_overrides().decode_impl == "frozen_kv"
    monkeypatch.setenv("OVLA_KV_INT8", "1")
    monkeypatch.delenv("OVLA_LEGACY_DECODE")
    # parity numerics + int8 KV would serve a row no tier names: RAISE, never
    # stamp 'turbo_kv8' on fp32-score numerics
    with pytest.raises(ValueError, match="parity config"):
        base.with_env_overrides()
    turbo = vla.VLAServingConfig.for_tier(vlm.VLMConfig.tiny(), "turbo")
    c = turbo.with_env_overrides()
    assert c.kv_int8 and c.decode_impl == "frozen_kv"   # implied, never a no-op
    assert c.tier == "turbo_kv8"   # numerics change => the tier label follows
    monkeypatch.setenv("OVLA_LEGACY_DECODE", "1")
    with pytest.raises(ValueError, match="OVLA_KV_INT8"):
        base.with_env_overrides()
    monkeypatch.delenv("OVLA_LEGACY_DECODE")
    monkeypatch.setenv("OVLA_SPLIT_PREFILL", "1")
    with pytest.raises(ValueError, match="conflicts"):
        base.with_env_overrides()   # KV8 + SPLIT must never silently drop KV8
    monkeypatch.delenv("OVLA_KV_INT8")
    monkeypatch.setenv("OVLA_DECODE_UNROLL", "0")
    c = base.with_env_overrides()
    assert c.decode_unroll is False and c.split_prefill is True
    # dropping the int8 KV via LEGACY=1 must drop the turbo_kv8 LABEL too
    monkeypatch.delenv("OVLA_SPLIT_PREFILL")
    monkeypatch.delenv("OVLA_DECODE_UNROLL")
    monkeypatch.setenv("OVLA_LEGACY_DECODE", "1")
    kv8cfg = vla.VLAServingConfig.for_tier(vlm.VLMConfig.tiny(), "turbo_kv8")
    c = kv8cfg.with_env_overrides()
    assert c.decode_impl == "stacked" and not c.kv_int8 and c.tier == "turbo"


def test_pallas_subgate_flip_raises(wrapper_parts, monkeypatch):
    """The per-kernel Pallas gates are trace-time reads too — flipping one
    after construction must raise, not silently keep the cached graph."""
    m = _model(wrapper_parts[0], wrapper_parts)
    m.predict_action(wrapper_parts[4], "pick up the mug", unnorm_key="x")
    monkeypatch.setenv("OVLA_PALLAS_ATTN", "0")
    with pytest.raises(RuntimeError, match="env knobs changed"):
        m.predict_action(wrapper_parts[4], "pick up the mug", unnorm_key="x")


# --- the enforced contract: take effect or raise -----------------------------

def test_env_flip_after_construction_raises(wrapper_parts, monkeypatch):
    serving = wrapper_parts[0]
    m = _model(serving, wrapper_parts)
    out = m.predict_action(wrapper_parts[4], "pick up the mug", unnorm_key="x")
    assert out["action_tokens"].shape == (serving.action_dim,)
    monkeypatch.setenv("OVLA_KV_INT8", "1")
    with pytest.raises(RuntimeError, match="env knobs changed"):
        m.predict_action(wrapper_parts[4], "pick up the mug", unnorm_key="x")


def test_config_change_takes_effect(wrapper_parts):
    """Same weights, different decode_impl via a NEW config → a new compiled
    graph (cfg is part of the jit-cache key) and identical greedy tokens."""
    serving = wrapper_parts[0]
    m = _model(serving, wrapper_parts)
    a = m.predict_action(wrapper_parts[4], "pick up the mug", unnorm_key="x")
    n_graphs = len(m._jit_cache)
    m.cfg = dataclasses.replace(m.cfg, decode_impl="frozen_kv")
    b = m.predict_action(wrapper_parts[4], "pick up the mug", unnorm_key="x")
    assert len(m._jit_cache) == n_graphs + 1, "config change must retrace"
    np.testing.assert_array_equal(a["action_tokens"], b["action_tokens"])


# --- speculative tier gate ---------------------------------------------------

def test_parity_tier_rejects_drafts(wrapper_parts):
    m = _model(wrapper_parts[0], wrapper_parts)
    base = m.predict_action(wrapper_parts[4], "pick up the mug", unnorm_key="x")
    with pytest.raises(ValueError, match="turbo-tier"):
        m.predict_action(wrapper_parts[4], "pick up the mug", unnorm_key="x",
                         draft_tokens=base["action_tokens"])


def test_turbo_tier_allows_drafts(wrapper_parts):
    serving = dataclasses.replace(wrapper_parts[0], tier="turbo")
    m = _model(serving, wrapper_parts)
    base = m.predict_action(wrapper_parts[4], "pick up the mug", unnorm_key="x")
    spec = m.predict_action(wrapper_parts[4], "pick up the mug", unnorm_key="x",
                            draft_tokens=base["action_tokens"])
    np.testing.assert_array_equal(spec["action_tokens"], base["action_tokens"])


def test_parity_spec_explicit_opt_in(wrapper_parts):
    serving = dataclasses.replace(wrapper_parts[0], speculative_in_parity="allow")
    m = _model(serving, wrapper_parts)
    base = m.predict_action(wrapper_parts[4], "pick up the mug", unnorm_key="x")
    spec = m.predict_action(wrapper_parts[4], "pick up the mug", unnorm_key="x",
                            draft_tokens=base["action_tokens"])
    np.testing.assert_array_equal(spec["action_tokens"], base["action_tokens"])


def test_pallas_tier_interpret_e2e(wrapper_parts, monkeypatch):
    """The FULL pallas serving tier end-to-end on CPU (OVLA_PALLAS_INTERPRET):
    quantized towers route through the fused qkv/proj/MLP + flash kernels and
    the frozen-KV decode routes through the decode kernel — the exact serving
    wiring that otherwise only executes on a chip. Determinism + sane outputs
    (random-weight TOKEN agreement across tiers is margin-limited by design,
    so no cross-tier token assert here — PARITY_r02.md)."""
    from openvla_probe_tpu.ops.linear import TURBO_QUANT_SUFFIXES, quantize_params

    serving, params, img_cfg, stats, img = wrapper_parts
    monkeypatch.setenv("OVLA_PALLAS", "1")
    monkeypatch.setenv("OVLA_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("OVLA_VITMLP_BM", "16")
    pal = vla.VLAServingConfig.for_tier(
        serving.vlm, "pallas", action_dim=serving.action_dim,
        prompt_pad_len=serving.prompt_pad_len,
        codec_vocab_size=serving.codec_vocab_size,
    )
    qparams = quantize_params(params, TURBO_QUANT_SUFFIXES)
    m = vla.OpenVLA(qparams, pal, _Tok(), stats, img_cfg)
    o1 = m.predict_action(img, "pick up the mug", unnorm_key="x")
    o2 = m.predict_action(img, "pick up the mug", unnorm_key="x")
    a1 = np.asarray(o1["actions"], np.float32)
    a2 = np.asarray(o2["actions"], np.float32)
    assert np.isfinite(a1).all() and a1.shape == (serving.action_dim,)
    np.testing.assert_array_equal(a1, a2)
    assert np.abs(a1).max() <= 1.0 + 1e-6  # inside the unnorm [q01, q99] box


def test_int4_turbo_tier_e2e(wrapper_parts):
    """int4 grouped-quantized trunk through the FULL turbo serving path, and
    the dispatch pin: int4 serving tokens EQUAL serving on the explicitly
    dequantized bf16 twin of the same int4 codes (matmul_t's int4 path is
    dequant-to-bf16 + matmul by construction)."""
    from openvla_probe_tpu.ops.linear import (
        TURBO_QUANT_SUFFIXES, dequantize_weight, is_quantized, quantize_params,
    )

    serving, params, img_cfg, stats, img = wrapper_parts
    turbo = vla.VLAServingConfig.for_tier(
        serving.vlm, "turbo", action_dim=serving.action_dim,
        prompt_pad_len=serving.prompt_pad_len,
        codec_vocab_size=serving.codec_vocab_size,
    )
    q4 = quantize_params(params, TURBO_QUANT_SUFFIXES, bits=4, group_size=32)
    m4 = vla.OpenVLA(q4, turbo, _Tok(), stats, img_cfg)
    o4 = m4.predict_action(img, "pick up the mug", unnorm_key="x")

    deq = jax.tree.map(
        lambda w: dequantize_weight(w, jnp.bfloat16) if is_quantized(w) else w,
        q4, is_leaf=is_quantized)
    md = vla.OpenVLA(deq, turbo, _Tok(), stats, img_cfg)
    od = md.predict_action(img, "pick up the mug", unnorm_key="x")

    np.testing.assert_array_equal(np.asarray(o4["action_tokens"]),
                                  np.asarray(od["action_tokens"]))
    a4 = np.asarray(o4["actions"], np.float32)
    assert np.isfinite(a4).all() and a4.shape == (serving.action_dim,)
