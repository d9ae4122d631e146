"""pallas_kv8 tier: int8 stacked-carry cache + fused-dequant decode kernel.

The stacked-cache scan is the A/B-measured fastest decode, but XLA streams
its carry cache in bf16 — every lax int8-cache formulation re-materialized
dequantized K/V in HBM and lost (PERF_r03.md). This tier stores the carry
cache itself in int8 and hands attention to a Pallas kernel whose BlockSpec
index maps take the layer index via scalar prefetch. These tests pin:

  * the kernel == a pure-XLA dequantized-attention reference (interpret mode)
  * quantize_kv_cache roundtrip error stays at int8-absmax scale
  * the full serving path runs and matches the turbo tier's greedy tokens on
    the tiny model (same weights; int8 cache is a sub-margin perturbation)
  * the config matrix: for_tier wiring, tier<->decode_impl coupling, the
    OVLA_STACKED_KV8 env override and its conflict rules, the GQA guard
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openvla_probe_tpu.models import llama, vla, vlm
from openvla_probe_tpu.models.llama import LlamaConfig
from openvla_probe_tpu.models.vit import ViTConfig
from openvla_probe_tpu.ops.decode_attention import stacked_decode_attention_i8
from openvla_probe_tpu.ops.image import BackboneTransformSpec, ImageTransformConfig

NEG_INF = -2.3819763e38


def _quant_np(x):
    s = np.maximum(np.abs(x).max(-1), 1e-8) / 127.0
    qi = np.clip(np.round(x / s[..., None]), -127, 127).astype(np.int8)
    return qi, s.astype(np.float32)


def test_kernel_matches_dequant_reference():
    rng = np.random.default_rng(0)
    L, B, S, H, Dh = 3, 2, 128, 4, 128
    q = jnp.asarray(rng.normal(size=(B, 1, H, Dh)), jnp.bfloat16)
    kf = rng.normal(size=(L, B, S, H, Dh)).astype(np.float32)
    vf = rng.normal(size=(L, B, S, H, Dh)).astype(np.float32)
    kq, ks = _quant_np(kf)
    vq, vs = _quant_np(vf)
    valid = (rng.random((B, S)) > 0.3).astype(np.int32)
    valid[:, :4] = 1

    for li in (0, 2):
        out = stacked_decode_attention_i8(
            q, jnp.asarray(kq.reshape(L, B, S, H * Dh)), jnp.asarray(ks),
            jnp.asarray(vq.reshape(L, B, S, H * Dh)), jnp.asarray(vs),
            jnp.asarray(valid), jnp.int32(li), interpret=True)
        kd = kq[li].astype(np.float32) * ks[li][..., None]
        vd = vq[li].astype(np.float32) * vs[li][..., None]
        s = np.einsum("bthd,bshd->bhts", np.asarray(q, np.float32), kd) / np.sqrt(Dh)
        s = np.where(valid[:, None, None, :] > 0, s, NEG_INF)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        ref = np.einsum("bhts,bshd->bthd", p, vd)
        err = np.abs(np.asarray(out, np.float32) - ref).max()
        assert err < 0.02, f"layer {li}: {err}"  # bf16 output cast dominates


def test_kernel_layer_selection_is_exact():
    """Two layers with very different V values: the scalar-prefetched index
    must stream exactly the requested layer's blocks."""
    rng = np.random.default_rng(1)
    L, B, S, H, Dh = 2, 1, 128, 2, 128
    q = jnp.asarray(rng.normal(size=(B, 1, H, Dh)), jnp.bfloat16)
    vf = np.stack([np.full((B, S, H, Dh), 1.0, np.float32),
                   np.full((B, S, H, Dh), -3.0, np.float32)])
    kf = rng.normal(size=(L, B, S, H, Dh)).astype(np.float32)
    kq, ks = _quant_np(kf)
    vq, vs = _quant_np(vf)
    valid = np.ones((B, S), np.int32)
    for li, expect in ((0, 1.0), (1, -3.0)):
        out = np.asarray(stacked_decode_attention_i8(
            q, jnp.asarray(kq.reshape(L, B, S, H * Dh)), jnp.asarray(ks),
            jnp.asarray(vq.reshape(L, B, S, H * Dh)), jnp.asarray(vs),
            jnp.asarray(valid), jnp.int32(li), interpret=True), np.float32)
        np.testing.assert_allclose(out, expect, rtol=0.02)


def test_quantize_kv_cache_roundtrip():
    rng = np.random.default_rng(2)
    cfg = LlamaConfig.tiny()
    cache = llama.KVCache(
        jnp.asarray(rng.normal(size=(cfg.num_hidden_layers, 2, 8,
                                     cfg.num_key_value_heads, cfg.head_dim)),
                    jnp.float32),
        jnp.asarray(rng.normal(size=(cfg.num_hidden_layers, 2, 8,
                                     cfg.num_key_value_heads, cfg.head_dim)),
                    jnp.float32))
    cq = llama.quantize_kv_cache(cache)
    L, B, S, Hkv, Dh = cache.k.shape
    assert cq.kq.shape == (L, B, S, Hkv * Dh) and cq.kq.dtype == jnp.int8
    assert cq.ks.shape == (L, B, S, Hkv)
    back = cq.kq.reshape(L, B, S, Hkv, Dh).astype(jnp.float32) * cq.ks[..., None]
    rel = np.abs(np.asarray(back - cache.k)) / np.abs(np.asarray(cache.k)).max()
    assert rel.max() < 0.005  # absmax int8: <= scale/2 per element


def test_gqa_kernel_matches_reference():
    """GQA (Hkv < H): each kv head's dequantized tile serves its n_rep query
    heads — kernel output matches the repeat_kv einsum reference."""
    rng = np.random.default_rng(3)
    L, B, S, H, Hkv, Dh = 2, 2, 128, 4, 2, 128
    n_rep = H // Hkv
    q = jnp.asarray(rng.normal(size=(B, 1, H, Dh)), jnp.bfloat16)
    kf = rng.normal(size=(L, B, S, Hkv, Dh)).astype(np.float32)
    vf = rng.normal(size=(L, B, S, Hkv, Dh)).astype(np.float32)
    kq, ks = _quant_np(kf)
    vq, vs = _quant_np(vf)
    valid = np.ones((B, S), np.int32)
    li = 1
    out = stacked_decode_attention_i8(
        q, jnp.asarray(kq.reshape(L, B, S, Hkv * Dh)), jnp.asarray(ks),
        jnp.asarray(vq.reshape(L, B, S, Hkv * Dh)), jnp.asarray(vs),
        jnp.asarray(valid), jnp.int32(li), interpret=True)
    kd = np.repeat(kq[li].astype(np.float32) * ks[li][..., None], n_rep, axis=2)
    vd = np.repeat(vq[li].astype(np.float32) * vs[li][..., None], n_rep, axis=2)
    s = np.einsum("bthd,bshd->bhts", np.asarray(q, np.float32), kd) / np.sqrt(Dh)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bhts,bshd->bthd", p, vd)
    err = np.abs(np.asarray(out, np.float32) - ref).max()
    assert err < 0.02, err


# --- config matrix -----------------------------------------------------------

def test_for_tier_pallas_kv8():
    base = vlm.VLMConfig.tiny()
    c = vla.VLAServingConfig.for_tier(base, "pallas_kv8")
    assert c.tier == "pallas_kv8" and c.decode_impl == "stacked_kv8"
    assert c.vlm == base.turbo() and not c.kv_int8


def test_tier_decode_impl_coupling():
    base = vlm.VLMConfig.tiny()
    with pytest.raises(ValueError, match="imply each other"):
        vla.VLAServingConfig(vlm=base, tier="pallas_kv8")  # stacked default
    with pytest.raises(ValueError, match="imply each other"):
        vla.VLAServingConfig(vlm=base, tier="turbo", decode_impl="stacked_kv8")


def test_env_override_stacked_kv8(monkeypatch):
    base = vla.VLAServingConfig(vlm=vlm.VLMConfig.tiny())
    monkeypatch.setenv("OVLA_STACKED_KV8", "1")
    c = base.with_env_overrides()
    assert c.tier == "pallas_kv8" and c.decode_impl == "stacked_kv8"
    monkeypatch.setenv("OVLA_KV_INT8", "1")
    with pytest.raises(ValueError, match="OVLA_STACKED_KV8"):
        base.with_env_overrides()


# --- end-to-end serving ------------------------------------------------------

class _Tok:
    def encode(self, t):
        return [1] + [(len(w) % 300) + 3 for w in t.split()]


@pytest.fixture(scope="module")
def tiny_parts():
    cfg = vlm.VLMConfig(
        llm=LlamaConfig.tiny(),
        vision=(ViTConfig.tiny(num_register_tokens=4, no_embed_class=True),
                ViTConfig.tiny()),
        vision_names=("dino", "siglip"),
        arch_specifier="no-align+fused-gelu-mlp",
    )
    params = vlm.init_params(cfg, jax.random.key(0))
    s = cfg.vision[0].image_size
    img_cfg = ImageTransformConfig(specs=(
        BackboneTransformSpec((s, s), "bicubic", (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
        BackboneTransformSpec((s, s), "bicubic", (0.5, 0.5, 0.5), (0.5, 0.5, 0.5)),
    ))
    stats = {"x": {"action": {"q01": -np.ones(5, np.float32),
                              "q99": np.ones(5, np.float32)}}}
    img = np.random.default_rng(0).integers(0, 256, (s, s, 3), dtype=np.uint8)
    return cfg, params, img_cfg, stats, img


def test_serving_end_to_end_matches_turbo(tiny_parts):
    cfg, params, img_cfg, stats, img = tiny_parts
    kw = dict(action_dim=5, prompt_pad_len=12, codec_vocab_size=cfg.llm.vocab_size)
    mt = vla.OpenVLA(params, vla.VLAServingConfig.for_tier(cfg, "turbo", **kw),
                     _Tok(), stats, img_cfg)
    mk = vla.OpenVLA(params, vla.VLAServingConfig.for_tier(cfg, "pallas_kv8", **kw),
                     _Tok(), stats, img_cfg)
    a = mt.predict_action(img, "pick up the mug", unnorm_key="x")
    b = mk.predict_action(img, "pick up the mug", unnorm_key="x")
    assert np.isfinite(b["actions"]).all()
    # same weights; the int8 cache is a sub-margin perturbation at these
    # scales — greedy tokens agree (margin-limited in general: PARITY_r03)
    np.testing.assert_array_equal(a["action_tokens"], b["action_tokens"])


def test_long_action_chunk_matches_turbo(tiny_parts):
    """The tier's target regime is LONG action chunks (decode-dominated):
    over 16 generated slots the int8-cache writes land at slots well past
    the prefill region and every step attends all prior generated tokens."""
    cfg, params, img_cfg, stats_base, img = tiny_parts
    A = 16
    stats = {"x": {"action": {"q01": -np.ones(A, np.float32),
                              "q99": np.ones(A, np.float32)}}}
    kw = dict(action_dim=A, prompt_pad_len=12, codec_vocab_size=cfg.llm.vocab_size)
    mt = vla.OpenVLA(params, vla.VLAServingConfig.for_tier(cfg, "turbo", **kw),
                     _Tok(), stats, img_cfg)
    mk = vla.OpenVLA(params, vla.VLAServingConfig.for_tier(cfg, "pallas_kv8", **kw),
                     _Tok(), stats, img_cfg)
    a = mt.predict_action(img, "pick up the mug", unnorm_key="x")
    b = mk.predict_action(img, "pick up the mug", unnorm_key="x")
    assert b["action_tokens"].shape == (A,)
    # same weights; tiny-scale margins are wide enough that the int8 cache
    # stays sub-margin across all 16 sequential steps
    np.testing.assert_array_equal(a["action_tokens"], b["action_tokens"])
