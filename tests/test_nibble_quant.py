"""Nibble-plane ("nibble") serving tier: ONE int8-grade trunk stored as two
4-bit planes (VERDICT r4 #1 — the nested successor of the dual-copy "mix").

quantize_weight_nibble splits the per-channel int8 codes by floor-division:
hi = floor(q8/16) in [-8,7], lo = q8-16*hi-8 in [-8,7], so 16*hi+lo+8
reconstructs EXACTLY. Prefill streams both planes (1 B/elem — int8 traffic)
and is bit-identical to the int8 tier; decode streams ONLY the hi plane
(0.5 B/elem — int4 traffic) with the lo midpoint as a rank-1 correction.
Resident bytes ≈ the int8 tier's — vs mix's 1.5x, which pinned B=24, broke
serving fusion, and kept 13B off-chip (PERF_r04.md). These tests pin the
partition algebra, the M-dispatch, and the tier's composition contracts.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openvla_probe_tpu.models import llama, vla, vlm
from openvla_probe_tpu.ops import linear


def test_nibble_partition_is_exact(rng):
    w = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))
    nw = linear.quantize_weight_nibble(w)
    assert linear.is_nibble_quant(nw)
    assert set(nw) == {"hi", "lo", "s"}
    assert nw["hi"].dtype == jnp.int4 and nw["hi"].shape == (64, 128)
    assert nw["lo"].dtype == jnp.int4 and nw["lo"].shape == (64, 128)
    assert nw["s"].shape == (64,)
    # EXACT reconstruction of the int8 codes
    q8 = np.asarray(linear.quantize_weight(w)["q"])
    got = np.asarray(linear.nibble_reconstruct_q8(
        {"hi": nw["hi"].astype(jnp.int8), "lo": nw["lo"].astype(jnp.int8),
         "s": nw["s"]}))
    np.testing.assert_array_equal(got, q8)
    # dequantize_weight reads the reconstructed codes — bitwise the int8 tier
    want = np.asarray(linear.dequantize_weight(linear.quantize_weight(w)))
    np.testing.assert_array_equal(np.asarray(linear.dequantize_weight(nw)), want)


def test_nibble_plane_ranges_cover_full_int8(rng):
    """Every int8 code in [-127, 127] must round-trip with planes inside the
    s4 range [-8, 7] (the 16*hi intermediate may touch -128 but not wrap)."""
    codes = jnp.arange(-127, 128, dtype=jnp.int32)
    # rows [v, 1.0]: per-row absmax = 1 -> s = 1/127, so column 0's int8
    # code is exactly `codes`
    w = jnp.stack([codes.astype(jnp.float32) / 127.0,
                   jnp.ones_like(codes, jnp.float32)], axis=1)
    nw = linear.quantize_weight_nibble(w, emit_codes=True)
    hi, lo = np.asarray(nw["hi"]), np.asarray(nw["lo"])
    assert hi.min() >= -8 and hi.max() <= 7
    assert lo.min() >= -8 and lo.max() <= 7
    rec = np.asarray(linear.nibble_reconstruct_q8(nw))
    np.testing.assert_array_equal(rec[:, 0], np.asarray(codes, np.int8))
    np.testing.assert_array_equal(rec[:, 1], np.full(255, 127, np.int8))


def test_nibble_hi_plane_error_bound(rng):
    """The decode approximation (16*hi + 7.5)·s is within 7.5 code steps of
    the exact int8 codes — the same magnitude as round-to-nearest-16."""
    w = jnp.asarray(rng.normal(size=(32, 64)).astype(np.float32))
    nw = linear.quantize_weight_nibble(w, emit_codes=True)
    q8 = np.asarray(linear.nibble_reconstruct_q8(nw)).astype(np.float64)
    approx = np.asarray(nw["hi"]).astype(np.float64) * 16 + 7.5
    assert np.abs(approx - q8).max() <= 7.5


def test_nibble_matmul_dispatch_by_m(rng):
    """Large M: bit-identical to the plain int8 leaf's w8a8 dot (exact code
    reconstruction). Small M (incl. M=1): the hi-plane dot with the rank-1
    midpoint correction — verified against an explicit dense reference."""
    w = jnp.asarray(rng.normal(size=(48, 64)).astype(np.float32))
    nw = linear.quantize_weight_nibble(w)
    w8 = linear.quantize_weight(w)

    x_big = jnp.asarray(rng.normal(size=(40, 64)), jnp.bfloat16)    # M > 32
    got = np.asarray(linear.matmul_t(x_big, nw).astype(jnp.float32))
    want = np.asarray(linear.matmul_t(x_big, w8).astype(jnp.float32))
    np.testing.assert_array_equal(got, want)

    for m in (8, 1):                                                # M <= 32
        x = jnp.asarray(rng.normal(size=(m, 64)), jnp.bfloat16)
        got = np.asarray(linear.matmul_t(x, nw).astype(jnp.float32))
        # dense reference of the SAME math: per-row int8 activations against
        # the hi-plane dequant (16*hi + 7.5)·s
        x_i8, s_x = linear._quantize_activations(x.reshape(m, -1))
        w_hat = (np.asarray(nw["hi"].astype(jnp.int8)).astype(np.float64) * 16
                 + 7.5) * np.asarray(nw["s"])[:, None]
        ref = (np.asarray(x_i8).astype(np.float64) @ w_hat.T
               ) * np.asarray(s_x).astype(np.float64)
        np.testing.assert_allclose(got, ref, rtol=1e-2, atol=1e-2)


def test_nibble_quantize_params_selectivity():
    """bits="nibble": decode-stream (trunk) leaves go nibble-plane; ViT
    leaves stay single-copy int8; norms untouched."""
    params = {
        "layers": {"q_proj": jnp.zeros((2, 64, 64), jnp.float32)},
        "lm_head": jnp.ones((128, 64), jnp.float32),
        "fc1_w": jnp.ones((64, 64), jnp.float32),      # ViT suffix
        "norm": jnp.ones((64,), jnp.float32),          # untouched
    }
    qp = linear.quantize_params(
        params, suffixes=linear.TURBO_QUANT_SUFFIXES, bits="nibble")
    assert linear.is_nibble_quant(qp["layers"]["q_proj"])
    assert linear.is_nibble_quant(qp["lm_head"])
    assert linear.is_quantized(qp["fc1_w"]) and "hi" not in qp["fc1_w"]
    assert qp["norm"].dtype == jnp.float32


def test_nibble_resident_bytes_match_int8():
    """The tier's point: a nibble leaf's resident bytes equal the int8
    leaf's (two half-byte planes + the same scales) — vs mix's 1.5x."""
    w = jnp.asarray(np.random.default_rng(0).normal(size=(256, 256)),
                    jnp.float32)

    def nbytes(leaf):
        return sum(int(np.prod(a.shape)) * a.dtype.itemsize
                   if a.dtype != jnp.int4 else int(np.prod(a.shape)) // 2
                   for a in jax.tree.leaves(leaf))

    n8 = nbytes(linear.quantize_weight(w))
    nn = nbytes(linear.quantize_weight_nibble(w))
    nm = nbytes(linear.quantize_weight_mixed(w))
    assert nn == n8
    assert nm > 1.4 * n8


def test_nibble_random_params_like_direct_init():
    """bench.py's direct init over a bits="nibble" eval_shape tree: planes
    span the full s4 range, scales positive."""
    cfg = llama.LlamaConfig.tiny()
    shapes = jax.eval_shape(
        lambda k: linear.quantize_params(llama.init_params(cfg, k),
                                         bits="nibble"),
        jax.random.key(0))
    p = linear.random_params_like_eager_int4(shapes, jax.random.key(1))
    q = p["layers"]["q_proj"]
    assert q["hi"].dtype == jnp.int4 and q["lo"].dtype == jnp.int4
    hi = np.asarray(q["hi"].astype(jnp.int8))
    assert hi.min() >= -8 and hi.max() <= 7
    assert np.all(np.asarray(q["s"]) > 0)


def test_nibble_stacked_forward_close_to_bf16(rng):
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.key(0))
    qp = linear.quantize_params(params, bits="nibble")
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 12)))
    mask = jnp.ones((1, 12), jnp.int32)
    pos = jnp.arange(12)[None]
    e = llama.embed_tokens(params, ids)
    want = np.asarray(llama.forward(params, cfg, e, mask, pos)["logits"])
    got = np.asarray(llama.forward(qp, cfg, e, mask, pos)["logits"])
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert rel < 0.3, rel


def test_nibble_prefill_bitmatches_int8_tier(rng):
    """The headline numeric contract: at prefill M the nibble trunk's matmul
    operands are EXACTLY the int8 tier's (reconstructed codes == the codes),
    so full-forward logits at prefill shapes bit-match the int8 tree."""
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.key(0))
    qn = linear.quantize_params(params, bits="nibble")
    q8 = linear.quantize_params(params, bits=8)
    T = linear._w4a8_group_m_max() + 8          # every matmul at prefill M
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, T)))
    mask = jnp.ones((1, T), jnp.int32)
    pos = jnp.arange(T)[None]
    e = llama.embed_tokens(params, ids)
    want = np.asarray(llama.forward(q8, cfg, e, mask, pos)["logits"])
    got = np.asarray(llama.forward(qn, cfg, e, mask, pos)["logits"])
    np.testing.assert_array_equal(got, want)


class _Tok:
    def encode(self, t):
        return [1] + [(len(w) % 300) + 3 for w in t.split()]


def test_nibble_serving_e2e_first_token_matches_hybrid(rng):
    """Full tiny serving path on a nibble tree: prefill trunk matmuls run at
    M > the dispatch threshold (exact-int8 reconstruction — int8-tier
    numerics), the last-position lm_head at M = B (hi-plane dot). The first
    token must therefore match a HYBRID tree: int8 everywhere + nibble
    lm_head (both paths reach the identical _w8a8_dot/_nib_hi_dot graphs)."""
    from openvla_probe_tpu.models import vit
    from openvla_probe_tpu.ops.image import (BackboneTransformSpec,
                                             ImageTransformConfig)

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
    assert serving.prefill_len > linear._w4a8_group_m_max()

    qnib = linear.quantize_params(params, linear.TURBO_QUANT_SUFFIXES,
                                  bits="nibble")
    q8 = linear.quantize_params(params, linear.TURBO_QUANT_SUFFIXES, bits=8)
    q_hybrid = dict(q8)
    q_hybrid["llm"] = {**q8["llm"], "lm_head": qnib["llm"]["lm_head"]}
    m_nib = vla.OpenVLA(qnib, serving, _Tok(), stats, img_cfg)
    m_hyb = vla.OpenVLA(q_hybrid, serving, _Tok(), stats, img_cfg)
    o_nib = m_nib.predict_action(img, "pick up the mug", unnorm_key="x")
    o_hyb = m_hyb.predict_action(img, "pick up the mug", unnorm_key="x")
    assert (np.asarray(o_nib["action_tokens"])[0]
            == np.asarray(o_hyb["action_tokens"])[0])
    a = np.asarray(o_nib["actions"], np.float32)
    assert np.isfinite(a).all() and a.shape == (5,)
    o2 = m_nib.predict_action(img, "pick up the mug", unnorm_key="x")
    np.testing.assert_array_equal(np.asarray(o_nib["action_tokens"]),
                                  np.asarray(o2["action_tokens"]))


def test_nibble_grad_ste(rng):
    """QLoRA-style d/dx through a nibble leaf: the STE backward flows through
    the hi-plane dequant at decode M and the reconstructed-int8 dequant at
    prefill M (same contract as the int8/int4 custom VJPs)."""
    w = jnp.asarray(rng.normal(size=(32, 64)).astype(np.float32))
    nw = linear.quantize_weight_nibble(w)

    for m, w_ref in ((8, (np.asarray(nw["hi"].astype(jnp.int8)) * 16.0 + 7.5)
                      * np.asarray(nw["s"])[:, None]),
                     (40, np.asarray(linear.dequantize_weight(nw, jnp.float32)))):
        x = jnp.asarray(rng.normal(size=(m, 64)), jnp.float32)

        def f(xx):
            return jnp.sum(linear.matmul_t(xx, nw).astype(jnp.float32))

        dx = np.asarray(jax.grad(f)(x))
        # STE: dx = 1·(ones @ W_deq) per row
        want = np.broadcast_to(w_ref.astype(np.float32).sum(0), dx.shape)
        np.testing.assert_allclose(dx, want, rtol=2e-2, atol=2e-2)


def test_nibble_sharding_specs():
    """shard_params on a nibble leaf: both planes take the per-channel int8
    "q" rules, "s" the per-channel scale rule."""
    from jax.sharding import Mesh
    from openvla_probe_tpu.parallel.sharding import shard_params

    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("dp", "tp"))
    L, D = 2, 256
    tree = {"layers": {
        "q_proj": {"hi": jnp.zeros((L, D, D), jnp.int8),
                   "lo": jnp.zeros((L, D, D), jnp.int8),
                   "s": jnp.zeros((L, D), jnp.float32)},
        "o_proj": {"hi": jnp.zeros((L, D, D), jnp.int8),
                   "lo": jnp.zeros((L, D, D), jnp.int8),
                   "s": jnp.zeros((L, D), jnp.float32)},
    }}
    sh = shard_params(tree, mesh, "tp")
    qp = sh["layers"]["q_proj"]
    P = jax.sharding.PartitionSpec
    assert qp["hi"].spec == P(None, "tp", None)
    assert qp["lo"].spec == P(None, "tp", None)
    op = sh["layers"]["o_proj"]
    assert op["hi"].spec == P(None, None, "tp")
    assert op["lo"].spec == P(None, None, "tp")


def test_nibble_multilora_fuse_rejected():
    """fuse_bank_into_base must refuse a nibble base BEFORE touching any
    buffer (the widened-dot form doesn't exist for plane-split codes)."""
    from openvla_probe_tpu.models import multilora

    w = jnp.asarray(np.random.default_rng(0).normal(size=(32, 16)), jnp.float32)
    params = {"q_proj": linear.quantize_weight_nibble(w)}
    bank = {"q_proj": {"A": jnp.zeros((2, 4, 16)), "Bt": jnp.zeros((2, 4, 32))}}
    with pytest.raises(NotImplementedError, match="int8 and bf16 bases"):
        multilora.fuse_bank_into_base(params, bank)


def test_nibble_qlora_base_rejected():
    """init_lora_params must refuse a nibble-plane base loudly (flattening
    would recurse into the hi/lo planes and silently target nothing);
    QLoRA bases are int8 (same resident bytes) or grouped int4."""
    from openvla_probe_tpu.training import lora

    tree = {"q_proj": linear.quantize_weight_nibble(
        jnp.ones((16, 32), jnp.float32))}
    with pytest.raises(NotImplementedError, match="nibble-plane base"):
        lora.init_lora_params(tree, lora.LoRAConfig(r=4), jax.random.key(0))
