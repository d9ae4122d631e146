"""Serving fast path (prefill-KV + split-attention decode) vs legacy cache.

The round-2 decode redesign (llama.prefill/greedy_decode) must produce
token-identical results to the round-1 stacked-cache path and to a direct
no-cache full forward. Covers GQA (Mistral-style) and hidden-state taps.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openvla_probe_tpu.models import llama, vla, vlm


def _tiny_cfg(**kw):
    return llama.LlamaConfig.tiny(**kw)


def _serving(llm_cfg, key=0):
    cfg = vlm.VLMConfig(
        llm=llm_cfg,
        vision=(
            # single tiny ViT tower
            __import__("openvla_probe_tpu.models.vit", fromlist=["ViTConfig"]).ViTConfig.tiny(
                num_register_tokens=4, no_embed_class=True
            ),
            __import__("openvla_probe_tpu.models.vit", fromlist=["ViTConfig"]).ViTConfig.tiny(),
        ),
        vision_names=("dino", "siglip"),
        arch_specifier="no-align+fused-gelu-mlp",
    )
    serving = vla.VLAServingConfig(vlm=cfg, action_dim=5, prompt_pad_len=12,
                                   codec_vocab_size=llm_cfg.vocab_size)
    params = vlm.init_params(cfg, jax.random.key(key))
    return cfg, serving, params


def _example(serving, seed=0, B=2):
    r = np.random.default_rng(seed)
    S = serving.vlm.vision[0].image_size
    pixels = r.normal(size=(B, 6, S, S)).astype(np.float32)
    P = serving.prompt_pad_len
    ids = np.zeros((B, P), np.int32)
    lens = []
    for b in range(B):
        n = int(r.integers(4, P - 1))
        ids[b, :n] = np.concatenate([[1], r.integers(3, 400, n - 1)])
        lens.append(n)
    q01 = -np.ones(5, np.float32)
    q99 = np.ones(5, np.float32)
    mask = np.array([True] * 4 + [False])
    return (jnp.asarray(pixels), jnp.asarray(ids), jnp.asarray(lens, jnp.int32),
            jnp.asarray(q01), jnp.asarray(q99), jnp.asarray(mask))


def _run(params, serving, ex, collect=False):
    return vla.predict_action_core(params, serving, *ex, collect_hidden_states=collect)


@pytest.mark.parametrize("kv_heads", [4, 2])  # MHA and GQA
def test_fastpath_matches_legacy(kv_heads):
    import dataclasses

    llm_cfg = _tiny_cfg(num_key_value_heads=kv_heads)
    cfg, serving, params = _serving(llm_cfg)
    ex = _example(serving)

    legacy = _run(params, serving, ex, collect=True)
    fast = _run(params, dataclasses.replace(serving, decode_impl="frozen_kv"),
                ex, collect=True)

    np.testing.assert_array_equal(
        np.asarray(legacy["action_tokens"]), np.asarray(fast["action_tokens"])
    )
    np.testing.assert_allclose(
        np.asarray(legacy["actions"]), np.asarray(fast["actions"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(legacy["hidden_pooled"]), np.asarray(fast["hidden_pooled"]),
        atol=1e-5,
    )


def test_greedy_decode_matches_full_forward():
    """Split-attention decode == running the growing sequence through the
    plain no-cache forward each step (the ground-truth incremental contract)."""
    cfg = _tiny_cfg()
    params = llama.init_params(cfg, jax.random.key(1))
    r = np.random.default_rng(7)
    B, T = 2, 9
    ids = jnp.asarray(r.integers(3, 500, (B, T)), jnp.int32)
    embeds = llama.embed_tokens(params, ids)
    mask = jnp.ones((B, T), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(T), (B, T))

    pf = llama.prefill(params, cfg, embeds, mask, pos)
    from openvla_probe_tpu.ops.linear import matmul_t

    first = matmul_t(pf["last_hidden_state"][:, -1], params["lm_head"]).argmax(-1).astype(jnp.int32)
    n_steps = 4
    toks, margins = llama.greedy_decode(
        params, cfg, pf["kv"], mask,
        first_token=first, start_pos=jnp.full((B,), T, jnp.int32), n_steps=n_steps,
    )
    assert margins.shape == (B, n_steps) and bool((np.asarray(margins) >= 0).all())
    got = np.concatenate([np.asarray(first)[:, None], np.asarray(toks)], axis=1)

    # ground truth: re-run the full growing sequence without any cache
    cur = np.asarray(ids)
    want = []
    for _ in range(n_steps + 1):
        e = llama.embed_tokens(params, jnp.asarray(cur))
        m = jnp.ones(cur.shape, jnp.int32)
        p = jnp.broadcast_to(jnp.arange(cur.shape[1]), cur.shape)
        out = llama.forward(params, cfg, e, m, p)
        nxt = np.asarray(out["logits"][:, -1].argmax(-1)).astype(np.int32)
        want.append(nxt)
        cur = np.concatenate([cur, nxt[:, None]], axis=1)
    np.testing.assert_array_equal(got, np.stack(want, 1)[:, : n_steps + 1])


def test_prefill_taps_match_forward_taps():
    cfg = _tiny_cfg()
    params = llama.init_params(cfg, jax.random.key(2))
    r = np.random.default_rng(11)
    B, T = 2, 7
    ids = jnp.asarray(r.integers(3, 500, (B, T)), jnp.int32)
    embeds = llama.embed_tokens(params, ids)
    mask = jnp.asarray([[1] * 7, [1] * 5 + [0] * 2], jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(T), (B, T))

    a = llama.prefill(params, cfg, embeds, mask, pos, collect_hidden_states=True)
    b = llama.forward(params, cfg, embeds, mask, pos, collect_hidden_states=True)
    np.testing.assert_allclose(
        np.asarray(a["hidden_pooled"]), np.asarray(b["hidden_pooled"]), atol=1e-5
    )


@pytest.mark.parametrize("quant", ["bf16", "int8", "int4", "mix", "nibble"])
def test_fused_serving_weights_token_identical(quant):
    """fuse_serving_params (qkv + gate_up stacks) must be BITWISE identical:
    each output channel's dot is unchanged, only the dispatch count drops.
    Grouped-int4 and mixed leaves concat every copy on ITS output axis —
    the group structure (which covers the shared in-dim) is untouched."""
    llm_cfg = _tiny_cfg()
    cfg, serving, params = _serving(llm_cfg)
    if quant != "bf16":
        from openvla_probe_tpu.ops.linear import quantize_params

        bits = {"int8": 8, "int4": 4, "mix": "mix",
                "nibble": "nibble"}[quant]
        params = {**params, "llm": quantize_params(params["llm"], bits=bits,
                                                   group_size=32)}
    ex = _example(serving)
    want = _run(params, serving, ex)

    fused = {**params, "llm": llama.fuse_serving_params(params["llm"])}
    assert "qkv_proj" in fused["llm"]["layers"] and "q_proj" not in fused["llm"]["layers"]
    got = _run(fused, serving, ex)
    np.testing.assert_array_equal(
        np.asarray(want["action_tokens"]), np.asarray(got["action_tokens"]))
    np.testing.assert_array_equal(
        np.asarray(want["actions"]), np.asarray(got["actions"]))
    # fast path too
    import dataclasses

    got_fast = _run(fused, dataclasses.replace(serving, decode_impl="frozen_kv"), ex)
    np.testing.assert_array_equal(
        np.asarray(want["action_tokens"]), np.asarray(got_fast["action_tokens"]))


@pytest.mark.parametrize("kv_heads", [4, 2])
def test_split_prefill_matches_carry(kv_heads):
    """Hybrid path (ys-emitted prefill KV padded into the S-slot cache) must be
    token- and capture-identical to the carry-based cached prefill."""
    import dataclasses

    llm_cfg = _tiny_cfg(num_key_value_heads=kv_heads)
    cfg, serving, params = _serving(llm_cfg)
    ex = _example(serving, seed=3)

    carry = _run(params, serving, ex, collect=True)
    hybrid = _run(params, dataclasses.replace(serving, split_prefill=True),
                  ex, collect=True)

    np.testing.assert_array_equal(
        np.asarray(carry["action_tokens"]), np.asarray(hybrid["action_tokens"])
    )
    np.testing.assert_allclose(
        np.asarray(carry["actions"]), np.asarray(hybrid["actions"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(carry["hidden_pooled"]), np.asarray(hybrid["hidden_pooled"]),
        atol=1e-5,
    )


def test_split_attention_i8_close_to_bf16():
    """int8 prefill-KV attention must track the exact split attention closely
    (weights-level turbo shortcut; exactness is not the contract)."""
    r = np.random.default_rng(5)
    B, T, A, H, Hkv, Dh = 2, 9, 4, 4, 2, 16
    q = jnp.asarray(r.normal(size=(B, 1, H, Dh)), jnp.float32)
    kp = jnp.asarray(r.normal(size=(B, T, Hkv, Dh)), jnp.float32)
    vp = jnp.asarray(r.normal(size=(B, T, Hkv, Dh)), jnp.float32)
    kd = jnp.asarray(r.normal(size=(B, A, Hkv, Dh)), jnp.float32)
    vd = jnp.asarray(r.normal(size=(B, A, Hkv, Dh)), jnp.float32)
    add_pre = jnp.zeros((B, 1, 1, T), jnp.float32)
    add_dec = jnp.where(jnp.arange(A)[None, None, None, :] < 2, 0.0, llama.NEG_INF)
    add_dec = jnp.broadcast_to(add_dec, (B, 1, 1, A)).astype(jnp.float32)

    exact = np.asarray(llama._split_attention(q, kp, vp, kd, vd, add_pre, add_dec))
    kvq = llama.quantize_prefill_kv(llama.PrefillKV(kp[None], vp[None]))
    got = np.asarray(llama._split_attention_i8(
        q, kvq.k[0], kvq.ks[0], kvq.v[0], kvq.vs[0], kd, vd, add_pre, add_dec))
    np.testing.assert_allclose(got, exact, atol=0.05, rtol=0.05)


def test_kv_int8_e2e_actions_close():
    """Full predict_action with kv_int8: decodes run, outputs stay close
    to the bf16 split path (same structure, int8 prefill KV)."""
    import dataclasses

    llm_cfg = _tiny_cfg(num_key_value_heads=2)
    cfg, serving, params = _serving(llm_cfg)
    ex = _example(serving, seed=11)

    frozen = dataclasses.replace(serving, decode_impl="frozen_kv")
    kv8 = dataclasses.replace(frozen, kv_int8=True)
    ref = _run(params, frozen, ex)
    got = _run(params, kv8, ex)
    assert got["action_tokens"].shape == ref["action_tokens"].shape
    # normalized actions live in [-1,1]; int8 KV drift must stay small where
    # the reference margins are not degenerate (random weights -> compare
    # the first decoded position, produced by the SAME prefill in both runs)
    np.testing.assert_array_equal(
        np.asarray(ref["action_tokens"][:, 0]), np.asarray(got["action_tokens"][:, 0])
    )
    # layer-scan decode (decode_unroll=False) agrees with the unrolled int8 path
    got_scan = _run(params, dataclasses.replace(kv8, decode_unroll=False), ex)
    np.testing.assert_array_equal(
        np.asarray(got["action_tokens"]), np.asarray(got_scan["action_tokens"])
    )


def test_flat_cache_matches_default(wrapper_or_parts=None):
    """flat_cache (4D [L,B,S,Hkv*Dh] carry) is a pure layout change: greedy
    tokens match the 5D default exactly on the same weights."""
    import dataclasses

    import numpy as np

    import jax

    from openvla_probe_tpu.models import vla, vlm
    from openvla_probe_tpu.ops.image import BackboneTransformSpec, ImageTransformConfig

    cfg = vlm.VLMConfig.tiny()
    params = vlm.init_params(cfg, jax.random.key(3))
    s = cfg.vision[0].image_size
    img_cfg = ImageTransformConfig(specs=(
        BackboneTransformSpec((s, s), "bicubic", (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
        BackboneTransformSpec((s, s), "bicubic", (0.5, 0.5, 0.5), (0.5, 0.5, 0.5)),
    ))
    stats = {"x": {"action": {"q01": -np.ones(5, np.float32),
                              "q99": np.ones(5, np.float32)}}}
    img = np.random.default_rng(1).integers(0, 256, (s, s, 3), dtype=np.uint8)

    class _Tok:
        def encode(self, t):
            return [1] + [(len(w) % 300) + 3 for w in t.split()]

    base = vla.VLAServingConfig(vlm=cfg, action_dim=5, prompt_pad_len=12,
                                codec_vocab_size=cfg.llm.vocab_size)
    a = vla.OpenVLA(params, base, _Tok(), stats, img_cfg).predict_action(
        img, "pick up the mug", unnorm_key="x")
    flat = dataclasses.replace(base, flat_cache=True)
    b = vla.OpenVLA(params, flat, _Tok(), stats, img_cfg).predict_action(
        img, "pick up the mug", unnorm_key="x")
    np.testing.assert_array_equal(a["action_tokens"], b["action_tokens"])
    np.testing.assert_array_equal(a["actions"], b["actions"])


def test_long_action_dim_serving():
    """action_dim != 7 (action-chunking regime): codec, mask, cache sizing,
    and the decode scan all follow the config (a 7-dim hardcode in synthetic
    stats crashed the first A=64 bench)."""
    import numpy as np

    import jax

    from openvla_probe_tpu.models import vla, vlm
    from openvla_probe_tpu.ops.image import BackboneTransformSpec, ImageTransformConfig

    cfg = vlm.VLMConfig.tiny()
    params = vlm.init_params(cfg, jax.random.key(5))
    s = cfg.vision[0].image_size
    img_cfg = ImageTransformConfig(specs=(
        BackboneTransformSpec((s, s), "bicubic", (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
        BackboneTransformSpec((s, s), "bicubic", (0.5, 0.5, 0.5), (0.5, 0.5, 0.5)),
    ))
    A = 11
    stats = {"x": {"action": {"q01": -np.ones(A, np.float32),
                              "q99": np.ones(A, np.float32),
                              "mask": np.array([True] * (A - 1) + [False])}}}
    img = np.random.default_rng(2).integers(0, 256, (s, s, 3), dtype=np.uint8)

    class _Tok:
        def encode(self, t):
            return [1] + [(len(w) % 300) + 3 for w in t.split()]

    serving = vla.VLAServingConfig(vlm=cfg, action_dim=A, prompt_pad_len=12,
                                   codec_vocab_size=cfg.llm.vocab_size)
    out = vla.OpenVLA(params, serving, _Tok(), stats, img_cfg).predict_action(
        img, "pick up the mug", unnorm_key="x")
    assert out["action_tokens"].shape == (A,)
    assert out["actions"].shape == (A,)
    assert np.isfinite(out["actions"]).all()
    # the masked last dim passes through un-normalized
    norm = out["normalized_actions"]
    assert out["actions"][-1] == norm[-1]
