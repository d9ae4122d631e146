"""Sparse-MoE FFN (models/moe.py) + expert parallelism over the `ep` axis.

Covers: exact (dropless) equivalence to a per-token dense loop, parity vs HF
MixtralForCausalLM (the routing-semantics contract), capacity-drop behavior,
cached decode == full forward for an MoE trunk, and an ep-sharded train step
matching the unsharded loss on the virtual 8-device mesh. The reference has
no MoE (dense Llama/Mistral/Phi backbones only) — this is a TPU-first
extension of the LLM family.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from openvla_probe_tpu.models import llama, moe, vlm
from openvla_probe_tpu.parallel.mesh import make_mesh
from openvla_probe_tpu.parallel.sharding import shard_params
from openvla_probe_tpu.training.train_state import OptimizerConfig, TrainState, make_optimizer
from openvla_probe_tpu.training.train_step import make_sharded_train_step, make_train_step
from openvla_probe_tpu.vla.action_tokenizer import ActionCodec


def _moe_layer_params(rng, E=4, D=16, F=32):
    def w(*shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.2)

    return {
        "router": w(E, D),
        "gate_proj": w(E, F, D),
        "up_proj": w(E, F, D),
        "down_proj": w(E, D, F),
    }


def _dense_loop_reference(lp, h, top_k):
    """Per-token numpy loop with the same routing semantics (no capacity)."""
    E = lp["router"].shape[0]
    B, T, D = h.shape
    x = np.asarray(h, np.float64).reshape(-1, D)
    router = np.asarray(lp["router"], np.float64)
    out = np.zeros_like(x)
    for s in range(x.shape[0]):
        logits = router @ x[s]
        probs = np.exp(logits - logits.max())
        probs /= probs.sum()
        top = np.argsort(-probs)[:top_k]
        w = probs[top] / probs[top].sum()
        for e, we in zip(top, w):
            g = np.asarray(lp["gate_proj"][e], np.float64) @ x[s]
            u = np.asarray(lp["up_proj"][e], np.float64) @ x[s]
            act = g / (1 + np.exp(-g)) * u  # silu(g) * u
            out[s] += we * (np.asarray(lp["down_proj"][e], np.float64) @ act)
    return out.reshape(B, T, D)


def test_moe_ffn_matches_dense_loop(rng):
    lp = _moe_layer_params(rng)
    h = jnp.asarray(rng.normal(size=(2, 5, 16)).astype(np.float32))
    y, aux = moe.moe_ffn(lp, h, top_k=2, capacity=10)  # capacity == S: dropless
    want = _dense_loop_reference(lp, h, top_k=2)
    np.testing.assert_allclose(np.asarray(y), want, atol=2e-5, rtol=1e-4)
    balance, z = np.asarray(aux)
    assert np.isfinite(balance) and balance >= 1.0 - 1e-6
    # router z-loss: mean (logsumexp of fp32 router logits)^2, positive
    assert np.isfinite(z) and z > 0


def test_moe_capacity_drops_excess_tokens(rng):
    """Zero router => uniform probs => every token picks experts 0 and 1;
    with capacity=1 only the first token gets a slot, the rest emit 0."""
    lp = _moe_layer_params(rng)
    lp["router"] = jnp.zeros_like(lp["router"])
    h = jnp.asarray(rng.normal(size=(1, 6, 16)).astype(np.float32))
    y, _ = moe.moe_ffn(lp, h, top_k=2, capacity=1)
    y = np.asarray(y)
    assert np.abs(y[0, 0]).max() > 0
    np.testing.assert_array_equal(y[0, 1:], 0.0)


def test_moe_matches_hf_mixtral(rng):
    """Full-trunk parity vs HF MixtralForCausalLM (routing + expert SwiGLU +
    GQA attention), dropless capacity."""
    import torch
    from transformers import MixtralConfig, MixtralForCausalLM

    torch.manual_seed(0)
    hf_cfg = MixtralConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        sliding_window=None, attn_implementation="eager",
        tie_word_embeddings=False,
    )
    model = MixtralForCausalLM(hf_cfg).eval()
    cfg = llama.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        moe_experts=4, moe_top_k=2, moe_capacity_factor=100.0,  # dropless
        max_position_embeddings=128, dtype=jnp.float32,
    )
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = llama.params_from_hf(state, cfg)
    assert params["layers"]["gate_proj"].shape == (3, 4, 128, 64)

    ids = rng.integers(0, 256, size=(2, 10))
    with torch.no_grad():
        want = model(input_ids=torch.tensor(ids)).logits.numpy()
    e = llama.embed_tokens(params, jnp.asarray(ids))
    out = llama.forward(
        params, cfg, e, jnp.ones((2, 10), jnp.int32),
        jnp.broadcast_to(jnp.arange(10), (2, 10)))
    got = np.asarray(out["logits"])
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))
    assert "moe_aux" in out and np.isfinite(float(out["moe_aux"]))

    # the default dispatch ('auto' at dropless capacity) is the SORTED path;
    # pin the einsum formulation against HF too
    import dataclasses
    out_e = llama.forward(
        params, dataclasses.replace(cfg, moe_dispatch="einsum"), e,
        jnp.ones((2, 10), jnp.int32), jnp.broadcast_to(jnp.arange(10), (2, 10)))
    np.testing.assert_allclose(np.asarray(out_e["logits"]), want, atol=5e-4, rtol=1e-3)


def test_moe_kv_cache_decode_matches_full(rng):
    """Cached prefill+decode == uncached full forward for an MoE trunk (the
    serving `_mlp` router branch; decode recompiles its own capacity)."""
    cfg = llama.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        moe_experts=4, moe_capacity_factor=100.0, dtype=jnp.float32,
    )
    params = llama.init_params(cfg, jax.random.key(0))
    ids = rng.integers(0, 128, size=(1, 6))
    e = llama.embed_tokens(params, jnp.asarray(ids))
    full = np.asarray(llama.forward(
        params, cfg, e, jnp.ones((1, 6), jnp.int32), jnp.arange(6)[None])["logits"])

    cache = llama.KVCache.zeros(cfg, 1, 8, dtype=jnp.float32)
    mask = jnp.zeros((1, 8), jnp.int32).at[:, :4].set(1)
    out = llama.forward(params, cfg, e[:, :4], mask, jnp.arange(4)[None],
                        cache=cache, cache_index=jnp.int32(0))
    step = np.asarray(out["logits"][:, -1])
    np.testing.assert_allclose(step, full[:, 3], atol=1e-4, rtol=1e-4)
    cache = out["cache"]
    for t in (4, 5):
        mask = jnp.zeros((1, 8), jnp.int32).at[:, : t + 1].set(1)
        out = llama.forward(params, cfg, e[:, t : t + 1], mask,
                            jnp.full((1, 1), t), cache=out["cache"],
                            cache_index=jnp.int32(t))
        np.testing.assert_allclose(
            np.asarray(out["logits"][:, 0]), full[:, t], atol=1e-4, rtol=1e-4)


def test_moe_vla_serving_e2e():
    """The flagship VLA serving path (predict_action: one-jit prefill +
    greedy decode) runs end-to-end on an MoE trunk — the serving scans hit
    `_mlp`'s router branch with fused qkv / unfused experts."""
    from openvla_probe_tpu.models import vla
    from openvla_probe_tpu.ops.image import BackboneTransformSpec, ImageTransformConfig

    cfg = vlm.VLMConfig.tiny(
        llm=llama.LlamaConfig.tiny(moe_experts=4, moe_capacity_factor=100.0))
    serving = vla.VLAServingConfig(vlm=cfg, action_dim=5, prompt_pad_len=12,
                                   codec_vocab_size=cfg.llm.vocab_size)
    params = vlm.init_params(cfg, jax.random.key(0))
    s = cfg.vision[0].image_size
    img_cfg = ImageTransformConfig(specs=(
        BackboneTransformSpec((s, s), "bicubic", (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
        BackboneTransformSpec((s, s), "bicubic", (0.5, 0.5, 0.5), (0.5, 0.5, 0.5)),
    ))

    class _Tok:
        def encode(self, t):
            return [1] + [(len(w) % 300) + 3 for w in t.split()]

    stats = {"x": {"action": {"q01": -np.ones(5, np.float32),
                              "q99": np.ones(5, np.float32)}}}
    img = np.random.default_rng(0).integers(0, 256, (s, s, 3), dtype=np.uint8)
    model = vla.OpenVLA(params, serving, _Tok(), stats, img_cfg)
    o1 = model.predict_action(img, "pick up the block", unnorm_key="x")
    o2 = model.predict_action(img, "pick up the block", unnorm_key="x")
    assert o1["actions"].shape == (5,) and np.isfinite(o1["actions"]).all()
    np.testing.assert_array_equal(o1["action_tokens"], o2["action_tokens"])  # greedy determinism


def test_moe_int8_experts(rng):
    """Weight-only int8 expert stacks (the turbo serving scheme): outputs
    track bf16 within quantization error; quantize_params matches the MoE
    expert leaves by name."""
    from openvla_probe_tpu.ops.linear import quantize_params

    lp = _moe_layer_params(rng)
    h = jnp.asarray(rng.normal(size=(2, 5, 16)).astype(np.float32))
    y_ref, _ = moe.moe_ffn(lp, h, top_k=2, capacity=10)
    lpq = quantize_params(lp)
    assert isinstance(lpq["gate_proj"], dict) and lpq["gate_proj"]["q"].dtype == jnp.int8
    assert lpq["gate_proj"]["s"].shape == (4, 32)
    assert not isinstance(lpq["router"], dict)  # router stays unquantized
    y_q, _ = moe.moe_ffn(lpq, h, top_k=2, capacity=10)
    err = np.abs(np.asarray(y_q) - np.asarray(y_ref))
    scale = np.abs(np.asarray(y_ref)).max()
    assert err.max() < 0.05 * max(scale, 1.0)

    # QLoRA form: streamed adapters over the frozen int8 expert base
    from openvla_probe_tpu.training import lora

    lcfg = lora.LoRAConfig(r=2)
    lq = lora.init_lora_params(lpq, lcfg, jax.random.key(3))
    assert lq["gate_proj"]["A"].shape == (4, 2, 16)
    attached = lora.attach_lora(lpq, lq, lcfg)
    y_a, _ = moe.moe_ffn(attached, h, top_k=2, capacity=10)
    np.testing.assert_allclose(np.asarray(y_a), np.asarray(y_q), atol=1e-6)  # B=0 init


def test_moe_pad_tokens_claim_no_capacity(rng):
    """Right-padded rows must not displace later rows' real tokens from
    expert capacity, and aux statistics exclude pads."""
    lp = _moe_layer_params(rng)
    lp["router"] = jnp.zeros_like(lp["router"])  # uniform: all pick experts 0+1
    h = jnp.asarray(rng.normal(size=(2, 6, 16)).astype(np.float32))
    valid = jnp.asarray([[1, 0, 0, 0, 0, 0], [1, 1, 1, 1, 1, 1]], jnp.int32)

    # capacity 7 (== n_valid): unmasked, row0's 5 pads (flattened first)
    # claim slots and row1's tail tokens are dropped
    y_unmasked, _ = moe.moe_ffn(lp, h, top_k=2, capacity=7)
    assert np.abs(np.asarray(y_unmasked)[1, 1:]).max() == 0.0
    # masked: the 7 valid tokens all fit; every valid row-1 token is served
    y_masked, aux = moe.moe_ffn(lp, h, top_k=2, capacity=7, token_valid=valid)
    ym = np.asarray(y_masked)
    assert all(np.abs(ym[1, t]).max() > 0 for t in range(6))
    # pads emit exactly zero (residual carries them)
    np.testing.assert_array_equal(ym[0, 1:], 0.0)
    # uniform router, valid-only stats: perfectly balanced aux == 1, and
    # zero logits make the z-loss exactly log(E)^2
    assert float(aux[0]) == pytest.approx(1.0, rel=1e-5)
    assert float(aux[1]) == pytest.approx(float(np.log(4.0) ** 2), rel=1e-5)


def test_moe_sorted_matches_einsum_dropless(rng):
    """moe_ffn_sorted (linear-cost ragged grouped matmul) == moe_ffn at
    dropless capacity — outputs, aux, and PAD masking."""
    lp = _moe_layer_params(rng)
    h = jnp.asarray(rng.normal(size=(2, 5, 16)).astype(np.float32))
    y_e, aux_e = moe.moe_ffn(lp, h, top_k=2, capacity=10)
    y_s, aux_s = moe.moe_ffn_sorted(lp, h, top_k=2)
    np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_e), atol=2e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(aux_s), np.asarray(aux_e), rtol=1e-6)

    valid = jnp.asarray([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], jnp.int32)
    y_em, aux_em = moe.moe_ffn(lp, h, top_k=2, capacity=10, token_valid=valid)
    y_sm, aux_sm = moe.moe_ffn_sorted(lp, h, top_k=2, token_valid=valid)
    np.testing.assert_allclose(np.asarray(y_sm), np.asarray(y_em), atol=2e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(aux_sm), np.asarray(aux_em), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(y_sm)[0, 3:], 0.0)  # pads emit 0

    # also under jit (argsort/bincount/scatter are all traceable)
    y_j, _ = jax.jit(lambda p, x: moe.moe_ffn_sorted(p, x, top_k=2))(lp, h)
    np.testing.assert_allclose(np.asarray(y_j), np.asarray(y_s), atol=1e-6)


def test_moe_sorted_gradients_match_einsum(rng):
    """Gradients flow through lax.ragged_dot_general (the sorted dispatch)
    and match the einsum path at dropless capacity — required for 'auto'
    dispatch to be safe in TRAINING, not just serving."""
    lp = _moe_layer_params(rng)
    h = jnp.asarray(rng.normal(size=(2, 5, 16)).astype(np.float32))

    def loss_einsum(lp):
        y, aux = moe.moe_ffn(lp, h, top_k=2, capacity=10)
        return (y ** 2).sum() + aux[0] + aux[1]

    def loss_sorted(lp):
        y, aux = moe.moe_ffn_sorted(lp, h, top_k=2)
        return (y ** 2).sum() + aux[0] + aux[1]

    g_e = jax.grad(loss_einsum)(lp)
    g_s = jax.grad(loss_sorted)(lp)
    for k in lp:
        assert float(jnp.abs(g_s[k]).max()) > 0, k
        np.testing.assert_allclose(
            np.asarray(g_s[k]), np.asarray(g_e[k]), atol=2e-4, rtol=1e-3,
            err_msg=k)


def test_moe_sorted_quantized_and_lora(rng):
    """The sorted path accepts the same three weight forms as the einsum
    path (plain / weight-only-int8 / streamed-LoRA) and matches it."""
    from openvla_probe_tpu.ops.linear import quantize_params
    from openvla_probe_tpu.training import lora

    lp = _moe_layer_params(rng)
    h = jnp.asarray(rng.normal(size=(2, 5, 16)).astype(np.float32))

    lpq = quantize_params(lp)
    y_e, _ = moe.moe_ffn(lpq, h, top_k=2, capacity=10)
    y_s, _ = moe.moe_ffn_sorted(lpq, h, top_k=2)
    np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_e), atol=2e-6, rtol=1e-5)

    lcfg = lora.LoRAConfig(r=2)
    lq = lora.init_lora_params(lpq, lcfg, jax.random.key(3))
    for leaf in lq.values():  # nonzero B so the low-rank term actually fires
        if leaf is not None:  # non-adapted leaves (router) carry no adapter
            leaf["B"] = jnp.asarray(rng.normal(size=leaf["B"].shape).astype(np.float32) * 0.1)
    attached = lora.attach_lora(lpq, lq, lcfg)
    y_ea, _ = moe.moe_ffn(attached, h, top_k=2, capacity=10)
    y_sa, _ = moe.moe_ffn_sorted(attached, h, top_k=2)
    assert np.abs(np.asarray(y_ea) - np.asarray(y_e)).max() > 1e-4  # adapters fired
    np.testing.assert_allclose(np.asarray(y_sa), np.asarray(y_ea), atol=2e-6, rtol=1e-5)


def test_moe_dispatch_config(rng):
    """_moe_mlp dispatch resolution: 'auto' goes sorted iff dropless;
    'sorted' with a dropping capacity raises."""
    import dataclasses

    h = jnp.asarray(rng.normal(size=(1, 8, 32)).astype(np.float32))
    cfg = llama.LlamaConfig.tiny(moe_experts=4)  # factor 2.0 == E/K: dropless
    lp = {k: v[0] for k, v in moe.init_layer_params(
        jax.random.key(0), 1, 4, 32, cfg.intermediate_size, jnp.float32).items()}

    y_auto, _ = llama._moe_mlp(cfg, lp, h)
    y_sorted, _ = llama._moe_mlp(dataclasses.replace(cfg, moe_dispatch="sorted"), lp, h)
    y_einsum, _ = llama._moe_mlp(dataclasses.replace(cfg, moe_dispatch="einsum"), lp, h)
    np.testing.assert_array_equal(np.asarray(y_auto), np.asarray(y_sorted))
    np.testing.assert_allclose(np.asarray(y_auto), np.asarray(y_einsum), atol=2e-6, rtol=1e-5)

    capped = dataclasses.replace(cfg, moe_capacity_factor=0.5)
    y_capped, _ = llama._moe_mlp(capped, lp, h)  # auto falls back to einsum
    assert y_capped.shape == h.shape
    with pytest.raises(ValueError, match="dropless-only"):
        llama._moe_mlp(dataclasses.replace(capped, moe_dispatch="sorted"), lp, h)


def test_hbm_budget_moe():
    """hbm_budget accounts expert-stacked FFNs: Mixtral-8x7B lands on the
    public ~46.7B stored / ~12.9B active figures and plans multi-way
    model parallelism; dense configs are unchanged (no active-params key)."""
    from scripts.hbm_budget import BudgetConfig, plan

    d = plan(BudgetConfig(llm="mixtral-8x7b-v0.1"))
    assert 46.0 < d["llm_params_b"] < 47.5
    assert 12.5 < d["llm_active_params_b"] < 13.5
    assert d["modes"]["int8"]["min_tp"] >= 4
    for mode in ("bf16", "int8"):
        m = d["modes"][mode]
        assert m["decode_weight_stream_ms_per_token_bs1"] < m["decode_weight_stream_ms_per_token"]

    d7 = plan(BudgetConfig())
    assert "llm_active_params_b" not in d7
    assert 6.5 < d7["llm_params_b"] < 7.0  # dense accounting unchanged


def test_moe_quantized_and_lora_expert_sharding_specs():
    """param_spec: quantized q/s and LoRA A/B expert leaves keep the ep rule
    and the +1 tp dim shift (review finding: they used to fall through to
    the dense rules)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from openvla_probe_tpu.parallel.sharding import param_spec

    mesh = make_mesh({"dp": 2, "ep": 2, "tp": 2}, jax.devices()[:8])
    L, E, F, D = 8, 8, 256, 64
    assert param_spec("llm/layers/gate_proj/q", (L, E, F, D), mesh, "tp") == P(None, "ep", "tp", None)
    assert param_spec("llm/layers/gate_proj/s", (L, E, F), mesh, "tp") == P(None, "ep", "tp")
    assert param_spec("llm/layers/down_proj/q", (L, E, D, F), mesh, "tp") == P(None, "ep", None, "tp")
    # (4096-wide D so the leaf clears MIN_SHARD_ELEMS' replicate-tiny rule)
    assert param_spec("llm/layers/down_proj/s", (L, E, 4096), mesh, "tp") == P(None, "ep", None)
    # LoRA factors now follow the BASE's tp layout too (multi-LoRA sharding
    # rules, addressed from the END so the E axis drops out): out-sharded
    # up_proj shards B's O dim, its A stays replicated; contraction-sharded
    # down_proj shards A's I dim
    assert param_spec("llm/layers/up_proj/A", (L, E, 32, D), mesh, "tp") == P(None, "ep", None, None)
    assert param_spec("llm/layers/up_proj/B", (L, E, F, 32), mesh, "tp") == P(None, "ep", "tp", None)
    assert param_spec("llm/layers/down_proj/A", (L, E, 32, F), mesh, "tp") == P(None, "ep", None, "tp")
    # dense quantized leaves keep their unshifted rules
    assert param_spec("llm/layers/gate_proj/q", (L, F, D), mesh, "tp") == P(None, "tp", None)
    # dense down s is tp-replicated (spans the un-sharded output dim)
    assert "tp" not in tuple(param_spec("llm/layers/down_proj/s", (L, 4096), mesh, "tp"))


def test_moe_pipeline_guard():
    """MoE configs are rejected by the pipeline step (its body drops the
    aux loss) with a pointer to the ep path."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import optax

    from openvla_probe_tpu.parallel.pipeline import make_pipeline_train_step

    cfg = vlm.VLMConfig.tiny(llm=llama.LlamaConfig.tiny(moe_experts=4))
    mesh = make_mesh({"dp": 2, "pp": 2}, jax.devices()[:4])
    with pytest.raises(NotImplementedError, match="ep"):
        make_pipeline_train_step(cfg, optax.adam(1e-4), mesh, n_micro=2)


def test_mixtral_catalog_entries():
    """Mixtral ids resolve through the standard catalog path; tiny variant
    materializes and runs a forward."""
    from openvla_probe_tpu.models import catalog

    for bid in ("mixtral-8x7b-v0.1", "mixtral-8x7b-instruct-v0.1"):
        c, _ = catalog.get_llm_backbone_and_prompt(bid)
        assert c.moe_experts == 8 and c.moe_top_k == 2
        assert c.num_key_value_heads == 8 and c.intermediate_size == 14336
        assert c.max_position_embeddings == 32768
        # default capacity is DROPLESS (== S) at these E/top_k — HF parity
        for S in (1, 7, 24, 301):
            assert moe.capacity(c.moe_experts, c.moe_top_k,
                                c.moe_capacity_factor, S) == S

    cfg, _ = catalog.get_llm_backbone_and_prompt("mixtral-tiny")
    params = llama.init_params(cfg, jax.random.key(0))
    assert params["layers"]["gate_proj"].shape[1] == 4
    ids = jnp.asarray([[1, 5, 9, 12]])
    e = llama.embed_tokens(params, ids)
    out = llama.forward(params, cfg, e, jnp.ones((1, 4), jnp.int32),
                        jnp.arange(4)[None])
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_moe_lora_stream_matches_merge_and_descends():
    """Streamed LoRA over an MoE trunk: adapters land on the [L, E, ...]
    expert stacks (router untouched), attached forward == merged forward,
    and a few adapter-only steps descend. Completes the MoE story:
    train / finetune / quantize / shard / serve."""
    import functools

    from openvla_probe_tpu.training import lora
    from openvla_probe_tpu.training.train_step import vla_loss_fn

    cfg = vlm.VLMConfig.tiny(
        llm=llama.LlamaConfig.tiny(moe_experts=4, moe_capacity_factor=100.0))
    codec = ActionCodec(vocab_size=cfg.llm.vocab_size)
    params = vlm.init_params(cfg, jax.random.key(0))
    lcfg = lora.LoRAConfig(r=4)
    lp = lora.init_lora_params(params, lcfg, jax.random.key(1))
    L, E, F, D = params["llm"]["layers"]["gate_proj"].shape
    assert lp["llm"]["layers"]["gate_proj"]["A"].shape == (L, E, 4, D)
    assert lp["llm"]["layers"]["gate_proj"]["B"].shape == (L, E, F, 4)
    assert lp["llm"]["layers"]["router"] is None  # router not adapted

    # make adapters nonzero so stream-vs-merge is a real comparison
    lp = jax.tree.map(
        lambda x: None if x is None
        else x + 0.01 * jax.random.normal(jax.random.key(2), x.shape, x.dtype),
        lp, is_leaf=lambda x: x is None)
    rng = np.random.default_rng(0)
    B, T, S = 2, 16, cfg.vision[0].image_size
    batch = {
        "input_ids": jnp.asarray(rng.integers(2, cfg.llm.vocab_size, (B, T)), jnp.int32),
        "attention_mask": jnp.ones((B, T), jnp.int32),
        "pixel_values": jnp.asarray(rng.normal(size=(B, 6, S, S)), jnp.float32),
        "labels": jnp.asarray(
            np.where(np.arange(T) >= T - 8,
                     rng.integers(cfg.llm.vocab_size - 256, cfg.llm.vocab_size, (B, T)),
                     -100), jnp.int32),
    }
    loss_fn = functools.partial(vla_loss_fn, codec=codec)
    streamed = lora.make_lora_loss_with_base(loss_fn, lcfg, stream=True)
    merged = lora.make_lora_loss_with_base(loss_fn, lcfg, stream=False)
    ls, _ = streamed(lp, params, cfg, batch)
    lm, _ = merged(lp, params, cfg, batch)
    assert float(ls) == pytest.approx(float(lm), rel=1e-4)

    # adapter-only training descends; expert adapters receive gradient
    import optax

    opt = optax.adam(5e-3)
    opt_state = opt.init(lp)
    losses = []
    for _ in range(4):
        (loss, _), g = jax.value_and_grad(
            lambda l: streamed(l, params, cfg, batch), has_aux=True)(lp)
        gb = g["llm"]["layers"]["gate_proj"]["A"]
        assert float(jnp.abs(gb).max()) > 0
        updates, opt_state = opt.update(g, opt_state, lp)
        lp = optax.apply_updates(lp, updates)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_moe_ep_sharded_serving_tokens_match():
    """Expert-parallel SERVING: predict_action over a dp x ep x tp mesh
    produces the same greedy tokens as the single-device run."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import functools as ft

    from openvla_probe_tpu.models import vla
    from openvla_probe_tpu.ops.image import BackboneTransformSpec, ImageTransformConfig

    cfg = vlm.VLMConfig.tiny(
        llm=llama.LlamaConfig.tiny(moe_experts=4, moe_capacity_factor=2.0))
    serving = vla.VLAServingConfig(vlm=cfg, action_dim=5, prompt_pad_len=12,
                                   codec_vocab_size=cfg.llm.vocab_size)
    params = vlm.init_params(cfg, jax.random.key(0))
    s = cfg.vision[0].image_size
    img_cfg = ImageTransformConfig(specs=(
        BackboneTransformSpec((s, s), "bicubic", (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
        BackboneTransformSpec((s, s), "bicubic", (0.5, 0.5, 0.5), (0.5, 0.5, 0.5)),
    ))
    rng = np.random.default_rng(0)
    B = 2
    image = rng.integers(0, 256, size=(B, 40, 40, 3), dtype=np.uint8)
    ids = np.zeros((B, serving.prompt_pad_len), np.int32)
    ids[:, 0] = 1
    ids[:, 1:7] = rng.integers(3, cfg.llm.vocab_size - 300, (B, 6))
    args = (image, ids, np.full((B,), 7, np.int32),
            -np.ones(5, np.float32), np.ones(5, np.float32),
            np.array([True] * 5))

    single = jax.jit(ft.partial(vla.predict_action_from_image,
                                cfg=serving, image_cfg=img_cfg))
    ja = [jnp.asarray(a) for a in args]
    want = np.asarray(single(
        params, image_u8=ja[0], input_ids=ja[1], prompt_len=ja[2],
        q01=ja[3], q99=ja[4], action_mask=ja[5])["action_tokens"])

    mesh = make_mesh({"dp": 2, "ep": 2, "tp": 2}, jax.devices()[:8])
    call, sharded_p = vla.make_sharded_predict(
        params, serving, mesh, image_cfg=img_cfg, strategy="tp")
    gspec = jax.tree.map(lambda x: x.sharding.spec,
                         sharded_p["llm"]["layers"]["gate_proj"])
    assert gspec[1] == "ep", f"experts not ep-sharded at serving: {gspec}"
    got = np.asarray(call(sharded_p, *args)["action_tokens"])
    np.testing.assert_array_equal(got, want)


def test_moe_ep_sharded_train_step_matches_unsharded():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = vlm.VLMConfig.tiny(
        llm=llama.LlamaConfig.tiny(moe_experts=4, moe_capacity_factor=2.0))
    codec = ActionCodec(vocab_size=cfg.llm.vocab_size)
    rng = np.random.default_rng(0)
    B, T, S = 4, 24, cfg.vision[0].image_size
    batch = {
        "input_ids": rng.integers(2, cfg.llm.vocab_size, (B, T)).astype(np.int32),
        "attention_mask": np.ones((B, T), np.int32),
        "pixel_values": rng.normal(size=(B, 6, S, S)).astype(np.float32),
        "labels": np.full((B, T), -100, np.int32),
    }
    batch["labels"][:, -8:] = rng.integers(
        cfg.llm.vocab_size - 256, cfg.llm.vocab_size, (B, 8))

    params = vlm.init_params(cfg, jax.random.key(0))
    opt = make_optimizer(OptimizerConfig(max_steps=10), params)
    base_state = TrainState.create(params, opt)
    base_step = make_train_step(cfg, opt, codec=codec)
    _, base_metrics = base_step(
        base_state, {k: jnp.asarray(v) for k, v in batch.items()})
    base_loss = float(base_metrics["loss"])
    assert "moe_aux" in base_metrics
    # ST-MoE router z-loss rides the metrics; zero-ish router init keeps it
    # near log(E)^2 at step 0
    assert float(base_metrics["moe_z"]) > 0

    params = vlm.init_params(cfg, jax.random.key(0))  # baseline donated its state
    mesh = make_mesh({"dp": 2, "ep": 2, "tp": 2}, jax.devices()[:8])
    state = TrainState.create(params, opt)
    shardings = shard_params(state, mesh, strategy="tp")
    # the expert stacks really shard their E dim over ep
    gspec = shardings.params["llm"]["layers"]["gate_proj"].spec
    assert gspec[1] == "ep"
    state = jax.device_put(state, shardings)
    from openvla_probe_tpu.parallel.mesh import data_sharding

    bsh = jax.tree.map(lambda _: data_sharding(mesh), batch)
    sharded_batch = jax.device_put(batch, bsh)
    step = make_sharded_train_step(cfg, opt, mesh, shardings, bsh, codec=codec)
    _, metrics = step(state, sharded_batch)
    assert float(metrics["loss"]) == pytest.approx(base_loss, rel=2e-4)
    assert float(metrics["moe_aux"]) == pytest.approx(
        float(base_metrics["moe_aux"]), rel=2e-4)
    assert float(metrics["moe_z"]) == pytest.approx(
        float(base_metrics["moe_z"]), rel=2e-4)


def test_moe_int4_experts(rng):
    """Grouped-int4 expert stacks (the footprint form): both the einsum and
    the sorted/ragged paths dequantize the group-major [E, G, O, gsz] codes
    per use; outputs track bf16 within int4 quantization error."""
    from openvla_probe_tpu.ops.linear import quantize_params

    lp = _moe_layer_params(rng)
    h = jnp.asarray(rng.normal(size=(2, 5, 16)).astype(np.float32))
    y_ref, _ = moe.moe_ffn(lp, h, top_k=2, capacity=10)
    lpq = quantize_params(lp, bits=4, group_size=8)
    gq = lpq["gate_proj"]
    assert gq["q"].dtype == jnp.int4
    assert gq["q"].shape == (4, 2, 32, 8)      # [E, G, O, gsz]
    assert gq["s"].shape == (4, 32, 2)         # [E, O, G]
    y_q, _ = moe.moe_ffn(lpq, h, top_k=2, capacity=10)
    err = np.abs(np.asarray(y_q) - np.asarray(y_ref))
    scale = np.abs(np.asarray(y_ref)).max()
    assert err.max() < 0.15 * max(scale, 1.0)
    # sorted dropless path handles the grouped form too and agrees with the
    # einsum path on the SAME quantized weights
    y_s, _ = moe.moe_ffn_sorted(lpq, h, top_k=2)
    np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_q),
                               atol=2e-5, rtol=1e-4)
