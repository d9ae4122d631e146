"""Weight-only int8 quantization tests (CPU fallback path + semantics)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openvla_probe_tpu.models import llama
from openvla_probe_tpu.ops import linear


def test_quantize_dequantize_error_bounded(rng):
    w = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))
    qw = linear.quantize_weight(w)
    assert qw["q"].dtype == jnp.int8
    wd = linear.dequantize_weight(qw, jnp.float32)
    # per-row error <= scale/2 = absmax/254
    row_max = np.abs(np.asarray(w)).max(axis=1, keepdims=True)
    assert np.all(np.abs(np.asarray(wd) - np.asarray(w)) <= row_max / 254 + 1e-6)


def test_matmul_t_dispatch(rng):
    x = jnp.asarray(rng.normal(size=(4, 128)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(32, 128)).astype(np.float32))
    plain = np.asarray(linear.matmul_t(x, w))
    qout = np.asarray(linear.matmul_t(x, linear.quantize_weight(w)))
    # int8 relative error ~1/127 per element
    assert np.abs(qout - plain).max() / (np.abs(plain).max() + 1e-9) < 0.02


def test_quantize_params_selectivity():
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.key(0))
    qp = linear.quantize_params(params)
    assert linear.is_quantized(qp["layers"]["q_proj"])
    assert linear.is_quantized(qp["lm_head"])
    assert not linear.is_quantized(qp["embed_tokens"])
    assert not linear.is_quantized(qp["layers"]["input_layernorm"])
    # stacked layer axes preserved
    L = cfg.num_hidden_layers
    assert qp["layers"]["q_proj"]["q"].shape[0] == L
    assert qp["layers"]["q_proj"]["s"].shape == (L, cfg.hidden_size)


def test_quantized_forward_close_to_bf16(rng):
    """Full decoder forward with int8 trunk stays close; argmax mostly stable."""
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.key(0))
    qp = linear.quantize_params(params)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 12)))
    mask = jnp.ones((1, 12), jnp.int32)
    pos = jnp.arange(12)[None]
    e = llama.embed_tokens(params, ids)
    want = np.asarray(llama.forward(params, cfg, e, mask, pos)["logits"])
    got = np.asarray(llama.forward(qp, cfg, e, mask, pos)["logits"])
    assert got.shape == want.shape
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert rel < 0.05, rel


def test_quantized_kv_cache_decode_runs(rng):
    cfg = llama.LlamaConfig.tiny()
    qp = linear.quantize_params(llama.init_params(cfg, jax.random.key(0)))
    cache = llama.KVCache.zeros(cfg, 1, 16, dtype=jnp.float32)
    e = llama.embed_tokens(qp, jnp.asarray([[1, 2, 3]]))
    mask = jnp.zeros((1, 16), jnp.int32).at[:, :3].set(1)
    out = llama.forward(qp, cfg, e, mask, jnp.arange(3)[None],
                        cache=cache, cache_index=jnp.int32(0))
    assert out["logits"].shape == (1, 3, cfg.vocab_size)
    assert out["cache"].k.shape == (cfg.num_hidden_layers, 1, 16,
                                    cfg.num_key_value_heads, cfg.head_dim)


def test_random_params_like_sane():
    """Benchmark init: int8 codes + positive scales at the absmax/127
    operating point, finite end-to-end logits through a quantized model."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from openvla_probe_tpu.models import vlm
    from openvla_probe_tpu.ops.linear import quantize_params, random_params_like

    cfg = vlm.VLMConfig.tiny()
    shapes = jax.eval_shape(
        lambda key: quantize_params(vlm.init_params(cfg, key)), jax.random.key(0))
    params = jax.jit(lambda k: random_params_like(shapes, k))(jax.random.key(1))

    qp = params["llm"]["layers"]["q_proj"]
    assert qp["q"].dtype == jnp.int8
    s = np.asarray(qp["s"])
    assert (s > 0).all() and s.max() < 1e-2  # positive, small scales

    rng = np.random.default_rng(0)
    B, T, S = 2, 8, cfg.vision[0].image_size
    out = vlm.forward(
        params, cfg,
        jnp.asarray(rng.integers(2, cfg.llm.vocab_size, (B, T)), jnp.int32),
        jnp.ones((B, T), jnp.int32),
        jnp.asarray(rng.normal(size=(B, 6, S, S)), jnp.float32),
    )
    assert bool(jnp.isfinite(out["logits"]).all())


def test_turbo_config_fields():
    """VLMConfig.turbo changes ONLY the documented numerics fields."""
    import dataclasses

    import jax.numpy as jnp

    from openvla_probe_tpu.models import vlm

    base = vlm.VLMConfig.tiny()
    t = base.turbo()
    assert t.llm.attn_scores_dtype == jnp.bfloat16
    assert t.llm.rope_dtype == jnp.bfloat16
    for v, bv in zip(t.vision, base.vision):
        assert v.attn_scores_dtype == jnp.bfloat16
        # erf-GELU towers run tanh-GELU in turbo (pure-VPU erf polynomial
        # cannot overlap the small ViT MXU pass — profiled ~0.3 ms/layer);
        # non-erf acts (gelu_tanh, quick_gelu) pass through unchanged
        assert v.act == ("gelu_tanh" if bv.act == "gelu" else bv.act)
    # everything else identical
    assert dataclasses.replace(
        t,
        llm=dataclasses.replace(t.llm, attn_scores_dtype=base.llm.attn_scores_dtype,
                                rope_dtype=base.llm.rope_dtype),
        vision=tuple(dataclasses.replace(v, attn_scores_dtype=bv.attn_scores_dtype,
                                         act=bv.act)
                     for v, bv in zip(t.vision, base.vision)),
    ) == base


# --- int4 grouped quantization ----------------------------------------------

def test_int4_quantize_dequantize_error_bounded(rng):
    w = jnp.asarray(rng.normal(size=(64, 256)).astype(np.float32))
    qw = linear.quantize_weight_int4(w, group_size=128)
    # group-major code storage [G, O, gsz] (see quantize_weight_int4)
    assert qw["q"].dtype == jnp.int4 and qw["q"].shape == (2, 64, 128)
    assert qw["s"].shape == (64, 2)
    wd = np.asarray(linear.dequantize_weight(qw, jnp.float32))
    # per-(row, group) error <= scale/2 = group-absmax/14
    gmax = np.abs(np.asarray(w)).reshape(64, 2, 128).max(axis=-1)
    bound = np.repeat(gmax / 14 + 1e-6, 128, axis=1)
    assert np.all(np.abs(wd - np.asarray(w)) <= bound)


def test_int4_beats_per_channel_int4_everywhere(rng):
    """The grouped scales are the accuracy story: per-128-group int4 must
    reconstruct no worse than one scale across the whole 1024-wide row."""
    w = jnp.asarray((rng.normal(size=(16, 1024)) *
                     rng.lognormal(0, 1, size=(16, 1024))).astype(np.float32))
    grouped = np.asarray(linear.dequantize_weight(
        linear.quantize_weight_int4(w, group_size=128), jnp.float32))
    whole_row = np.asarray(linear.dequantize_weight(
        linear.quantize_weight_int4(w, group_size=1024), jnp.float32))
    err_g = np.abs(grouped - np.asarray(w)).mean()
    err_r = np.abs(whole_row - np.asarray(w)).mean()
    assert err_g < err_r, (err_g, err_r)


def test_int4_matmul_t_matches_dequantized(rng, monkeypatch):
    """With the w4a8 escape hatch off, matmul_t on int4 == matmul against the
    explicitly dequantized weight (pins the OVLA_W4A8=0 fallback dispatch)."""
    monkeypatch.setenv("OVLA_W4A8", "0")
    x = jnp.asarray(rng.normal(size=(4, 256)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(32, 256)).astype(np.float32))
    qw = linear.quantize_weight_int4(w)
    got = np.asarray(linear.matmul_t(x, qw).astype(jnp.float32))
    want = np.asarray((x @ linear.dequantize_weight(qw, jnp.bfloat16).T
                       ).astype(jnp.float32))
    np.testing.assert_array_equal(got, want)


def test_w4a8_grouped_matches_quantized_reference(rng):
    """The per-group batched int8 dot == the explicit reference computation
    (quantized activations x dequantized grouped weight), to f32 tolerance.
    The int32 accumulation is exact; only the scale application order differs."""
    x = jnp.asarray(rng.normal(size=(6, 256)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(32, 256)).astype(np.float32))
    qw = linear.quantize_weight_int4(w, group_size=64)
    got = np.asarray(linear._w4a8_dot_grouped(x, qw["q"], qw["s"])
                     ).astype(np.float32)
    x_i8, s_x = linear._quantize_activations(x)
    wd = np.asarray(linear.dequantize_weight(qw, jnp.float32))
    want = (np.asarray(x_i8, np.float32) @ wd.T) * np.asarray(s_x)
    assert np.abs(got - want).max() / (np.abs(want).max() + 1e-9) < 5e-3


def test_w4a8_requant_close_to_dequant_path(rng):
    """The large-M requant path adds <= one int8 step (of the per-channel
    scale) on top of the int4 grid — output stays close to the bf16 dequant
    matmul with quantized activations."""
    x = jnp.asarray(rng.normal(size=(64, 256)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(32, 256)).astype(np.float32))
    qw = linear.quantize_weight_int4(w, group_size=64)
    got = np.asarray(linear._w4a8_dot_requant(x, qw["q"], qw["s"])
                     ).astype(np.float32)
    want = np.asarray((x @ linear.dequantize_weight(qw, jnp.bfloat16).T
                       ).astype(jnp.float32))
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert rel < 0.03, rel


def test_w4a8_dispatch_by_m(rng, monkeypatch):
    """matmul_t routes int4 by row count: M <= OVLA_W4A8_GROUP_M_MAX takes the
    grouped batched dot, larger M the int8-requant transient."""
    monkeypatch.setenv("OVLA_W4A8_GROUP_M_MAX", "8")
    w = jnp.asarray(rng.normal(size=(32, 256)).astype(np.float32))
    qw = linear.quantize_weight_int4(w, group_size=64)
    x_small = jnp.asarray(rng.normal(size=(8, 256)), jnp.bfloat16)
    x_large = jnp.asarray(rng.normal(size=(9, 256)), jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(linear.matmul_t(x_small, qw)),
        np.asarray(linear._w4a8_dot_grouped(x_small, qw["q"], qw["s"])))
    np.testing.assert_array_equal(
        np.asarray(linear.matmul_t(x_large, qw)),
        np.asarray(linear._w4a8_dot_requant(x_large, qw["q"], qw["s"])))


def test_w4a8_grouped_grad_flows_dx(rng):
    """STE custom VJP: d/dx through the grouped w4a8 dot equals the dense
    backward against the dequantized weight (the QLoRA-over-int4 contract)."""
    x = jnp.asarray(rng.normal(size=(4, 256)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(32, 256)).astype(np.float32))
    qw = linear.quantize_weight_int4(w, group_size=64)

    def loss(x_):
        return jnp.sum(linear._w4a8_dot_grouped(x_, qw["q"], qw["s"]) ** 2)

    g = np.asarray(jax.grad(loss)(x))
    assert np.all(np.isfinite(g)) and np.abs(g).max() > 0
    y = linear._w4a8_dot_grouped(x, qw["q"], qw["s"])
    wd = linear.dequantize_weight(qw, jnp.bfloat16)
    want = np.asarray(
        (2.0 * y.astype(jnp.bfloat16)) @ wd, np.float32)
    rel = np.abs(g - want).max() / (np.abs(want).max() + 1e-9)
    assert rel < 0.05, rel


def test_int4_quantize_params_and_stacked_forward(rng):
    """bits=4 pytree quantization slots into the scanned decoder forward."""
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.key(0))
    qp = linear.quantize_params(params, bits=4, group_size=32)
    L = cfg.num_hidden_layers
    assert qp["layers"]["q_proj"]["q"].dtype == jnp.int4
    assert qp["layers"]["q_proj"]["s"].shape == (
        L, cfg.hidden_size, cfg.hidden_size // 32)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 12)))
    mask = jnp.ones((1, 12), jnp.int32)
    pos = jnp.arange(12)[None]
    e = llama.embed_tokens(params, ids)
    want = np.asarray(llama.forward(params, cfg, e, mask, pos)["logits"])
    got = np.asarray(llama.forward(qp, cfg, e, mask, pos)["logits"])
    # 4-bit rounding is ~7x coarser than int8's (absmax/14 vs /254 per
    # element); random tiny-model logits land ~0.15-0.2 max-rel — the real
    # fidelity gate for served checkpoints is the trained-weight margin
    # certificate (scripts/check_parity.py), not this smoke bound
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert rel < 0.3, rel


def test_int4_fallback_to_int8_on_ungroupable_in_dim(rng):
    """Leaves whose in-dim has no usable group size (SigLIP-so400m's mlp dim
    4304 = 2^4 * 269 at the shipped group 128) quantize per-channel int8
    instead of crashing — mixed int4/int8 trees serve through the same
    dequant dispatch (s.ndim discriminates)."""
    params = {
        "fc1_w": jnp.asarray(rng.normal(size=(8, 64)), jnp.float32),   # groupable
        "fc2_w": jnp.asarray(rng.normal(size=(8, 48)), jnp.float32),   # 48 % 32 != 0
    }
    qp = linear.quantize_params(params, suffixes=("fc1_w", "fc2_w"),
                                bits=4, group_size=32)
    assert qp["fc1_w"]["q"].dtype == jnp.int4
    assert qp["fc1_w"]["s"].shape == (8, 2)
    assert qp["fc2_w"]["q"].dtype == jnp.int8          # int8 fallback
    assert qp["fc2_w"]["s"].shape == (8,)              # per-channel scales
    x = jnp.asarray(rng.normal(size=(2, 48)), jnp.bfloat16)
    got = np.asarray(linear.matmul_t(x, qp["fc2_w"]).astype(jnp.float32))
    assert np.isfinite(got).all()


def test_int4_random_params_like_direct_init():
    """bench.py's direct init path over an int4 eval_shape tree (13B-scale
    runs cannot co-materialize the bf16 twin)."""
    cfg = llama.LlamaConfig.tiny()
    shapes = jax.eval_shape(
        lambda k: linear.quantize_params(llama.init_params(cfg, k),
                                         bits=4, group_size=32),
        jax.random.key(0))
    p = linear.random_params_like(shapes, jax.random.key(1))
    q = p["layers"]["q_proj"]
    assert q["q"].dtype == jnp.int4
    assert np.asarray(q["q"].astype(jnp.int8)).min() >= -7
    assert np.all(np.asarray(q["s"]) > 0)


def test_int4_emit_codes_and_materialize(rng):
    """The jit-boundary contract for s4 trees: jits emit int8 CODES, the
    caller materialize_int4()s eagerly (s4 arrays born inside a jit carry
    layout metadata no TPU consumer accepts — ops.linear._canonical_s4_format;
    reproduced as a device_put RecursionError on the axon backend)."""
    w = jnp.asarray(rng.normal(size=(16, 64)).astype(np.float32))
    codes = jax.jit(
        lambda w: linear.quantize_weight_int4(w, group_size=32, emit_codes=True)
    )(w)
    assert codes["q"].dtype == jnp.int8
    qw = {"q": linear.materialize_int4(codes["q"]), "s": codes["s"]}
    assert qw["q"].dtype == jnp.int4
    # jit-vs-eager fp dust can flip a borderline code; compare the
    # dequantized weights instead of code identity
    ref = linear.quantize_weight_int4(w, group_size=32)
    np.testing.assert_allclose(
        np.asarray(linear.dequantize_weight(qw, jnp.float32)),
        np.asarray(linear.dequantize_weight(ref, jnp.float32)),
        atol=float(np.abs(np.asarray(w)).max()) / 7.0)
    # the materialized leaf crosses a fresh jit boundary (the crash shape)
    out = jax.jit(lambda x, q: linear.matmul_t(x, q))(
        jnp.ones((2, 64), jnp.float32), qw)
    assert np.isfinite(np.asarray(out)).all()


def test_int4_random_params_like_codes_flag():
    cfg = llama.LlamaConfig.tiny()
    shapes = jax.eval_shape(
        lambda k: linear.quantize_params(llama.init_params(cfg, k),
                                         bits=4, group_size=32),
        jax.random.key(0))
    raw = jax.jit(lambda k: linear.random_params_like(
        shapes, k, int4_as_codes=True))(jax.random.key(1))
    assert raw["layers"]["q_proj"]["q"].dtype == jnp.int8
    p = jax.tree.map(
        lambda sh, lf: linear.materialize_int4(lf)
        if sh.dtype == jnp.int4 else lf, shapes, raw)
    assert p["layers"]["q_proj"]["q"].dtype == jnp.int4
    assert np.asarray(p["layers"]["q_proj"]["q"].astype(jnp.int8)).min() >= -7


def test_int4_random_params_like_eager():
    """The 13B-scale int4 bench init: per-leaf eager s4 materialization
    (never co-materializes the codes tree) matches the shapes tree."""
    cfg = llama.LlamaConfig.tiny()
    shapes = jax.eval_shape(
        lambda k: linear.quantize_params(llama.init_params(cfg, k),
                                         bits=4, group_size=32),
        jax.random.key(0))
    p = linear.random_params_like_eager_int4(shapes, jax.random.key(1))
    chk = jax.tree.map(lambda sh, lf: (sh.shape == lf.shape
                                       and sh.dtype == lf.dtype), shapes, p)
    assert all(jax.tree.leaves(chk))
    q = p["layers"]["q_proj"]
    assert q["q"].dtype == jnp.int4
    assert np.asarray(q["q"].astype(jnp.int8)).min() >= -7
    assert np.all(np.asarray(q["s"]) > 0)
    # embeddings/norms stay float and non-degenerate
    assert float(jnp.abs(p["embed_tokens"]).max()) > 0


def test_w4a8_pallas_kernel_interpret_matches_grouped(rng, monkeypatch):
    """The fused Pallas w4a8 matmul (interpret mode) matches the XLA grouped
    batched dot to f32 summation-order dust: same activation quant, same
    exact per-group int32 partials; only the f32 accumulation ORDER over
    groups differs (sequential fori vs einsum tree), which can flip a bf16
    output at a rounding boundary."""
    w = jnp.asarray(rng.normal(size=(256, 256)).astype(np.float32))
    qw = linear.quantize_weight_int4(w, group_size=64)
    x = jnp.asarray(rng.normal(size=(40, 256)), jnp.bfloat16)  # pads 40 -> bm
    got = np.asarray(linear._w4a8_pallas_matmul(x, qw["q"], qw["s"],
                                                interpret=True), np.float32)
    want = np.asarray(linear._w4a8_dot_grouped(x, qw["q"], qw["s"]),
                      np.float32)
    assert np.abs(got - want).max() <= 0.01 * np.abs(want).max()


def test_w4a8_pallas_gate_in_matmul_t(rng, monkeypatch):
    """OVLA_PALLAS=1 (+interpret on CPU) routes large-M int4 matmuls through
    the fused kernel inside matmul_t; ungroupable-tile N falls back."""
    monkeypatch.setenv("OVLA_PALLAS", "1")
    monkeypatch.setenv("OVLA_PALLAS_INTERPRET", "1")
    w = jnp.asarray(rng.normal(size=(256, 256)).astype(np.float32))
    qw = linear.quantize_weight_int4(w, group_size=64)
    x = jnp.asarray(rng.normal(size=(64, 256)), jnp.bfloat16)  # M > group max
    got = np.asarray(linear.matmul_t(x, qw))
    want = np.asarray(linear._w4a8_pallas_matmul(x, qw["q"], qw["s"],
                                                 interpret=True))
    np.testing.assert_array_equal(got, want)
    # N with no 128-multiple tile: falls back to the requant path (jit-vs-
    # eager fusion dust can flip a bf16 rounding, so compare with a bound)
    w2 = jnp.asarray(rng.normal(size=(96, 256)).astype(np.float32))
    qw2 = linear.quantize_weight_int4(w2, group_size=64)
    got2 = np.asarray(linear.matmul_t(x, qw2), np.float32)
    want2 = np.asarray(linear._w4a8_dot_requant(x, qw2["q"], qw2["s"]),
                       np.float32)
    assert np.abs(got2 - want2).max() <= 0.01 * np.abs(want2).max()


def test_w4a8_pallas_kernel_decode_m(rng):
    """The kernel handles decode-sized M (pads 1 -> 8 sublane rows) and
    matches the XLA grouped dot — this is the bs=1 serving shape."""
    w = jnp.asarray(rng.normal(size=(256, 512)).astype(np.float32))
    qw = linear.quantize_weight_int4(w, group_size=64)
    x = jnp.asarray(rng.normal(size=(1, 512)), jnp.bfloat16)
    got = np.asarray(linear._w4a8_pallas_matmul(x, qw["q"], qw["s"],
                                                interpret=True), np.float32)
    want = np.asarray(linear._w4a8_dot_grouped(x, qw["q"], qw["s"]), np.float32)
    assert got.shape == want.shape == (1, 256)
    assert np.abs(got - want).max() <= 0.01 * np.abs(want).max()


def test_w4a8_dx_pallas_matches_dequant(rng):
    """The Pallas STE-backward kernel (dequant in VMEM) matches the XLA
    bf16-dequant dot to accumulation-order dust. gsz=128 engages the real
    kernel path (smaller groups fall back to the XLA dot)."""
    w = jnp.asarray(rng.normal(size=(256, 256)).astype(np.float32))
    qw = linear.quantize_weight_int4(w, group_size=128)
    g2 = jnp.asarray(rng.normal(size=(40, 256)), jnp.bfloat16)
    got = np.asarray(linear._w4a8_dx_pallas(g2, qw["q"], qw["s"],
                                            interpret=True), np.float32)
    wd = np.asarray(linear.dequantize_weight(qw, jnp.float32))
    want = np.asarray(g2, np.float32) @ wd
    assert got.shape == (40, 256)
    assert np.abs(got - want).max() <= 0.02 * np.abs(want).max()


def test_w4a8_dx_pallas_small_group_fallback(rng):
    """gsz that doesn't tile the lane dim falls back to the XLA dequant dot
    inside _w4a8_dx_pallas (no Mosaic-hostile block shapes)."""
    w = jnp.asarray(rng.normal(size=(256, 256)).astype(np.float32))
    qw = linear.quantize_weight_int4(w, group_size=64)
    g2 = jnp.asarray(rng.normal(size=(8, 256)), jnp.bfloat16)
    got = np.asarray(linear._w4a8_dx_pallas(g2, qw["q"], qw["s"],
                                            interpret=True), np.float32)
    wd = np.asarray(linear.dequantize_weight(qw, jnp.float32))
    want = np.asarray(g2, np.float32) @ wd
    assert np.abs(got - want).max() <= 0.02 * np.abs(want).max()


def test_w4a8_pallas_dot_grad_matches_gate_off(rng, monkeypatch):
    """QLoRA-over-int4 with the Pallas w4a8 gate ON is differentiable: the
    custom-VJP wrapper's d/dx (Pallas dx kernel) matches the gate-off STE
    backward. M <= group-M max so BOTH paths run on the int4 weights (the
    grouped XLA dot vs the Pallas kernel — at larger M the gate-off path
    requantizes to int8 and the comparison would absorb a weight delta);
    only f32 accumulation order differs."""
    w = jnp.asarray(rng.normal(size=(256, 256)).astype(np.float32))
    qw = linear.quantize_weight_int4(w, group_size=128)
    x = jnp.asarray(rng.normal(size=(24, 256)), jnp.bfloat16)  # M <= group max

    def loss_off(x_):
        return jnp.sum(linear.matmul_t(x_, qw).astype(jnp.float32) ** 2)

    g_off = np.asarray(jax.grad(loss_off)(x), np.float32)

    monkeypatch.setenv("OVLA_PALLAS", "1")
    monkeypatch.setenv("OVLA_PALLAS_INTERPRET", "1")

    def loss_on(x_):
        return jnp.sum(linear.matmul_t(x_, qw).astype(jnp.float32) ** 2)

    g_on = np.asarray(jax.grad(loss_on)(x), np.float32)
    assert np.isfinite(g_on).all()
    # forwards differ by accumulation order (one bf16 rounding per output),
    # which the x2 loss doubles; compare with a relative bound
    assert np.abs(g_on - g_off).max() <= 0.05 * np.abs(g_off).max()


def test_w4a8_grouped_grad_pallas_bwd(rng, monkeypatch):
    """With the kernel gate on, the GROUPED dot's STE backward also rides the
    Pallas dx kernel (decode-M shapes keep the XLA grouped forward)."""
    w = jnp.asarray(rng.normal(size=(256, 256)).astype(np.float32))
    qw = linear.quantize_weight_int4(w, group_size=128)
    x = jnp.asarray(rng.normal(size=(8, 256)), jnp.bfloat16)

    def loss(x_):
        return jnp.sum(linear._w4a8_dot_grouped(x_, qw["q"], qw["s"]
                                                ).astype(jnp.float32) ** 2)

    g_off = np.asarray(jax.grad(loss)(x), np.float32)
    monkeypatch.setenv("OVLA_PALLAS", "1")
    monkeypatch.setenv("OVLA_PALLAS_INTERPRET", "1")
    g_on = np.asarray(jax.grad(loss)(x), np.float32)
    assert np.abs(g_on - g_off).max() <= 0.05 * np.abs(g_off).max()
