"""Fused RMSNorm->int8 kernel (ops/rmsnorm_quant.py; VERDICT r4 #8).

The kernel must produce EXACTLY the operands the unfused chain
(llama.rms_norm -> ops.linear._quantize_activations) produces — then the
consuming int8 dot is the same math and the fusion is a pure HBM-traffic
change. Pinned here in interpret mode (CPU), plus the llama-level gating
contract and end-to-end logits equality on a tiny int8 trunk.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openvla_probe_tpu.models import llama
from openvla_probe_tpu.ops import linear, rmsnorm_quant


@pytest.mark.parametrize("m,d", [(24, 128), (12, 64), (300, 256)])
def test_kernel_matches_unfused_chain_exact(m, d):
    key = jax.random.key(0)
    x = (jax.random.normal(key, (m, d), jnp.float32) * 0.5).astype(jnp.bfloat16)
    w = 1.0 + 0.1 * jax.random.normal(jax.random.key(1), (d,), jnp.float32)
    w = w.astype(jnp.bfloat16)
    eps = 1e-5

    h = llama.rms_norm(x, w, eps)
    want_q, want_s = linear._quantize_activations(h.reshape(-1, d))
    got_q, got_s = rmsnorm_quant.rms_norm_quant(x, w, eps, interpret=True)
    # XLA's simplifier elides the bf16 round-trip between the norm and the
    # quantizer when both live in one fusion (convert(f32->bf16->f32) -> id),
    # so "the" unfused reference is itself fusion-dependent: the pinnable
    # contract is codes within one quantization step and scales within bf16
    # dust — the turbo tier's own tolerance class.
    dq = np.abs(np.asarray(got_q, np.int32) - np.asarray(want_q, np.int32))
    assert dq.max() <= 1, f"codes differ by more than one step: {dq.max()}"
    assert (dq > 0).mean() < 0.10, "too many rounding-boundary flips"
    np.testing.assert_allclose(np.asarray(got_s).ravel(),
                               np.asarray(want_s).ravel(), rtol=1e-2)


def test_matmul_t_prequant_equals_w8a8():
    key = jax.random.key(2)
    x = (jax.random.normal(key, (4, 6, 64), jnp.float32) * 0.3).astype(jnp.bfloat16)
    w = jax.random.normal(jax.random.key(3), (32, 64), jnp.float32) * 0.05
    qw = linear.quantize_weight(w)
    norm_w = jnp.ones((64,), jnp.bfloat16)

    h = llama.rms_norm(x, norm_w, 1e-5)
    want = linear.matmul_t(h, qw)
    q8, sx = rmsnorm_quant.rms_norm_quant(x, norm_w, 1e-5, interpret=True)
    got = linear.matmul_t(linear.PrequantActivation(q8, sx, x.dtype), qw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert got.dtype == want.dtype


def test_prequant_rejects_non_int8_leaf():
    q8 = jnp.zeros((4, 8), jnp.int8)
    sx = jnp.ones((4, 1), jnp.float32)
    with pytest.raises(TypeError, match="int8-copy"):
        linear.matmul_t(linear.PrequantActivation(q8, sx, jnp.bfloat16),
                        jnp.zeros((16, 8), jnp.bfloat16))


def test_llama_prefill_logits_identical_with_fusion(monkeypatch):
    """Gate flipped on: the tiny int8 trunk's prefill logits must be
    BITWISE what the unfused turbo path computes (same dot operands)."""
    cfg = llama.LlamaConfig.tiny(vocab_size=128)
    params = llama.init_params(cfg, jax.random.key(0))
    from openvla_probe_tpu.ops.linear import TURBO_QUANT_SUFFIXES, quantize_params

    qparams = quantize_params(params, suffixes=TURBO_QUANT_SUFFIXES)
    B, T = 2, 12
    embeds = (jax.random.normal(jax.random.key(5), (B, T, cfg.hidden_size))
              * 0.3).astype(jnp.bfloat16)
    mask = jnp.ones((B, T), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(T), (B, T))

    base = llama.prefill(qparams, cfg, embeds, mask, pos)["last_hidden_state"]
    monkeypatch.setenv("OVLA_PALLAS", "1")
    monkeypatch.setenv("OVLA_PALLAS_RMSQ", "1")
    fused = llama.prefill(qparams, cfg, embeds, mask, pos)["last_hidden_state"]
    # same tolerance class as the codes contract above: the fusion moves
    # activations by at most one int8 step before each dot
    np.testing.assert_allclose(np.asarray(fused, np.float32),
                               np.asarray(base, np.float32),
                               rtol=0.08, atol=0.08)


def test_gating_skips_bf16_and_lora_leaves(monkeypatch):
    monkeypatch.setenv("OVLA_PALLAS", "1")
    monkeypatch.setenv("OVLA_PALLAS_RMSQ", "1")
    cfg = llama.LlamaConfig.tiny(vocab_size=128)
    x = jnp.ones((2, 12, cfg.hidden_size), jnp.bfloat16)
    norm_w = jnp.ones((cfg.hidden_size,), jnp.bfloat16)
    # bf16 leaf -> plain norm (ndarray out)
    out = llama._norm_maybe_quant(cfg, x, norm_w,
                                  jnp.zeros((8, cfg.hidden_size)))
    assert isinstance(out, jnp.ndarray)
    # LoRA-wrapped int8 base -> plain norm
    lora_leaf = {"base": {"q": jnp.zeros((8, cfg.hidden_size), jnp.int8),
                          "s": jnp.ones((8,))},
                 "A": jnp.zeros((2, cfg.hidden_size)), "B": jnp.zeros((8, 2))}
    out = llama._norm_maybe_quant(cfg, x, norm_w, lora_leaf)
    assert isinstance(out, jnp.ndarray)
    # plain int8 leaf -> prequant pair
    q_leaf = {"q": jnp.zeros((8, cfg.hidden_size), jnp.int8),
              "s": jnp.ones((8,))}
    out = llama._norm_maybe_quant(cfg, x, norm_w, q_leaf)
    assert isinstance(out, linear.PrequantActivation)
