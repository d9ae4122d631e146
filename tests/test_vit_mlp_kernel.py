"""Fused ViT-MLP half-block kernel correctness (interpret mode on CPU).

The kernel replicates the XLA turbo MLP half cast-for-cast (fp32 LayerNorm ->
bf16, fp32 quantize, int32 MXU dot, fp32 epilogue -> bf16, bf16 bias, fp32
activation); the only admissible divergence is the fp32 LayerNorm reduction
order, so kernel-vs-XLA agreement is tight even in bf16.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openvla_probe_tpu.models import vit
from openvla_probe_tpu.ops.linear import quantize_weight
from openvla_probe_tpu.ops.vit_mlp import fused_mlp_residual


def _xla_mlp_half(x, lns, lnb, fc1, fc1_b, fc2, fc2_b, ls2, eps, act):
    """The models/vit._block MLP half, quantized weights via matmul_t."""
    from openvla_probe_tpu.ops.linear import matmul_t

    h = vit.layer_norm(x, lns, lnb, eps)
    h = vit._act(matmul_t(h, fc1) + fc1_b, act)
    h = matmul_t(h, fc2) + fc2_b
    if ls2 is not None:
        h = h * ls2
    return x + h


@pytest.mark.parametrize("act", ["gelu", "gelu_tanh", "quick_gelu"])
@pytest.mark.parametrize("layerscale", [True, False])
def test_fused_mlp_matches_xla_w8a8(rng, act, layerscale, monkeypatch):
    monkeypatch.setenv("OVLA_W8A8", "1")
    M, D, F = 40, 128, 256  # M not a block multiple: exercises the pad path
    monkeypatch.setenv("OVLA_VITMLP_BM", "16")
    x = jnp.asarray(rng.normal(size=(M, D)).astype(np.float32) * 0.5, jnp.bfloat16)
    lns = jnp.asarray(1.0 + 0.1 * rng.normal(size=(D,)), jnp.bfloat16)
    lnb = jnp.asarray(0.1 * rng.normal(size=(D,)), jnp.bfloat16)
    fc1 = quantize_weight(rng.normal(size=(F, D)).astype(np.float32) * 0.05)
    fc2 = quantize_weight(rng.normal(size=(D, F)).astype(np.float32) * 0.05)
    fc1_b = jnp.asarray(0.05 * rng.normal(size=(F,)), jnp.bfloat16)
    fc2_b = jnp.asarray(0.05 * rng.normal(size=(D,)), jnp.bfloat16)
    ls2 = jnp.asarray(0.9 + 0.1 * rng.normal(size=(D,)), jnp.bfloat16) if layerscale else None

    want = np.asarray(
        _xla_mlp_half(x, lns, lnb, fc1, fc1_b, fc2, fc2_b, ls2, 1e-6, act),
        np.float32,
    )
    got = np.asarray(
        fused_mlp_residual(
            x, lns, lnb, fc1, fc1_b, fc2, fc2_b,
            ls2 if layerscale else jnp.ones((D,), x.dtype),
            eps=1e-6, act=act, interpret=True,
        ),
        np.float32,
    )
    # the LayerNorm reduction order is the only non-replicated step; a 1-ULP
    # LN difference changes a row's quantize scale and shifts the whole row by
    # ~1 bf16 ULP (measured maxabs 0.016 at |y|~1.3, ~50% of elements exactly
    # equal). A real bug (wrong scale/bias/act wiring) lands orders above.
    np.testing.assert_allclose(got, want, atol=0.05, rtol=0.05)
    assert np.mean(got == want) > 0.3  # large share still bit-identical


@pytest.mark.parametrize("tower", ["dino_like", "siglip_like"])
def test_tower_kernel_wiring_e2e(rng, tower, monkeypatch):
    """OVLA_PALLAS_INTERPRET=1 drives the FULL forward_features through every
    tower kernel (qkv-entry, flash attention, proj-exit, fused MLP) in
    interpret mode on CPU — the exact _block wiring (scan slices of the
    stacked quantized tree, LayerScale fallbacks, flat shapes) that otherwise
    only executes on a real chip."""
    from openvla_probe_tpu.ops.linear import VIT_QUANT_SUFFIXES, quantize_params

    monkeypatch.setenv("OVLA_W8A8", "1")
    if tower == "dino_like":
        cfg = vit.ViTConfig.tiny(num_register_tokens=2, no_embed_class=True,
                                 use_layerscale=True, dtype=jnp.bfloat16)
    else:
        cfg = vit.ViTConfig.tiny(use_cls_token=False, act="gelu_tanh",
                                 dtype=jnp.bfloat16)
    params = quantize_params(vit.init_params(cfg, jax.random.PRNGKey(3)),
                             VIT_QUANT_SUFFIXES)
    px = jnp.asarray(rng.normal(size=(2, 3, 28, 28)), jnp.bfloat16)

    monkeypatch.delenv("OVLA_PALLAS", raising=False)
    want = np.asarray(vit.forward_features(params, cfg, px), np.float32)

    monkeypatch.setenv("OVLA_PALLAS", "1")
    monkeypatch.setenv("OVLA_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("OVLA_VITMLP_BM", "16")
    got = np.asarray(vit.forward_features(params, cfg, px), np.float32)

    assert got.shape == want.shape
    # three stacked kernel layers of 1-ULP LayerNorm/fusion dust; the flash
    # kernel's fp32 scores vs the XLA path's bf16/f32 chain add a bit more
    np.testing.assert_allclose(got, want, atol=0.08, rtol=0.08)


def test_block_gate_routes_to_fused_kernel(rng, monkeypatch):
    """_block(OVLA_PALLAS=1, quantized tower) must equal the XLA path —
    exercised end-to-end through forward_features in interpret-able CPU mode
    only via direct kernel interpret, so here we check the gating predicate:
    bf16 (non-quantized) towers must NOT route to the kernel."""
    monkeypatch.setenv("OVLA_PALLAS", "1")
    cfg = vit.ViTConfig.tiny(dtype=jnp.bfloat16)
    params = vit.init_params(cfg, jax.random.PRNGKey(0))
    px = jnp.asarray(rng.normal(size=(2, 3, 28, 28)), jnp.bfloat16)
    # bf16 weights + OVLA_PALLAS on a CPU backend: gate must fall through to
    # the XLA path (backend != tpu and weights unquantized) and still run
    out = vit.forward_features(params, cfg, px)
    assert out.shape == (2, cfg.num_patches, cfg.hidden_size)
    assert np.isfinite(np.asarray(out, np.float32)).all()


@pytest.mark.parametrize("variant", ["qkv", "proj", "proj_noscale"])
def test_fused_ln_w8a8_matches_xla(rng, variant, monkeypatch):
    """The generic single-matmul kernel in its two block roles: qkv-entry
    (LN + quantize + matmul + bias) and proj-exit (quantize + matmul + bias
    + LayerScale + residual)."""
    from openvla_probe_tpu.ops.linear import matmul_t
    from openvla_probe_tpu.ops.vit_mlp import fused_ln_w8a8

    monkeypatch.setenv("OVLA_W8A8", "1")
    monkeypatch.setenv("OVLA_VITMLP_BM", "16")
    M, K = 40, 128
    N = 3 * K if variant == "qkv" else K
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32) * 0.5, jnp.bfloat16)
    w = quantize_weight(rng.normal(size=(N, K)).astype(np.float32) * 0.05)
    b = jnp.asarray(0.05 * rng.normal(size=(N,)), jnp.bfloat16)

    if variant == "qkv":
        lns = jnp.asarray(1.0 + 0.1 * rng.normal(size=(K,)), jnp.bfloat16)
        lnb = jnp.asarray(0.1 * rng.normal(size=(K,)), jnp.bfloat16)
        want = matmul_t(vit.layer_norm(x, lns, lnb, 1e-6), w) + b
        got = fused_ln_w8a8(x, w, b, ln=(lns, lnb), eps=1e-6, interpret=True)
    else:
        res = jnp.asarray(rng.normal(size=(M, N)).astype(np.float32) * 0.5, jnp.bfloat16)
        ls = (jnp.asarray(0.9 + 0.1 * rng.normal(size=(N,)), jnp.bfloat16)
              if variant == "proj" else None)
        y = matmul_t(x, w) + b
        want = res + (y * ls if ls is not None else y)
        got = fused_ln_w8a8(x, w, b, res=res, ls=ls, interpret=True)

    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=0.05, rtol=0.05,
    )
    if variant != "qkv":
        # no LayerNorm -> the int32 dot is order-exact; the fp32 scale
        # epilogue can still differ by 1 bf16 ULP on a handful of elements
        # (XLA's elementwise fusion may contract mul+add into FMA). Measured:
        # <1% of elements at 1 ULP.
        g, w_ = np.asarray(got, np.float32), np.asarray(want, np.float32)
        assert np.mean(g == w_) > 0.98


def test_fused_mlp_odd_ff_dim(rng):
    """SigLIP's mlp_dim=4304 is not a 128-multiple; full-array weight blocks
    must still work (scaled-down odd shape)."""
    M, D, F = 24, 128, 336  # F % 128 != 0
    x = jnp.asarray(rng.normal(size=(M, D)).astype(np.float32) * 0.5, jnp.bfloat16)
    lns = jnp.ones((D,), jnp.bfloat16)
    lnb = jnp.zeros((D,), jnp.bfloat16)
    fc1 = quantize_weight(rng.normal(size=(F, D)).astype(np.float32) * 0.05)
    fc2 = quantize_weight(rng.normal(size=(D, F)).astype(np.float32) * 0.05)
    got = fused_mlp_residual(
        x, lns, lnb, fc1, jnp.zeros((F,), jnp.bfloat16),
        fc2, jnp.zeros((D,), jnp.bfloat16), jnp.ones((D,), jnp.bfloat16),
        eps=1e-6, act="gelu_tanh", interpret=True,
    )
    want = _xla_mlp_half(
        x, lns, lnb, fc1, jnp.zeros((F,), jnp.bfloat16),
        fc2, jnp.zeros((D,), jnp.bfloat16), None, 1e-6, "gelu_tanh",
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=0.05, rtol=0.05,
    )
