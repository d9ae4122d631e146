"""Flash-attention kernel correctness (interpret mode on CPU).

The kernel takes a [B, Tk] key-validity vector and computes causal+padding
masking in-kernel (VERDICT r1 weak #4: no more O(B·H·Tq·Tk) HBM mask buffer).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from openvla_probe_tpu.models import llama
from openvla_probe_tpu.ops.attention import flash_attention


def test_flash_cached_prefill_geometry(rng):
    """The legacy serving prefill writes into an S-slot padded cache and
    attends with offset 0 over Tk=S > Tq (future slots invalid) — the exact
    geometry attention() now routes to the kernel under OVLA_PALLAS=1."""
    B, H, Dh, Tq, S = 2, 2, 8, 16, 24
    q = jnp.asarray(rng.normal(size=(B, Tq, H, Dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, S, H, Dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, S, H, Dh)).astype(np.float32))
    am = np.zeros((B, S), np.int64)
    am[0, :Tq] = 1
    am[1, :Tq - 3] = 1   # right-padded prompt
    mask = llama.make_causal_mask(jnp.asarray(am), Tq, S, offset=0)

    want = np.asarray(llama.attention(q, k, v, mask))
    got = np.asarray(flash_attention(
        q, k, v, jnp.asarray(am), offset=0,
        block_q=8, block_k=8, interpret=True,
    ))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("oneshot", ["1", "0"])
@pytest.mark.parametrize("tq,tk", [(16, 16), (33, 47)])
def test_flash_matches_reference_attention(tq, tk, oneshot, rng, monkeypatch):
    # oneshot="0" pins the blockwise running-softmax loop path (used above
    # _ONESHOT_MAX_TK), which no small-shape test would otherwise reach
    monkeypatch.setenv("OVLA_FLASH_ONESHOT", oneshot)
    B, H, Dh = 2, 3, 8
    q = jnp.asarray(rng.normal(size=(B, tq, H, Dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, tk, H, Dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, tk, H, Dh)).astype(np.float32))
    am = np.ones((B, tk), np.int64)
    am[1, tk - 3:] = 0
    offset = tk - tq
    mask = llama.make_causal_mask(jnp.asarray(am), tq, tk, offset=offset)

    want = np.asarray(llama.attention(q, k, v, mask))
    got = np.asarray(flash_attention(
        q, k, v, jnp.asarray(am), offset=offset,
        block_q=16, block_k=16, interpret=True,
    ))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_flash_oneshot_bf16_serving_shape(rng):
    """bf16 inputs at a (scaled-down) serving geometry: the one-shot kernel's
    bf16-MXU/fp32-softmax numerics must track the XLA path within bf16 dust."""
    B, H, Dh, T = 2, 2, 16, 36   # Tq=Tk, sublane-aligned like the 288 case
    q = jnp.asarray(rng.normal(size=(B, T, H, Dh))).astype(jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, T, H, Dh))).astype(jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, T, H, Dh))).astype(jnp.bfloat16)
    am = np.ones((B, T), np.int64)
    am[1, 30:] = 0
    mask = llama.make_causal_mask(jnp.asarray(am), T, T, offset=0)

    want = np.asarray(llama.attention(q, k, v, mask)).astype(np.float32)
    got = np.asarray(flash_attention(
        q, k, v, jnp.asarray(am), offset=0, interpret=True,
    )).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=3e-2, rtol=3e-2)


def test_flash_noncausal_padding_only(rng):
    B, H, Dh, T = 2, 2, 8, 24
    q = jnp.asarray(rng.normal(size=(B, T, H, Dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, H, Dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, H, Dh)).astype(np.float32))
    am = np.ones((B, T), np.int64)
    am[0, 20:] = 0
    add = jnp.where(jnp.asarray(am)[:, None, None, :] > 0, 0.0, llama.NEG_INF).astype(jnp.float32)

    want = np.asarray(llama.attention(q, k, v, add))
    got = np.asarray(flash_attention(
        q, k, v, jnp.asarray(am), causal=False,
        block_q=8, block_k=8, interpret=True,
    ))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_flash_fully_masked_rows_are_finite(rng):
    """Padded query rows (all keys masked) must not produce NaNs."""
    B, H, Dh, T = 1, 2, 8, 16
    q = jnp.asarray(rng.normal(size=(B, T, H, Dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, H, Dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, H, Dh)).astype(np.float32))
    valid = jnp.zeros((B, T), jnp.int32)
    out = np.asarray(flash_attention(
        q, k, v, valid, block_q=16, block_k=16, interpret=True,
    ))
    assert np.isfinite(out).all()


def test_no_quadratic_mask_in_jaxpr():
    """The flash path's trace must not contain any [B*H, Tq, Tk]-sized mask
    buffer (the round-1 regression this rewrite removes)."""
    import jax

    B, T, H, Dh = 2, 512, 4, 8
    q = jnp.zeros((B, T, H, Dh), jnp.float32)
    valid = jnp.ones((B, T), jnp.int32)
    jaxpr = jax.make_jaxpr(
        lambda q, k, v, m: flash_attention(
            q, k, v, m, block_q=64, block_k=64, interpret=True
        )
    )(q, q, q, valid)
    # any O(B*H*T*T) buffer would be >= 2*4*512*512; VMEM block tiles are
    # block_q*block_k = 4096 — assert nothing within 16x of quadratic exists
    big = B * H * T * T // 16
    for eqn in jaxpr.jaxpr.eqns:
        for var in eqn.outvars:
            if hasattr(var, "aval") and hasattr(var.aval, "shape"):
                assert int(np.prod(var.aval.shape or (1,))) < big, (
                    f"quadratic buffer {var.aval.shape} in {eqn.primitive}"
                )


def test_decode_kernel_matches_split_attention(rng):
    """Pallas decode kernel (frozen-KV layout) == the XLA joint-softmax path
    (interpret mode)."""
    from openvla_probe_tpu.models.llama import _split_attention
    from openvla_probe_tpu.ops.decode_attention import decode_flash_attention

    B, H, Dh, T, A = 2, 3, 16, 24, 7
    q = jnp.asarray(rng.normal(size=(B, 1, H, Dh)).astype(np.float32))
    kp = jnp.asarray(rng.normal(size=(B, T, H, Dh)).astype(np.float32))
    vp = jnp.asarray(rng.normal(size=(B, T, H, Dh)).astype(np.float32))
    kd = jnp.asarray(rng.normal(size=(B, A, H, Dh)).astype(np.float32))
    vd = jnp.asarray(rng.normal(size=(B, A, H, Dh)).astype(np.float32))
    pre_valid = np.ones((B, T), np.int32)
    pre_valid[1, 18:] = 0
    dec_valid = np.zeros((B, A), np.int32)
    dec_valid[:, :3] = 1

    add_pre = jnp.where(jnp.asarray(pre_valid)[:, None, None, :] > 0, 0.0, llama.NEG_INF)
    add_dec = jnp.where(jnp.asarray(dec_valid)[:, None, None, :] > 0, 0.0, llama.NEG_INF)
    want = np.asarray(_split_attention(
        q, kp, vp, kd, vd, add_pre.astype(jnp.float32), add_dec.astype(jnp.float32)))
    got = np.asarray(decode_flash_attention(
        q, kp, vp, kd, vd, jnp.asarray(pre_valid), jnp.asarray(dec_valid),
        interpret=True,
    ))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_decode_kernel_empty_decode_segment(rng):
    """Step 0: no generated-token slots valid yet."""
    from openvla_probe_tpu.models.llama import _split_attention
    from openvla_probe_tpu.ops.decode_attention import decode_flash_attention

    B, H, Dh, T, A = 1, 2, 8, 16, 5
    q = jnp.asarray(rng.normal(size=(B, 1, H, Dh)).astype(np.float32))
    kp = jnp.asarray(rng.normal(size=(B, T, H, Dh)).astype(np.float32))
    vp = jnp.asarray(rng.normal(size=(B, T, H, Dh)).astype(np.float32))
    kd = jnp.zeros((B, A, H, Dh), jnp.float32)
    vd = jnp.zeros((B, A, H, Dh), jnp.float32)
    pre_valid = jnp.ones((B, T), jnp.int32)
    dec_valid = jnp.zeros((B, A), jnp.int32)

    add_pre = jnp.zeros((B, 1, 1, T), jnp.float32)
    add_dec = jnp.full((B, 1, 1, A), llama.NEG_INF, jnp.float32)
    want = np.asarray(_split_attention(q, kp, vp, kd, vd, add_pre, add_dec))
    got = np.asarray(decode_flash_attention(
        q, kp, vp, kd, vd, pre_valid, dec_valid, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_vit_flash_matches_xla():
    """ViT tower flash kernel (head-major blocks, unmasked bidirectional,
    VMEM row-pad for score-lane alignment) == the einsum reference."""
    import numpy as np

    from openvla_probe_tpu.ops.attention import vit_flash_attention

    rng = np.random.default_rng(0)
    B, N, H, Dh = 2, 261, 3, 64   # N deliberately not a lane/sublane multiple
    q = jnp.asarray(rng.normal(size=(B, N, H, Dh)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, N, H, Dh)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, N, H, Dh)), jnp.bfloat16)
    out = vit_flash_attention(q, k, v, interpret=True)

    s = np.einsum("bthd,bshd->bhts", np.asarray(q, np.float32),
                  np.asarray(k, np.float32)) / np.sqrt(Dh)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bhts,bshd->bthd", p, np.asarray(v, np.float32))
    err = np.abs(np.asarray(out, np.float32) - ref).max()
    assert err < 0.02, err
