"""Pallas decode-attention kernel for the frozen-prefill-KV serving layout.

One greedy-decode step attends a single query token over [frozen prefill KV |
tiny generated-token buffer]. Under XLA this is two einsums + a joint softmax
(llama._split_attention); this kernel computes the whole step per (batch,
head) program with everything resident in VMEM — the prefill K/V stream from
HBM exactly once and no score/probability tensor ever materializes.

At OpenVLA shapes (T=288, A=7, Dh=128) the per-program K/V block is ~150 KB —
far under the VMEM budget — so no online-softmax blocking is needed; the
joint softmax is computed in one shot in fp32.

Env-gated with the other Pallas kernels (OVLA_PALLAS=1 + the frozen-KV decode
path OVLA_LEGACY_DECODE=0): Mosaic compilation hangs through the axon tunnel,
so this is interpret-validated here and slots in on a directly-attached TPU
runtime (the measured ~5 ms/token gap between the XLA decode and its
bandwidth bound is exactly what in-VMEM fusion targets).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -2.3819763e38


def _decode_kernel(q_ref, kp_ref, vp_ref, kd_ref, vd_ref,
                   pv_ref, dv_ref, o_ref, *, scale: float):
    """One (batch*head) program.

    q_ref [1, 1, Dh]; kp_ref/vp_ref [1, T, Dh]; kd_ref/vd_ref [1, A, Dh];
    pv_ref [1, 1, T] prefill validity; dv_ref [1, 1, A] decode-slot validity;
    o_ref [1, 1, Dh]. Singleton axes keep every block's last-two-dims either
    tile-aligned or equal to the array dims (Mosaic's lowering rule); all
    math stays 2D ([1, x] rows) — Mosaic vectorizes 2D ops natively.
    """
    q = q_ref[0].astype(jnp.float32) * scale                    # [1, Dh]
    kp = kp_ref[0].astype(jnp.float32)                          # [T, Dh]
    kd = kd_ref[0].astype(jnp.float32)                          # [A, Dh]
    sp = q @ kp.T                                               # [1, T]
    sd = q @ kd.T                                               # [1, A]
    sp = jnp.where(pv_ref[0] > 0, sp, NEG_INF)
    sd = jnp.where(dv_ref[0] > 0, sd, NEG_INF)
    # keepdims 2D reductions throughout (0-d intermediates are a Mosaic
    # lowering hazard); [1, 1] maxima/denominator broadcast cleanly
    m = jnp.maximum(sp.max(axis=-1, keepdims=True),
                    sd.max(axis=-1, keepdims=True))             # [1, 1]
    ep = jnp.exp(sp - m)
    ed = jnp.exp(sd - m)
    denom = jnp.maximum(ep.sum(axis=-1, keepdims=True)
                        + ed.sum(axis=-1, keepdims=True), 1e-30)
    out = (
        ep @ vp_ref[0].astype(jnp.float32)
        + ed @ vd_ref[0].astype(jnp.float32)
    ) / denom                                                   # [1, Dh]
    o_ref[0] = out.astype(o_ref.dtype)


def decode_flash_attention(
    q: jnp.ndarray,          # [B, 1, H, Dh]
    kp: jnp.ndarray,         # [B, T, H, Dh]  (kv heads pre-repeated)
    vp: jnp.ndarray,
    kd: jnp.ndarray,         # [B, A, H, Dh]
    vd: jnp.ndarray,
    pre_valid: jnp.ndarray,  # [B, T] (1 = attend)
    dec_valid: jnp.ndarray,  # [B, A]
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax([q·Kp | q·Kd]) @ [Vp; Vd] for a single decode token."""
    B, _, H, Dh = q.shape
    T, A = kp.shape[1], kd.shape[1]
    scale = 1.0 / np.sqrt(Dh)

    qr = q[:, 0].transpose(0, 1, 2).reshape(B * H, 1, Dh)
    kpr = kp.transpose(0, 2, 1, 3).reshape(B * H, T, Dh)
    vpr = vp.transpose(0, 2, 1, 3).reshape(B * H, T, Dh)
    kdr = kd.transpose(0, 2, 1, 3).reshape(B * H, A, Dh)
    vdr = vd.transpose(0, 2, 1, 3).reshape(B * H, A, Dh)
    pvi = pre_valid.astype(jnp.int32)[:, None, :]
    dvi = dec_valid.astype(jnp.int32)[:, None, :]

    kernel = functools.partial(_decode_kernel, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((1, 1, Dh), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, T, Dh), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, T, Dh), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, A, Dh), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, A, Dh), lambda b: (b, 0, 0)),
            # one validity row per batch element, shared across its H heads
            pl.BlockSpec((1, 1, T), lambda b, H=H: (b // H, 0, 0)),
            pl.BlockSpec((1, 1, A), lambda b, H=H: (b // H, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, Dh), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, 1, Dh), q.dtype),
        interpret=interpret,
    )(qr, kpr, vpr, kdr, vdr, pvi, dvi)
    return out.reshape(B, H, 1, Dh).transpose(0, 2, 1, 3)


# --- stacked-carry int8 cache decode (fused dequant, scalar-prefetched layer)


def _stacked_i8_kernel(li_ref, q_ref, kq_ref, ks_ref, vq_ref, vs_ref,
                       valid_ref, o_ref, *, scale: float, dh: int,
                       kv_heads: int, n_rep: int, s_pad: int):
    """One batch-element program over the FLAT int8 stacked cache.

    The layer index arrives via scalar prefetch (`li_ref`, SMEM) and is
    consumed ONLY by the BlockSpec index maps — the DMA engine streams
    exactly layer li's [S, H*Dh] int8 K/V blocks out of the full
    [L, B, S, H*Dh] cache that rides the decode scan carry. Nothing else of
    the cache moves, and the bf16 dequant lives in VMEM: the int8 bytes are
    the only HBM cache traffic. This is the formulation XLA refused — the
    lax dequant-in-attention (turbo_kv8) re-materialized bf16 K/V in HBM
    and measured SLOWER than streaming the bf16 cache (PERF_r03.md).

    q_ref [1, 1, H*Dh] bf16 (flat head-minor — a free bitcast of the
    projection output, the flash-kernel layout lesson); kq/vq [1, 1, S, H*Dh]
    int8; ks/vs [1, 1, S, H] f32 per-(slot, head) absmax scales;
    valid_ref [1, 1, S] int32 (1 = attend; covers prefill AND generated
    slots — the whole cache is one segment, so ONE softmax, no split);
    o_ref [1, 1, H*Dh]. Heads statically unrolled over aligned 128-lane
    slices; all math 2D rows with keepdims reductions (Mosaic rules).
    """
    # the score row's lane dim is S: pad K/V/scales to the 128-multiple IN
    # VMEM (zero HBM cost — the flash-kernel lesson; an HBM-padded cache
    # instead widened every PREFILL layer's score tile 295->384, measured
    # -1.8 calls/s end-to-end). Padded lanes get validity 0 -> NEG_INF -> 0.
    ok = valid_ref[0, 0, :][None, :] > 0                          # [1, Sp]
    zpad = ((0, s_pad), (0, 0))
    for kv_h in range(kv_heads):
        # GQA: each kv head's dequantized tile is built once and reused by
        # its n_rep query heads (statically unrolled — the flat cache makes
        # the kv slice a compile-time lane offset)
        sl = slice(kv_h * dh, (kv_h + 1) * dh)
        ksc = ks_ref[0, 0, :, kv_h:kv_h + 1]                      # [S, 1]
        kf = kq_ref[0, 0, :, sl].astype(jnp.float32) * ksc        # [S, Dh]
        vsc = vs_ref[0, 0, :, kv_h:kv_h + 1]
        vf = vq_ref[0, 0, :, sl].astype(jnp.float32) * vsc        # [S, Dh]
        if s_pad:
            kf = jnp.pad(kf, zpad)
            vf = jnp.pad(vf, zpad)
        for r in range(n_rep):
            h = kv_h * n_rep + r
            qsl = slice(h * dh, (h + 1) * dh)
            qh = q_ref[0, :, qsl].astype(jnp.float32) * scale     # [1, Dh]
            s = jax.lax.dot_general(
                qh, kf, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                     # [1, Sp]
            s = jnp.where(ok, s, NEG_INF)
            m = s.max(axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = p.sum(axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p, vf, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                     # [1, Dh]
            o_ref[0, :, qsl] = (pv / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def stacked_decode_attention_i8(
    q: jnp.ndarray,       # [B, 1, H, Dh] bf16 post-RoPE query
    kq: jnp.ndarray,      # [L, B, S, H*Dh] int8 flat stacked K cache
    ks: jnp.ndarray,      # [L, B, S, H] f32 scales
    vq: jnp.ndarray,
    vs: jnp.ndarray,
    valid: jnp.ndarray,   # [B, S] slot validity (1 = attend)
    li: jnp.ndarray,      # scalar int32 layer index (traced)
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(q·K[li]) @ V[li] over the int8 stacked cache, dequant fused.

    The slot axis S is the score row's LANE dim; lane alignment of the
    [1, S] tile is load-bearing on Mosaic (flash-kernel measurement: 0.62 vs
    1.84 ms/layer). S stays the natural cache_len in HBM — the kernel pads
    K/V to the next 128-multiple in VMEM (padded lanes masked exactly).
    """
    B, _, H, Dh = q.shape
    L, _, S, KDh = kq.shape
    Hkv = KDh // Dh
    assert Hkv * Dh == KDh and H % Hkv == 0, "q/kv head dims inconsistent"
    n_rep = H // Hkv
    scale = 1.0 / np.sqrt(Dh)
    s_pad = (-S) % 128

    qr = q.reshape(B, 1, H * Dh)
    validr = jnp.pad(valid.astype(jnp.int32), ((0, 0), (0, s_pad)))[:, None, :]
    kernel = functools.partial(_stacked_i8_kernel, scale=scale, dh=Dh,
                               kv_heads=Hkv, n_rep=n_rep, s_pad=s_pad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, H * Dh), lambda b, li_ref: (b, 0, 0)),
            pl.BlockSpec((1, 1, S, KDh), lambda b, li_ref: (li_ref[0], b, 0, 0)),
            pl.BlockSpec((1, 1, S, Hkv), lambda b, li_ref: (li_ref[0], b, 0, 0)),
            pl.BlockSpec((1, 1, S, KDh), lambda b, li_ref: (li_ref[0], b, 0, 0)),
            pl.BlockSpec((1, 1, S, Hkv), lambda b, li_ref: (li_ref[0], b, 0, 0)),
            pl.BlockSpec((1, 1, S + s_pad), lambda b, li_ref: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, H * Dh), lambda b, li_ref: (b, 0, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 1, H * Dh), q.dtype),
        interpret=interpret,
    )(jnp.asarray(li, jnp.int32).reshape(1), qr, kq, ks, vq, vs, validr)
    return out.reshape(B, 1, H, Dh)
