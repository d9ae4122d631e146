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
