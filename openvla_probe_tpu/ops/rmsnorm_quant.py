"""Fused RMSNorm -> per-row int8 quantize Pallas kernel (prefill lever).

VERDICT r3 #8: the mix headline's residual is prefill at ~58% of the int8
MXU peak, with the per-matmul activation absmax+quantize named in the
non-matmul tax (PERF_r03.md prefill accounting). Under XLA the chain is
  read x (bf16) -> RMSNorm -> write h (bf16) -> read h -> absmax/quantize
  -> write x_i8 + s_x
i.e. the normed bf16 activation makes a full HBM round trip per decoder
norm just to be re-read by the quantizer. This kernel emits the int8 rows
and their scales straight from the norm: read x once, write x_i8 + s_x —
saving ~2x59 MB of HBM traffic per llama norm site at B=24 prefill
(2 norm sites x 32 layers ≈ 7.5 GB/call ≈ 9 ms at the v5e 819 GB/s floor,
IF XLA was not already fusing the chain — the e2e A/B decides).

Numerics mirror `llama.rms_norm` + `ops.linear._quantize_activations`
exactly (fp32 variance, bf16 cast before the weight multiply, fp32 absmax/
round/clip), so the consumer-side int8 dot sees identical operands up to
fp32 associativity inside one row. Serving-path only (no VJP — training
never quantizes activations).

Env gates follow the kernel convention: OVLA_PALLAS=1 master +
OVLA_PALLAS_RMSQ=1 (default OFF — a measured e2e winner flips the default).
Mosaic rules honored: blocks' last two dims (8,128)-divisible or equal to
array dims; keepdims row reductions; no scan; no value dynamic-slices.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def use_fused_rmsq() -> bool:
    return (os.environ.get("OVLA_PALLAS", "0") == "1"
            and os.environ.get("OVLA_PALLAS_RMSQ", "0") == "1")


def _rmsq_kernel(x_ref, w_ref, q_ref, s_ref, *, eps: float):
    """One M-block program: x [bm, D] bf16 -> q int8 [bm, D], s f32 [bm, 1]."""
    xf = x_ref[...].astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)           # [bm, 1]
    # mirror llama.rms_norm: normalize in fp32, cast to the activation dtype
    # BEFORE the weight multiply (HF convention), then quantize from fp32
    h = (xf * jax.lax.rsqrt(var + eps)).astype(x_ref.dtype) * w_ref[0]
    hf = h.astype(jnp.float32)
    s = jnp.max(jnp.abs(hf), axis=-1, keepdims=True) / 127.0  # [bm, 1]
    s = jnp.maximum(s, 1e-8)
    q_ref[...] = jnp.clip(jnp.round(hf / s), -127, 127).astype(jnp.int8)
    s_ref[...] = s


@functools.partial(jax.jit, static_argnames=("eps", "block_m", "interpret"))
def rms_norm_quant(
    x: jnp.ndarray,           # [..., D] bf16/f32
    weight: jnp.ndarray,      # [D]
    eps: float,
    block_m: int = 256,
    interpret: bool = False,
):
    """Returns (x_i8 [..., D] int8, s_x [..., 1] f32) — the pre-quantized
    activation pair `ops.linear.matmul_t` consumes in place of the normed
    bf16 tensor. Rows pad to the block multiple internally (zero rows have
    var 0 -> rsqrt(eps), absmax 0 -> s clamps at 1e-8; sliced away)."""
    lead = x.shape[:-1]
    D = x.shape[-1]
    x2 = x.reshape(-1, D)
    M = x2.shape[0]
    bm = min(block_m, max(8, M))
    pad = (-M) % bm
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    Mp = x2.shape[0]
    w2 = weight.astype(x.dtype).reshape(1, D)
    q, s = pl.pallas_call(
        functools.partial(_rmsq_kernel, eps=eps),
        grid=(Mp // bm,),
        in_specs=[
            pl.BlockSpec((bm, D), lambda i: (i, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bm, D), lambda i: (i, 0)),
            pl.BlockSpec((bm, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Mp, D), jnp.int8),
            jax.ShapeDtypeStruct((Mp, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x2, w2)
    if pad:
        q, s = q[:M], s[:M]
    return q.reshape(*lead, D), s.reshape(*lead, 1)
