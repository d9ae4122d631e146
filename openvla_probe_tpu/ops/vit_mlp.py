"""Fused ViT MLP half-block Pallas kernel (int8 w8a8, TPU).

One dispatch computes the WHOLE MLP half of a tower block over a resident
row tile:

    out = x + ls2 * fc2_w8a8( act( fc1_w8a8( LN2(x) ) + b1 ) ) + b2-residual

The XLA turbo path runs this as ~6 separate HBM passes per layer (LayerNorm,
activation absmax+quantize, fc1 int8 fusion, GELU, re-quantize, fc2 fusion,
LayerScale+residual) and materializes the [M, F] intermediate in HBM twice
(51 MB bf16 at B=24 DINOv2). Here both int8 weight matrices stay VMEM-resident
across the whole grid (8.4 MB DINOv2 / 9.9 MB SigLIP), each row tile makes one
HBM round trip, and the intermediate never leaves VMEM.

Numerics replicate the XLA turbo path cast-for-cast (fp32 LayerNorm -> bf16,
fp32 absmax-quantize from the bf16 value, int8xint8 -> int32 MXU dot — integer
accumulation is order-EXACT — fp32 scale epilogue -> bf16, bf16 bias add, fp32
activation -> bf16), so kernel-vs-XLA differences come only from the fp32
LayerNorm mean/var reduction order. Turbo-tier only by construction: the
parity tier's weights are bf16 and never route here.

Reference scope: the MLP math is timm ViT Block.mlp (reference towers load
through prismatic/models/backbones/vision/base_vision.py); the fusion itself
has no reference counterpart — it is the TPU answer to the profiled fragmented
tower fusions (PERF_r03.md "remaining headroom" #1).

Env-gated like the other kernels: OVLA_PALLAS=1 + OVLA_PALLAS_VITMLP=1
(default on under the master switch), wired in models/vit.py::_block.
Interpret-validated on CPU (tests/test_vit_mlp_kernel.py); chip A/B pending a
live backend window.
"""

from __future__ import annotations

import functools

import jax
import jax.lax as lax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .linear import QuantWeight


def _act_f32(xf: jnp.ndarray, kind: str) -> jnp.ndarray:
    if kind == "gelu":
        return jax.nn.gelu(xf, approximate=False)
    if kind == "gelu_tanh":
        return jax.nn.gelu(xf, approximate=True)
    if kind == "quick_gelu":
        return xf * jax.nn.sigmoid(1.702 * xf)
    raise ValueError(f"unknown act {kind}")


def _quantize_rows(hf: jnp.ndarray):
    """fp32 [bm, K] -> (int8 codes, fp32 [bm, 1] scales); mirrors _w8a8_dot."""
    sx = jnp.maximum(jnp.max(jnp.abs(hf), axis=-1, keepdims=True) / 127.0, 1e-8)
    hi8 = jnp.clip(jnp.round(hf / sx), -127, 127).astype(jnp.int8)
    return hi8, sx


def _vit_mlp_kernel(
    x_ref, lns_ref, lnb_ref, q1_ref, s1_ref, b1_ref, q2_ref, s2_ref, b2_ref,
    ls2_ref, o_ref, *, eps: float, act: str,
):
    """One M-row-tile program; weights (constant index maps) stay resident.

    Shapes: x_ref [bm, D]; ln/bias/scale/ls2 rows [1, D] or [1, F] (2-D rows —
    Mosaic's 1-D f32 tiling mismatch, see ops/linear._wi8_kernel); q1 [F, D]
    int8; q2 [D, F] int8.
    """
    x = x_ref[:]                                    # [bm, D] bf16
    xf = x.astype(jnp.float32)

    # LayerNorm (fp32 math, bf16 result) — models/vit.layer_norm
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    hn = (xf - mean) * lax.rsqrt(var + eps)
    hf = hn * lns_ref[0][None, :].astype(jnp.float32) + lnb_ref[0][None, :].astype(jnp.float32)
    h = hf.astype(x.dtype)

    # fc1: dynamic per-row activation quant + int8 MXU dot (ops/linear._w8a8_dot)
    hi8, sx = _quantize_rows(h.astype(jnp.float32))
    acc = lax.dot_general(
        hi8, q1_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y1 = (acc.astype(jnp.float32) * sx * s1_ref[0][None, :]).astype(x.dtype)
    y1 = y1 + b1_ref[0][None, :].astype(x.dtype)

    # activation in fp32 (models/vit._act)
    g = _act_f32(y1.astype(jnp.float32), act).astype(x.dtype)

    # fc2
    gi8, sx2 = _quantize_rows(g.astype(jnp.float32))
    acc2 = lax.dot_general(
        gi8, q2_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y2 = (acc2.astype(jnp.float32) * sx2 * s2_ref[0][None, :]).astype(x.dtype)
    y2 = y2 + b2_ref[0][None, :].astype(x.dtype)

    # LayerScale (ones when the tower has none) + residual
    o_ref[:] = x + y2 * ls2_ref[0][None, :].astype(x.dtype)


def _pick_block_m(D: int, F: int) -> int:
    """Row-tile size under the ~16 MB VMEM budget: resident int8 weights
    (2*D*F bytes) + per-tile transients (~12 bytes/row/F-lane peak: int32 acc,
    fp32 epilogue, bf16/int8 values) + double-buffered [bm, D] in/out tiles."""
    import os

    forced = os.environ.get("OVLA_VITMLP_BM")
    if forced:
        return int(forced)
    weights = 2 * D * F
    for bm in (256, 128, 64, 32):
        if weights + bm * F * 12 + 4 * bm * D * 2 <= 14_500_000:
            return bm
    return 16


@functools.partial(
    jax.jit,
    static_argnames=("eps", "act", "interpret"),
)
def fused_mlp_residual(
    x: jnp.ndarray,             # [M, D] bf16 (flat tower activations)
    ln_scale: jnp.ndarray,      # [D]
    ln_bias: jnp.ndarray,       # [D]
    fc1: QuantWeight,           # {"q": [F, D] int8, "s": [F] f32}
    fc1_b: jnp.ndarray,         # [F]
    fc2: QuantWeight,           # {"q": [D, F] int8, "s": [D] f32}
    fc2_b: jnp.ndarray,         # [D]
    ls2: jnp.ndarray,           # [D] (pass ones when the tower has no LayerScale)
    eps: float = 1e-6,
    act: str = "gelu_tanh",
    interpret: bool = False,
) -> jnp.ndarray:
    M, D = x.shape
    F = fc1["q"].shape[0]
    bm = _pick_block_m(D, F)
    m_pad = (-M) % bm
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
    Mp = M + m_pad

    row = lambda a: a.reshape(1, -1)
    kernel = functools.partial(_vit_mlp_kernel, eps=eps, act=act)
    const = lambda i: (0, 0)
    out = pl.pallas_call(
        kernel,
        grid=(Mp // bm,),
        in_specs=[
            pl.BlockSpec((bm, D), lambda i: (i, 0)),
            pl.BlockSpec((1, D), const),
            pl.BlockSpec((1, D), const),
            pl.BlockSpec((F, D), const),
            pl.BlockSpec((1, F), const),
            pl.BlockSpec((1, F), const),
            pl.BlockSpec((D, F), const),
            pl.BlockSpec((1, D), const),
            pl.BlockSpec((1, D), const),
            pl.BlockSpec((1, D), const),
        ],
        out_specs=pl.BlockSpec((bm, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Mp, D), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * Mp * D * F,
            bytes_accessed=2 * D * F + 4 * Mp * D,
            transcendentals=Mp * F,
        ),
        interpret=interpret,
    )(
        x, row(ln_scale), row(ln_bias),
        fc1["q"], row(fc1["s"]), row(fc1_b),
        fc2["q"], row(fc2["s"]), row(fc2_b),
        row(ls2),
    )
    return out[:M]
