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


def _ln_w8a8_kernel(*refs, eps: float, has_ln: bool, has_res: bool,
                    has_ls: bool):
    """Generic fused single-matmul program:
    out = [res +] [ls *] ( w8a8( LN?(x) ) + b ).

    With the MLP kernel and the ViT flash-attention kernel this makes the
    whole quantized tower block 4 dispatches (qkv-entry, attention,
    proj-exit, MLP) with no standalone LayerNorm/quantize/elementwise passes.
    Ref order: x, [lns, lnb], q, s, b, [res], [ls], out.
    """
    it = iter(refs[:-1])
    x_ref = next(it)
    lns_ref = next(it) if has_ln else None
    lnb_ref = next(it) if has_ln else None
    q_ref, s_ref, b_ref = next(it), next(it), next(it)
    res_ref = next(it) if has_res else None
    ls_ref = next(it) if has_ls else None
    o_ref = refs[-1]

    x = x_ref[:]
    if has_ln:
        xf = x.astype(jnp.float32)
        mean = xf.mean(-1, keepdims=True)
        var = ((xf - mean) ** 2).mean(-1, keepdims=True)
        hf = (xf - mean) * lax.rsqrt(var + eps)
        hf = hf * lns_ref[0][None, :].astype(jnp.float32) + lnb_ref[0][None, :].astype(jnp.float32)
        h = hf.astype(x.dtype)
    else:
        h = x
    hi8, sx = _quantize_rows(h.astype(jnp.float32))
    acc = lax.dot_general(
        hi8, q_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = (acc.astype(jnp.float32) * sx * s_ref[0][None, :]).astype(x.dtype)
    y = y + b_ref[0][None, :].astype(x.dtype)
    if has_ls:
        y = y * ls_ref[0][None, :].astype(x.dtype)
    if has_res:
        y = res_ref[:] + y
    o_ref[:] = y


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_ln_w8a8(
    x: jnp.ndarray,                      # [M, K] bf16
    w: QuantWeight,                      # {"q": [N, K] int8, "s": [N] f32}
    b: jnp.ndarray,                      # [N]
    ln: tuple | None = None,             # (scale [K], bias [K]) -> LN first
    res: jnp.ndarray | None = None,      # [M, N] residual added last
    ls: jnp.ndarray | None = None,       # [N] LayerScale before the residual
    eps: float = 1e-6,
    interpret: bool = False,
) -> jnp.ndarray:
    M, K = x.shape
    N = w["q"].shape[0]
    bm = _pick_block_m(K, N)
    m_pad = (-M) % bm
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
        if res is not None:
            res = jnp.pad(res, ((0, m_pad), (0, 0)))
    Mp = M + m_pad

    row = lambda a: a.reshape(1, -1)
    const = lambda i: (0, 0)
    operands = [x]
    in_specs = [pl.BlockSpec((bm, K), lambda i: (i, 0))]
    if ln is not None:
        operands += [row(ln[0]), row(ln[1])]
        in_specs += [pl.BlockSpec((1, K), const)] * 2
    operands += [w["q"], row(w["s"]), row(b)]
    in_specs += [pl.BlockSpec((N, K), const), pl.BlockSpec((1, N), const),
                 pl.BlockSpec((1, N), const)]
    if res is not None:
        operands.append(res)
        in_specs.append(pl.BlockSpec((bm, N), lambda i: (i, 0)))
    if ls is not None:
        operands.append(row(ls))
        in_specs.append(pl.BlockSpec((1, N), const))

    kernel = functools.partial(
        _ln_w8a8_kernel, eps=eps, has_ln=ln is not None,
        has_res=res is not None, has_ls=ls is not None,
    )
    out = pl.pallas_call(
        kernel,
        grid=(Mp // bm,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, N), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=K * N + 2 * Mp * (K + N),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    return out[:M]


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
