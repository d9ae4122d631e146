"""Linear/matmul dispatch: plain bf16 weights or weight-only int8 (Pallas).

The serving bottleneck at 7B/bs=1 is HBM bandwidth — each greedy decode step
streams every weight byte (measured 153 ms/call bf16). Weight-only int8 halves
the stream; the Pallas kernel below keeps the weights int8 ALL the way into
VMEM and dequantizes there (an XLA `convert` would materialize bf16 weights
back to HBM on some shapes, forfeiting the win).

Quantization scheme: symmetric per-output-channel absmax
  q = round(w / s), s = absmax(w, axis=in) / 127      (int8, f32 scales)
Dequantized matmul runs in bf16 on the MXU with f32 accumulation, so serving
numerics change only by the weight rounding (a documented "turbo" mode —
bf16 remains the bit-parity mode).

A quantized weight is the pytree {"q": int8 [..., O, I], "s": f32 [..., O]} —
`linear()` accepts either representation, and layer-stacked quantized weights
slice transparently inside `lax.scan`.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

QuantWeight = Dict[str, jnp.ndarray]
AnyWeight = Union[jnp.ndarray, QuantWeight]


def is_quantized(w: Any) -> bool:
    return isinstance(w, dict) and "q" in w and "s" in w


def is_lora_wrapped(w: Any) -> bool:
    """Streamed-LoRA weight: {"base": bf16-or-quantized W, "A": [r,I], "B": [O,r]}
    (scale already folded into B by training.lora.attach_lora)."""
    return (isinstance(w, dict) and "base" in w and "A" in w and "B" in w
            and "sel" not in w)


def is_multilora(w: Any) -> bool:
    """Multi-adapter LoRA wrapper for batched serving (models/multilora.py):
    {"base": W, "A": [N,r,I], "Bt": [N,r,O], "sel": [B,N]} — N adapter banks
    resident (B stored PRE-TRANSPOSED so the dense-N projection is a flat
    [N*r, O] matmul), `sel` a per-example one-hot selecting each row's
    adapter. Scale is folded into Bt at stack time, like attach_lora."""
    return isinstance(w, dict) and "base" in w and "A" in w and "sel" in w


def is_multilora_fused(w: Any) -> bool:
    """Concat-fused multi-LoRA wrapper (models/multilora.fuse_bank_into_base):
    the A bank's N*r rank rows are quantized and CONCATENATED onto the base
    weight's output rows offline, so the base projection and the rank
    projection are ONE widened dot — {"qf": [O+N*r, K] int8, "sf": [O+N*r],
    "Bt": [N, r, O], "sel": [B, N]} (bf16 bases use "wf" instead of qf/sf).
    The first O output rows are BITWISE the plain base result: the int8 dot
    accumulates exactly in int32 per output row, so widening O cannot change
    them (and bf16 rows are computed per-element the same way)."""
    return isinstance(w, dict) and "Bt" in w and "sel" in w and (
        "qf" in w or "wf" in w)


@jax.tree_util.register_pytree_node_class
class PrequantActivation:
    """Activation rows already RMS-normed AND int8-quantized by the fused
    `ops.rmsnorm_quant` kernel: q8 [..., K] int8 + per-row scales sx
    [..., 1] f32, with the original activation dtype carried statically so
    the dot's output matches what the unfused path would produce.
    `matmul_t` consumes this in place of the bf16 tensor — the int8 dot's
    operands are identical to _quantize_activations' output, so this is a
    pure HBM-traffic optimization of the SAME turbo-tier math."""

    def __init__(self, q8, sx, dtype):
        self.q8, self.sx, self.dtype = q8, sx, jnp.dtype(dtype)

    def tree_flatten(self):
        return (self.q8, self.sx), self.dtype

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux)

    @property
    def shape(self):
        return self.q8.shape

    @property
    def ndim(self):
        return self.q8.ndim


def quantize_weight(w: jnp.ndarray) -> QuantWeight:
    """Symmetric per-output-channel int8 quantization of [..., O, I]."""
    wf = jnp.asarray(w, jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=-1) / 127.0
    s = jnp.maximum(s, 1e-8)
    q = jnp.clip(jnp.round(wf / s[..., None]), -127, 127).astype(jnp.int8)
    return {"q": q, "s": s}


_S4_FORMAT_CACHE: dict = {}


def _canonical_s4_format(shape: tuple):
    """The input Format every jit consumer expects for an s4 array of `shape`.

    Measured on the axon TPU backend (2026-08-18): an s4 array born from a
    plain producer reports `sub_byte_element_size_in_bits=0` in its layout,
    while any compiled consumer requires `=4` for the same tiling. The
    metadata mismatch forces an argument relayout, and jax's s4 relayout
    path recurses into itself (device_put -> jit -> device_put ->
    RecursionError). Producing the array with `out_shardings=<this format>`
    is the one birth path that yields a jit-consumable s4 array. We obtain
    the format by lowering a trivial consumer abstractly — no hand-built
    backend tiling strings.
    """
    key = (shape, jax.default_backend())
    if key not in _S4_FORMAT_CACHE:
        abstract = jax.ShapeDtypeStruct(shape, jnp.int4)
        lowered = jax.jit(lambda a: a.astype(jnp.int8)).lower(abstract)
        try:
            compiled = lowered.compile()
        except Exception:  # transient tunnel compile fault (HTTP 500): retry
            compiled = lowered.compile()
        _S4_FORMAT_CACHE[key] = compiled.input_formats[0][0]
    return _S4_FORMAT_CACHE[key]


def materialize_int4(codes: jnp.ndarray) -> jnp.ndarray:
    """Cast int4-range codes (int8/float) to a jit-consumable s4 array.

    Inside a trace this is a plain astype (no jit boundary is crossed by the
    result *within* the enclosing graph) — but the ENCLOSING jit's s4 outputs
    then carry the producer-default layout metadata and cannot be fed back
    into another jit on TPU (see _canonical_s4_format). Callers that
    materialize s4 trees must therefore emit int8 codes from their jits and
    call this eagerly per leaf (quantize_weight_int4(emit_codes=True) +
    materialize_int4 is that pattern).
    """
    if isinstance(codes, jax.core.Tracer):
        return codes.astype(jnp.int4)
    if jax.default_backend() != "tpu":
        # sub-byte layout metadata is a TPU-only concern
        return jnp.asarray(codes).astype(jnp.int4)
    # TPU: a poisoned-layout s4 array crashes the CONSUMER later (jax's s4
    # relayout path recurses into itself), so never fall back silently here —
    # retry once (tunnel compiles can transiently fail with HTTP 500), then
    # raise at the birth site where the shape/leaf is identifiable.
    fmt = _canonical_s4_format(tuple(codes.shape))
    producer = jax.jit(lambda a: a.astype(jnp.int4), out_shardings=fmt)
    try:
        return producer(codes)
    except Exception:
        return producer(codes)


def quantize_weight_int4(
    w: jnp.ndarray, group_size: int = 128, emit_codes: bool = False
) -> QuantWeight:
    """Symmetric per-(output-channel, input-group) int4 quantization.

    [..., O, I] -> {"q": int4 [..., G, O, group_size], "s": f32 [..., O, G]}
    with G = I/group_size. The codes are stored GROUP-MAJOR: the w4a8 serving
    path is a per-group batched int8 dot whose batch (group) dim XLA wants
    leading — storing [..., O, I] instead costs a full physical transpose of
    the codes per matmul (measured 0.082 vs 0.016 ms at the 4096^2 decode
    shape). int4 halves the decode weight stream vs int8 (XLA stores s4
    bit-packed in HBM); the per-group scales claw back most of the 3-bit
    mantissa loss (GPTQ/AWQ territory needs calibration data — this is the
    data-free absmax variant).

    `emit_codes=True` returns the codes as int8 instead of s4 (same layout):
    the form a jit must emit so the caller can materialize_int4 each leaf
    eagerly (s4 jit *outputs* carry the poisoned layout metadata — see
    _canonical_s4_format).
    """
    wf = jnp.asarray(w, jnp.float32)
    *lead, O, I = wf.shape
    group_size = min(group_size, I)   # tiny/debug dims: one group per row
    if I % group_size:
        raise ValueError(f"in-dim {I} not divisible by group_size {group_size}")
    gw = wf.reshape(*lead, O, I // group_size, group_size)
    s = jnp.max(jnp.abs(gw), axis=-1) / 7.0
    s = jnp.maximum(s, 1e-8)
    codes = jnp.clip(jnp.round(gw / s[..., None]), -7, 7).astype(jnp.int8)
    codes = jnp.moveaxis(codes, -2, -3)   # [..., G, O, group_size]
    if emit_codes:
        return {"q": codes, "s": s}
    return {"q": materialize_int4(codes), "s": s}


def materialize_int4_tree(shapes: Any, raw: Any) -> Any:
    """Eager per-leaf s4 materialization of a codes-form tree.

    `shapes` = jax.eval_shape of the NON-emit_codes quantization (int4-dtype
    leaves mark where s4 belongs); `raw` = the emit_codes=True jit output
    (those leaves as int8 codes). Each codes leaf converts via
    materialize_int4 (canonical layout at birth); everything else passes
    through. Callers that must bound peak memory to ONE codes leaf should
    use random_params_like_eager_int4 / models.load's ship() instead."""
    return jax.tree.map(
        lambda sh, lf: materialize_int4(lf) if sh.dtype == jnp.int4 else lf,
        shapes, raw)


def quantize_weight_mixed(
    w: jnp.ndarray, group_size: int = 128, emit_codes: bool = False
) -> QuantWeight:
    """Dual-precision serving leaf: per-channel int8 AND grouped int4, both
    quantized from the SAME bf16 weights.

    {"q": int8 [..., O, I], "s": f32 [..., O],          <- prefill (large M)
     "q4": s4 [..., G, O, gsz], "s4": f32 [..., O, G]}  <- decode  (small M)

    Rationale (PERF_r03.md): at prefill M the int8 w8a8 dot is the fastest
    formulation (the w4a8 requant transient costs +19%); at decode M the
    grouped-int4 batched dot BEATS int8 (0.016 vs 0.022 ms — the weight
    stream halves and the [G,M,N] accumulator fuses in VMEM). Holding both
    copies resident (int8 + int4 = 1.5x the int8 bytes) buys int8-tier
    prefill AND int4-tier decode in one serving call. matmul_t dispatches on
    the (static, traced-per-scan) row count. Numerics: prefill positions see
    exactly the int8-turbo perturbation, decode matmuls the int4 one — both
    individually certified (PARITY_r03.md).
    """
    w8 = quantize_weight(w)
    in_dim = np.shape(w)[-1]
    if in_dim % min(group_size, in_dim):
        # ungroupable in-dim (same rule as quantize_params' bits=4 fallback):
        # a single int8 copy serves both M regimes
        return w8
    w4 = quantize_weight_int4(w, group_size=group_size, emit_codes=emit_codes)
    return {"q": w8["q"], "s": w8["s"], "q4": w4["q"], "s4": w4["s"]}


def is_mixed_quant(w: Any) -> bool:
    """Dual-precision {"q","s","q4","s4"} leaf (see quantize_weight_mixed)."""
    return is_quantized(w) and "q4" in w


def quantize_weight_nibble(w: jnp.ndarray, emit_codes: bool = False) -> QuantWeight:
    """Nested nibble-plane int8: ONE int8-grade trunk stored as two 4-bit
    planes, replacing the mix tier's dual-copy layout (VERDICT r4 #1).

    The per-channel int8 codes q8 = round(w/s) (exactly quantize_weight's
    grid) are split by floor-division into
        hi = floor(q8 / 16)   in [-8, 7]   (s4)
        lo = q8 - 16*hi - 8   in [-8, 7]   (s4; the residual nibble, biased)
    so q8 = 16*hi + lo + 8 reconstructs EXACTLY (for q8 in [-127, 127] the
    intermediate 16*hi in [-128, 112] never overflows int8).

    - PREFILL (large M) streams both planes (1 B/elem total — int8's own
      traffic), reconstructs exact int8 codes in-register, and takes the
      standard w8a8 dot: prefill numerics are BIT-IDENTICAL to the int8 tier.
    - DECODE (small M) streams ONLY the hi plane (0.5 B/elem — int4's
      traffic) and applies the nibble midpoint as a rank-1 correction:
      w ≈ (16*hi + 7.5)·s, so out = s_x·s_n·(16·Σx·hi + 7.5·Σx) — the
      error |lo+8-7.5| ≤ 7.5 codes is the same magnitude as
      round-to-nearest-16, with zero bias per channel in expectation.

    Resident bytes: 2 × 0.5 (planes) + scales ≈ the int8 tier's 1 B/elem —
    vs the dual-copy mix leaf's 1.5 B/elem, which pinned the headline batch
    at B=24, made serving-side fusion RESOURCE_EXHAUSTED, and kept 13B mix
    off-chip (PERF_r04.md). Decode numerics differ from grouped int4
    (per-channel step absmax·16/127 ≈ absmax/7.94 vs per-128-group
    absmax/7): re-certified separately (scripts/trained_parity.py "nibble").

    {"hi": s4 [..., O, I], "lo": s4 [..., O, I], "s": f32 [..., O]};
    emit_codes=True keeps both planes as int8 CODES for eager per-leaf
    materialize_int4 (s4 jit outputs carry poisoned layout metadata — see
    _canonical_s4_format)."""
    w8 = quantize_weight(w)
    q8 = w8["q"].astype(jnp.int32)
    hi = jnp.floor_divide(q8, 16)                       # [-8, 7]
    lo = q8 - 16 * hi - 8                               # [-8, 7]
    hi8, lo8 = hi.astype(jnp.int8), lo.astype(jnp.int8)
    if emit_codes:
        return {"hi": hi8, "lo": lo8, "s": w8["s"]}
    return {"hi": materialize_int4(hi8), "lo": materialize_int4(lo8),
            "s": w8["s"]}


def is_nibble_quant(w: Any) -> bool:
    """Nibble-plane leaf {"hi","lo","s"} (see quantize_weight_nibble)."""
    return isinstance(w, dict) and "hi" in w and "lo" in w and "s" in w


def nibble_reconstruct_q8(w: QuantWeight) -> jnp.ndarray:
    """Exact int8 codes from the two planes: q8 = 16*hi + lo + 8."""
    return (jnp.int8(16) * w["hi"].astype(jnp.int8)
            + w["lo"].astype(jnp.int8) + jnp.int8(8))


def is_grouped_int4(w: Any) -> bool:
    """Grouped-int4 weight: q [..., G, O, gsz] (s4, or int8 CODES from
    emit_codes=True) with scales s [..., O, G]."""
    if not is_quantized(w):
        return False
    q, s = w["q"], w["s"]
    if q.dtype == jnp.int4:
        return True
    # int8-codes form: same layout; distinguish from per-channel int8
    # ([..., O, I] with s [..., O]) by the (G, O) <-> (O, G) shape match
    return (s.ndim >= 2 and q.ndim == s.ndim + 1
            and q.shape[-3] == s.shape[-1] and q.shape[-2] == s.shape[-2])


def dequantize_weight(qw: QuantWeight, dtype=jnp.bfloat16) -> jnp.ndarray:
    if is_nibble_quant(qw):
        # exact int8 reconstruction (the prefill relation); per-channel dequant
        q8 = nibble_reconstruct_q8(qw)
        return (q8.astype(jnp.float32) * qw["s"][..., None]).astype(dtype)
    q, s = qw["q"], qw["s"]
    if is_grouped_int4(qw):
        # grouped codes [..., G, O, gsz] x scales [..., O, G] -> [..., O, I]
        *lead, G, O, gsz = q.shape
        sw = jnp.moveaxis(s, -1, -2)[..., None]            # [..., G, O, 1]
        wf = q.astype(jnp.float32) * sw
        return jnp.moveaxis(wf, -3, -2).reshape(*lead, O, G * gsz).astype(dtype)
    return (q.astype(jnp.float32) * s[..., None]).astype(dtype)


# --- Pallas weight-only int8 matmul -----------------------------------------

def _wi8_kernel(x_ref, q_ref, s_ref, o_ref):
    """o[M, TN] = (x[M, K] @ q[TN, K].T) * s[1, TN] — dequant in VMEM.

    Scales ride as a 2-D [1, N] row: a 1-D f32 operand's XLA tile (T(1024))
    can disagree with the tile Mosaic derives from a 1-D block shape
    (T(block_n)) — seen as a verify-layout failure at N=32256 lm_head."""
    x = x_ref[:]
    w = q_ref[:].astype(jnp.bfloat16)
    acc = jax.lax.dot_general(
        x, w, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = (acc * s_ref[0][None, :].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n"))
def _wi8_matmul_2d(
    x: jnp.ndarray, q: jnp.ndarray, s: jnp.ndarray,
    block_m: int = 256, block_n: int = 512,
) -> jnp.ndarray:
    """x [M, K] bf16 @ int8 [N, K].T -> [M, N] bf16 via Pallas (TPU).

    Grid over (M, N) tiles with the full K dimension resident per tile —
    K <= ~11k keeps each tile pair under the VMEM budget, and the int8
    weight tile is the only large HBM stream.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K = x.shape
    N = q.shape[0]
    # decode-sized M: single tile padded to the bf16 sublane multiple
    block_m = min(block_m, max(16, (M + 15) // 16 * 16))
    block_n = min(block_n, N)
    m_pad = (-M) % block_m
    n_pad = (-N) % block_n
    if n_pad:
        q = jnp.pad(q, ((0, n_pad), (0, 0)))
        s = jnp.pad(s, (0, n_pad))
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
    Mp, Np = M + m_pad, N + n_pad
    s = s[None, :]  # 2-D scales row (see _wi8_kernel docstring)

    out = pl.pallas_call(
        _wi8_kernel,
        grid=(Mp // block_m, Np // block_n),
        in_specs=[
            pl.BlockSpec((block_m, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, K), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * Np, bytes_accessed=Mp * K * 2 + Np * K + Mp * Np * 2,
            transcendentals=0,
        ),
    )(x, q, s)
    return out[:M, :N]


def _use_pallas() -> bool:
    """Pallas int8-matmul path: opt-in via OVLA_PALLAS=1, with a per-kernel
    override OVLA_PALLAS_MATMUL=0 (round 3: all three kernels now COMPILE
    through the tunnel after the BlockSpec/fori_loop fixes, so the granular
    gates exist to A/B each kernel's contribution independently — the wi8
    kernel competes with the w8a8 int8-MXU path on compute-bound prefills
    and only clearly wins on weight-stream-bound decode shapes)."""
    import os

    return (jax.default_backend() == "tpu"
            and os.environ.get("OVLA_PALLAS", "0") == "1"
            and os.environ.get("OVLA_PALLAS_MATMUL", "1") == "1")


def _quantize_activations(x2: jnp.ndarray):
    """Per-row symmetric int8 activation quantization (dynamic absmax)."""
    xf = x2.astype(jnp.float32)
    s_x = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    s_x = jnp.maximum(s_x, 1e-8)
    x_i8 = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
    return x_i8, s_x


@jax.custom_vjp
def _w8a8_dot(x2: jnp.ndarray, q: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Dynamic per-row activation quant + native int8xint8 MXU dot.

    Avoids the XLA dequant trap: with weight-only int8 under XLA, every use
    re-materializes bf16 weights to HBM (measured ~32 ms per 7B decode step).
    int8 dots read the int8 bytes directly. Numerics: ~1/127 relative per
    operand — the documented turbo mode, not the bit-parity mode.
    """
    x_i8, s_x = _quantize_activations(x2)
    acc = jax.lax.dot_general(
        x_i8, q,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * s_x * s[None, :]).astype(x2.dtype)


def _w8a8_dot_fwd(x2, q, s):
    return _w8a8_dot(x2, q, s), (q, s)


def _w8a8_dot_bwd(res, g):
    # Straight-through estimator: the activation round/clip has zero true
    # gradient, which silently kills the training signal through any frozen
    # int8 weight on the grad path (QLoRA's int8 lm_head, notably). Backward
    # flows through the DEQUANTIZED weight — the standard STE for
    # quantized-forward training; the weights themselves are frozen (float0).
    q, s = res
    # bf16 dequant (half the transient buffer of f32; fp32 accumulation)
    wd = (q.astype(jnp.bfloat16) * s[:, None].astype(jnp.bfloat16))
    dx = jax.lax.dot_general(
        g.astype(jnp.bfloat16), wd,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(g.dtype)
    # q is integer -> float0 symbolic zero; s is float -> a typed zero (a
    # float0 for a float primal silently zeroes a mathematically nonzero
    # gradient and newer JAX versions reject the dtype mismatch). Training
    # the scales themselves is unsupported (STE treats the base as frozen).
    return (
        dx,
        np.zeros(q.shape, jax.dtypes.float0),
        jnp.zeros(s.shape, s.dtype),
    )


_w8a8_dot.defvjp(_w8a8_dot_fwd, _w8a8_dot_bwd)


def _w8a8_matmul(x2: jnp.ndarray, w: QuantWeight) -> jnp.ndarray:
    return _w8a8_dot(x2, w["q"], w["s"])


def _use_w8a8() -> bool:
    import os

    return os.environ.get("OVLA_W8A8", "1") == "1"


def _multilora_impl() -> str:
    """A/B knob for the UNfused multi-LoRA delta formulation:
    "masked" (default; explicit repeat+multiply between the two flat
    matmuls) or "einsum" (sel folded into one contraction — VERDICT r4 #3b
    asked for this A/B). The fused form is selected structurally, by
    attaching fuse_bank_into_base's wrapper instead."""
    import os

    return os.environ.get("OVLA_MULTILORA_IMPL", "masked")


# --- w4a8: grouped int4 weights on the int8 MXU -------------------------------
#
# The naive int4 serving path (dequantize_weight -> bf16 matmul) is 3x slower
# than int8 end-to-end (measured 14.3 vs 44.6 calls/s at B=24): the grouped
# dequant (reshape x scales x reshape) is not a pure convert, so XLA
# materializes the bf16 weight tensor to HBM per matmul — 4.5 bytes of traffic
# per weight element instead of 0.5, at the bf16 (half) MXU rate. Two
# formulations keep the int4 codes on the int8 MXU instead (all numbers
# measured on-chip at the 4096^2 llama decode / M=6912 prefill shapes):
#
#  * small M (decode, bs=1): per-GROUP batched int8 dot —
#      acc[g,m,n] = sum_k x_i8[m,g,k] * q4[g,n,k]   (int32, exact)
#      out[m,n]   = s_x[m] * sum_g acc[g,m,n] * s_w[n,g]
#    With the codes stored group-major [G, N, gsz] (no per-call batch
#    transpose) this measures 0.016 ms/matmul at M in {8, 24} — FASTER than
#    the int8 w8a8 dot (0.022-0.026): the weight stream halves and the
#    [G, M, N] int32 accumulator fits VMEM, so XLA fuses the scale-reduce
#    into the dot instead of round-tripping it through HBM.
#  * large M (prefill): requantize to an int8 TRANSIENT with per-channel
#    scales s8[n] = max_g s4[n,g] * 7/127, then the standard w8a8 dot.
#    Traffic 2.5 B/elem (0.5 read + 1 write + 1 read) at the full int8 MXU
#    rate: measured 0.791 ms vs int8's 0.665 at M=6912 (the bf16 dequant
#    path: 1.371) — the [G,M,N] accumulator would spill out of VMEM at
#    prefill M and cost far more. The extra int8-grid rounding of an int4
#    value is <= s8/2, i.e. bounded by half an int8 step of the SAME channel
#    scale the plain int8 tier rounds to.


def _w4a8_dot_grouped_fwd_impl(x2, q, s):
    M, K = x2.shape
    G, N, gsz = q.shape
    # batch dim = group (lhs dim 1 / rhs dim 0), contract over gsz -> [G, M, N]
    x_i8, s_x = _quantize_activations(x2)
    acc = jax.lax.dot_general(
        x_i8.reshape(M, G, gsz), q.astype(jnp.int8),
        dimension_numbers=(((2,), (2,)), ((1,), (0,))),
        preferred_element_type=jnp.int32,
    )
    out = jnp.einsum("gmn,ng->mn", acc.astype(jnp.float32), s)
    return (out * s_x).astype(x2.dtype)


@jax.custom_vjp
def _w4a8_dot_grouped(x2: jnp.ndarray, q: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    return _w4a8_dot_grouped_fwd_impl(x2, q, s)


def _w4a8_dot_grouped_fwd(x2, q, s):
    return _w4a8_dot_grouped(x2, q, s), (q, s)


def _w4a8_ste_bwd(res, g):
    # same STE contract as _w8a8_dot: d/dx through the dequantized weight —
    # via the Pallas dx kernel (dequant in VMEM, no weight transient) when
    # the w4a8 kernel gate is on, the XLA bf16-dequant dot otherwise.
    # Shared by BOTH w4a8 forwards (_w4a8_dot_grouped, _w4a8_pallas_dot).
    q, s = res
    return (_w4a8_dx(g, q, s),
            np.zeros(q.shape, jax.dtypes.float0),
            jnp.zeros(s.shape, s.dtype))


_w4a8_dot_grouped.defvjp(_w4a8_dot_grouped_fwd, _w4a8_ste_bwd)


def _w4a8_dot_requant(x2: jnp.ndarray, q: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    G, N, gsz = q.shape
    s8 = jnp.max(s, axis=-1) * (7.0 / 127.0)
    r = jnp.moveaxis(s / (s8[:, None] + 1e-30), -1, -2)[..., None]   # [G, N, 1]
    q8 = jnp.clip(
        jnp.round(q.astype(jnp.float32) * r), -127, 127
    ).astype(jnp.int8)
    q8 = jnp.moveaxis(q8, 0, 1).reshape(N, G * gsz)   # back to [N, K]
    return _w8a8_dot(x2, q8, s8)   # carries the STE custom VJP


def _w4a8_group_m_max() -> int:
    import os

    return int(os.environ.get("OVLA_W4A8_GROUP_M_MAX", "32"))


def _use_w4a8() -> bool:
    import os

    return os.environ.get("OVLA_W4A8", "1") == "1"


# --- Pallas w4a8 matmul (prefill shapes) --------------------------------------

def _w4a8_pallas_kernel(x_ref, q_ref, st_ref, o_ref, xi_ref, *, gsz: int):
    """o[bm, bn] = Σ_g (quant(x)[:, g·gsz:(g+1)·gsz] @ q4[g].T) · st[g]

    The fused form of the large-M requant path: the s4 codes stream straight
    into VMEM (0.5 B/elem — no int8 transient write+read), widen in-register,
    and hit the int8 MXU per K-group with the group scale applied to each
    int32 partial. x rides full-K resident; st = scales TRANSPOSED [G, bn]
    (a [1, bn] dynamic row slice broadcasts; a 1-D slice is Mosaic-hostile).
    Mosaic lowers dynamic slices only through REFS (ref[pl.ds(...)]): the
    quantized activations land in an int8 VMEM scratch (`xi_ref`) so the
    per-group K-slice is a ref load, and q/st slices index their refs —
    `jax.lax.dynamic_slice` on a VALUE is an unimplemented Pallas primitive
    (first real-chip compile of this kernel failed exactly there).
    """
    from jax.experimental import pallas as pl

    x = x_ref[:].astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0, 1e-8)
    xi_ref[:] = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    bm = x.shape[0]
    bn = o_ref.shape[1]
    G = q_ref.shape[0]

    def body(g, acc):
        xg = xi_ref[:, pl.ds(g * gsz, gsz)]                       # [bm, gsz]
        wg = q_ref[pl.ds(g, 1), :, :][0].astype(jnp.int8)         # [bn, gsz]
        p = jax.lax.dot_general(xg, wg, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32)
        sg = st_ref[pl.ds(g, 1), :]                               # [1, bn]
        return acc + p.astype(jnp.float32) * sg

    acc = jax.lax.fori_loop(0, G, body, jnp.zeros((bm, bn), jnp.float32))
    o_ref[:] = (acc * sx).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _w4a8_pallas_matmul(x2: jnp.ndarray, q: jnp.ndarray, s: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
    """x [M, K] @ grouped-int4 [G, N, gsz] -> [M, N] via the fused kernel.

    N must admit a 128-multiple tile (all llama/ViT int4 leaves do); M pads
    to the row-tile. Weights are never padded (that would copy the codes in
    HBM per call)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K = x2.shape
    G, N, gsz = q.shape
    bn = next((b for b in (512, 256, 128) if N % b == 0), None)
    # non-128 gsz makes the in-kernel (bm, gsz) activation slices lane-dim
    # slices off the 128 grid — Mosaic-hostile on real TPU (interpret mode
    # doesn't care, and keeps the small-group tests on the kernel path)
    if bn is None or (gsz % 128 and not interpret):
        return _w4a8_dot_requant(x2, q, s)
    # VMEM cap on the row tile: the kernel holds ~7 B/elem of (bm, K)
    # resident (bf16 x block + f32 cast + int8 scratch) — at K=11008 a
    # bm=256 tile alone is ~17 MB and cannot compile
    bm_cap = max(8, ((8 * 1024 * 1024) // (7 * K)) // 8 * 8)
    bm = min(256, bm_cap, max(8, -(-M // 8) * 8))
    m_pad = (-M) % bm
    if m_pad:
        x2 = jnp.pad(x2, ((0, m_pad), (0, 0)))
    Mp = M + m_pad
    st = s.T   # [G, N]

    out = pl.pallas_call(
        functools.partial(_w4a8_pallas_kernel, gsz=gsz),
        grid=(Mp // bm, N // bn),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, bn, gsz), lambda i, j: (0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, K), jnp.int8)],
        out_shape=jax.ShapeDtypeStruct((Mp, N), x2.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N, bytes_accessed=Mp * K * 2 + N * K // 2 + Mp * N * 2,
            transcendentals=0),
        interpret=interpret,
    )(x2, q, st)
    return out[:M]


def _w4a8_dx_kernel(g_ref, q_ref, st_ref, o_ref):
    """dx[bm, Gb·gsz slab] += Σ_gi (g[bm, bn] ⊙ s[n, gi]) @ q4-codes[gi, bn]

    The STE backward's weight dequant happens IN VMEM: the s4 codes stream at
    0.5 B/elem and widen in-register — no [N, K] bf16 (or int8) weight
    transient in HBM, which is exactly what eats the freed int4 headroom in
    the remat'd QLoRA step (PERF_r03.md "13B int4-base QLoRA" section).
    The group scale s[n, g] is indexed by the CONTRACTION dim n, so it
    applies to the gradient's lanes — a natural [1, bn] broadcast with no
    transposes or lane-dim dynamic slices. Grid (mi, kj, nk): the output
    block (mi, kj) spans Gb groups (amortizing the gradient stripe's HBM
    reads over a wide K-slab) and accumulates across the innermost nk sweep
    (Mosaic executes the last grid dim sequentially)."""
    from jax.experimental import pallas as pl

    nk = pl.program_id(2)
    kj = pl.program_id(1)
    Gb, bn, gsz = q_ref.shape
    G = st_ref.shape[0]
    g = g_ref[:].astype(jnp.float32)
    slabs = []
    for gi in range(Gb):                       # static unroll
        row = kj * Gb + gi                     # absolute group index (traced)
        # sublane-dim dynamic REF load of the full-G scale stripe (Mosaic
        # lowers dynamic slices only through refs; jax.lax.dynamic_slice on
        # a value is an unimplemented Pallas primitive). OOB rows clamp to
        # G-1 for the load and zero-mask, so tail-block q garbage
        # contributes 0.
        sg = st_ref[pl.ds(jnp.minimum(row, G - 1), 1), :]          # [1, bn]
        sg = jnp.where(row < G, sg, jnp.zeros_like(sg))
        gs = (g * sg).astype(jnp.bfloat16)                         # [bm, bn]
        wq = q_ref[gi].astype(jnp.int8).astype(jnp.bfloat16)       # [bn, gsz]
        slabs.append(jax.lax.dot_general(
            gs, wq, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    p = jnp.concatenate(slabs, axis=1) if len(slabs) > 1 else slabs[0]

    @pl.when(nk == 0)
    def _init():
        o_ref[:] = p

    @pl.when(nk != 0)
    def _acc():
        o_ref[:] = o_ref[:] + p


def _w4a8_dx_xla(g2: jnp.ndarray, q: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """XLA form of the STE dx: bf16-dequant the grouped weight, one dot."""
    wd = dequantize_weight({"q": q, "s": s}, jnp.bfloat16)
    return jax.lax.dot_general(
        g2.astype(jnp.bfloat16), wd,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(g2.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _w4a8_dx_pallas(g2: jnp.ndarray, q: jnp.ndarray, s: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """g2 [M, N] @ dequant(grouped-int4 [G, N, gsz]) -> dx [M, K=G*gsz]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, N = g2.shape
    G, N2, gsz = q.shape
    assert N == N2
    bn = next((b for b in (512, 256, 128) if N % b == 0), None)
    if bn is None or (gsz % 128 and not interpret):
        return _w4a8_dx_xla(g2, q, s)
    bm = min(256, max(8, -(-M // 8) * 8))
    # groups per output slab: a wide slab amortizes the gradient stripe
    # (g re-reads = ceil(G/Gb), the round-9 review's G-times-traffic bug),
    # bounded by a ~4 MB f32 out block; the tail slab zero-masks past G
    Gb = min(G, max(1, (4 * 1024 * 1024 // 4 // bm) // gsz))
    nj = -(-G // Gb)
    m_pad = (-M) % bm
    if m_pad:
        g2 = jnp.pad(g2, ((0, m_pad), (0, 0)))
    Mp = M + m_pad
    st = s.T   # [G, N] — scales slice along sublanes inside the kernel

    out = pl.pallas_call(
        _w4a8_dx_kernel,
        grid=(Mp // bm, nj, N // bn),
        in_specs=[
            pl.BlockSpec((bm, bn), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((Gb, bn, gsz), lambda i, j, k: (j, k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, bn), lambda i, j, k: (0, k), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, Gb * gsz), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, G * gsz), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * N * G * gsz,
            # honest traffic: g re-read once per K-slab, codes once per M-tile
            bytes_accessed=(Mp * N * 2 * nj + (N * G * gsz // 2) * (Mp // bm)
                            + Mp * G * gsz * 4),
            transcendentals=0),
        interpret=interpret,
    )(g2, q, st)
    return out[:M].astype(g2.dtype)


def _w4a8_dx(g2: jnp.ndarray, q: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """STE backward for grouped-int4 weights: dx = g2 @ dequant(W).

    Pallas (dequant-in-VMEM, no HBM weight transient) when the w4a8 kernel
    gate is on; XLA bf16-dequant dot otherwise."""
    if _use_pallas_w4a8():
        import os

        interp = os.environ.get("OVLA_PALLAS_INTERPRET", "0") == "1"
        return _w4a8_dx_pallas(g2, q, s, interpret=interp)
    return _w4a8_dx_xla(g2, q, s)


@jax.custom_vjp
def _w4a8_pallas_dot(x2: jnp.ndarray, q: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Differentiable wrapper over the fused Pallas w4a8 forward: the raw
    pallas_call has no VJP, so QLoRA over an int4 base with the kernel gate
    on would fail in grad. Backward is the same STE contract as
    _w4a8_dot_grouped — via the Pallas dx kernel, so a training step never
    materializes a weight transient in either direction."""
    import os

    interp = os.environ.get("OVLA_PALLAS_INTERPRET", "0") == "1"
    return _w4a8_pallas_matmul(x2, q, s, interpret=interp)


def _w4a8_pallas_dot_fwd(x2, q, s):
    return _w4a8_pallas_dot(x2, q, s), (q, s)


_w4a8_pallas_dot.defvjp(_w4a8_pallas_dot_fwd, _w4a8_ste_bwd)


def _use_pallas_w4a8() -> bool:
    import os

    interp = os.environ.get("OVLA_PALLAS_INTERPRET", "0") == "1"
    return ((jax.default_backend() == "tpu" or interp)
            and os.environ.get("OVLA_PALLAS", "0") == "1"
            and os.environ.get("OVLA_PALLAS_W4A8", "1") == "1")


def _w4a8_matmul(x2: jnp.ndarray, w: QuantWeight) -> jnp.ndarray:
    if _use_pallas_w4a8():
        # the kernel covers EVERY M: its [bm, bn] accumulator never leaves
        # VMEM, where the XLA grouped dot's [G, M, N] int32 intermediate
        # spills at the K=11008 shapes (even decode M pads to 8 sublanes).
        # The custom-VJP wrapper keeps QLoRA-over-int4 differentiable with
        # the Pallas STE backward (dx kernel, no weight transient).
        return _w4a8_pallas_dot(x2, w["q"], w["s"])
    if x2.shape[0] <= _w4a8_group_m_max():
        return _w4a8_dot_grouped(x2, w["q"], w["s"])
    return _w4a8_dot_requant(x2, w["q"], w["s"])


def _use_multilora_grouped() -> bool:
    """MEASURED LOSER, default OFF (PERF_r05.md): grouping the q/k/v and
    gate/up second dots into one batched dot was projected ~+1.3 calls/s
    from the op-count change (7 -> 4 projections/layer, VERDICT r4 #3) but
    measured 36.21 vs 39.16 calls/s at N=4 r=32 B=24 — the per-step
    jnp.stack of the u/Bt operands costs more HBM traffic than the saved
    ~37 µs dispatch floors. Kept behind OVLA_MULTILORA_GROUPED=1 as the
    documented A/B."""
    import os

    return os.environ.get("OVLA_MULTILORA_GROUPED", "0") == "1"


def _mlf_widened_dot(x2: jnp.ndarray, w: QuantWeight, dt) -> jnp.ndarray:
    """The concat-fused multi-LoRA widened base dot (mirrors the PLAIN int8
    dispatch exactly — see matmul_t's is_multilora_fused branch)."""
    if "qf" in w:
        if _use_pallas():
            return _wi8_matmul_2d(x2, w["qf"], w["sf"])
        if _use_w8a8():
            return _w8a8_dot(x2, w["qf"], w["sf"])
        return x2 @ (w["qf"].astype(dt) * w["sf"][:, None].astype(dt)).T
    return x2 @ w["wf"].astype(dt).T


def matmul_t_grouped(x: jnp.ndarray, leaves) -> list:
    """[matmul_t(x, w) for w in leaves], with the rank projections of
    concat-fused multi-LoRA leaves GROUPED into one batched dot.

    The fused form's residual cost is op-COUNT, not FLOPs: each decode-scan
    rank projection ([M, N*r] x [N*r, O]) is <1 µs of compute but pays the
    TPU's ~37 µs small-matmul pipeline floor, ~1570 times per call at N=4
    (PERF_r04.md per-HLO accounting). Batching the same-shaped second dots
    of same-input targets (q/k/v -> 1, gate/up -> 1; 7 -> 4 projections per
    layer) replaces G ops with ONE [G, M, N*r] x [G, N*r, O] batch-dim dot —
    the VERDICT r4 #3 block-diagonal lever in its zero-padding form. Same
    contraction per G slice, same dtype class as the ungrouped `u @ Bt`
    (multilora_parity must stay 0/896). Falls back to per-leaf matmul_t
    whenever any leaf is not multilora-fused, the Bt geometries differ
    (GQA k/v), or OVLA_MULTILORA_GROUPED=0 (the A/B control)."""
    leaves = list(leaves)
    if (len(leaves) < 2
            or not all(is_multilora_fused(w) for w in leaves)
            or not _use_multilora_grouped()):
        return [matmul_t(x, w) for w in leaves]
    Bt0 = leaves[0]["Bt"]
    if not all(w["Bt"].shape == Bt0.shape for w in leaves):
        return [matmul_t(x, w) for w in leaves]
    dt = x.dtype
    lead, K = x.shape[:-1], x.shape[-1]
    x2 = x.reshape(-1, K)
    N, r, O = Bt0.shape
    G = len(leaves)
    ys, us = [], []
    for w in leaves:
        y_u = _mlf_widened_dot(x2, w, dt)
        ys.append(y_u[:, :O])
        us.append(y_u[:, O:])
    sel = leaves[0]["sel"].astype(dt)                     # [Bex, N]
    Bex = sel.shape[0]
    T = x2.shape[0] // Bex
    mask = jnp.repeat(sel, r, axis=1)                     # [Bex, N*r]
    u3 = jnp.stack(us).reshape(G, Bex, T, N * r)
    u3 = (u3 * mask[None, :, None, :]).reshape(G, Bex * T, N * r)
    Bt3 = jnp.stack([w["Bt"].reshape(N * r, O) for w in leaves]).astype(dt)
    delta3 = jax.lax.dot_general(                          # ONE op for all G
        u3, Bt3, dimension_numbers=(((2,), (1,)), ((0,), (0,))))
    return [(ys[i] + delta3[i]).reshape(*lead, O) for i in range(G)]


# --- nibble-plane dots (see quantize_weight_nibble) ---------------------------

@jax.custom_vjp
def _nib_hi_dot(x2: jnp.ndarray, hi: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Decode-M nibble dot: stream ONLY the hi plane (0.5 B/elem) and apply
    the lo-nibble midpoint as a rank-1 correction.

    w ≈ (16·hi + 7.5)·s  ⇒  out[m,n] = s_x[m]·s[n]·(16·Σ_k x̂[m,k]·hi[n,k]
                                                     + 7.5·Σ_k x̂[m,k])
    One plain [M,K]×[N,K] int8 MXU dot (the s4 plane widens in-register) +
    a row-sum — no grouped [G,M,N] accumulator and no group-major layout,
    so decode M=1 pays none of the grouped-int4 tier's 18.6 ms/call layout
    copies (PERF_r04.md int4-bs=1 profile)."""
    x_i8, s_x = _quantize_activations(x2)
    acc = jax.lax.dot_general(
        x_i8, hi.astype(jnp.int8),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    rowsum = jnp.sum(x_i8.astype(jnp.int32), axis=-1, keepdims=True)   # [M,1]
    out = acc.astype(jnp.float32) * 16.0 + rowsum.astype(jnp.float32) * 7.5
    return (out * s_x * s[None, :]).astype(x2.dtype)


def _nib_hi_dot_fwd(x2, hi, s):
    return _nib_hi_dot(x2, hi, s), (hi, s)


def _nib_hi_dot_bwd(res, g):
    # same STE contract as _w8a8_dot: dx through the (hi-plane) dequantized
    # weight; the planes are frozen (float0), the scales get a typed zero
    hi, s = res
    wd = ((hi.astype(jnp.bfloat16) * 16 + 7.5)
          * s[:, None].astype(jnp.bfloat16))
    dx = jax.lax.dot_general(
        g.astype(jnp.bfloat16), wd,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(g.dtype)
    return (dx, np.zeros(hi.shape, jax.dtypes.float0),
            jnp.zeros(s.shape, s.dtype))


_nib_hi_dot.defvjp(_nib_hi_dot_fwd, _nib_hi_dot_bwd)


def _nib_matmul(x2: jnp.ndarray, w: QuantWeight) -> jnp.ndarray:
    """matmul_t body for a nibble-plane leaf: hi-plane dot at decode M,
    exact-int8 reconstruction + w8a8 at prefill M (bit-identical operands to
    the int8 tier — both planes stream, 1 B/elem, the reconstruct transient
    lives per scan-layer slice). OVLA_W8A8=0 escape: materialized bf16
    dequant of the exact int8 codes at every M."""
    if not _use_w8a8():
        wd = dequantize_weight(w, x2.dtype)
        return x2 @ wd.T
    if _use_w4a8() and x2.shape[0] <= _w4a8_group_m_max():
        return _nib_hi_dot(x2, w["hi"], w["s"])
    return _w8a8_dot(x2, nibble_reconstruct_q8(w), w["s"])


def matmul_t(x: jnp.ndarray, w: AnyWeight) -> jnp.ndarray:
    """x [..., K] @ w[O, K].T -> [..., O]; w may be bf16/f32, quantized, or a
    streamed-LoRA wrapper {"base", "A", "B"}. `x` may also be a
    PrequantActivation (fused rmsnorm+quantize output) when w carries an
    int8 copy — the dot then skips its own activation quantize."""
    if isinstance(x, PrequantActivation):
        if not (isinstance(w, dict) and "q" in w and w["q"].dtype == jnp.int8):
            raise TypeError(
                "PrequantActivation requires an int8-copy weight leaf; got "
                f"{type(w)} — gate fused rmsnorm+quantize per leaf")
        K = x.q8.shape[-1]
        lead = x.q8.shape[:-1]
        x2 = x.q8.reshape(-1, K)
        s2 = x.sx.reshape(-1, 1)
        acc = jax.lax.dot_general(
            x2, w["q"], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        out = (acc.astype(jnp.float32) * s2 * w["s"][None, :]).astype(x.dtype)
        return out.reshape(*lead, -1)
    if is_multilora(w):
        # multi-adapter serving (models/multilora.py): N adapter banks share
        # one frozen (possibly quantized) base; `sel` [B, N] one-hot picks
        # each example's adapter. Dense-N masked form: project onto ALL N*r
        # adapter ranks in ONE flat [B*T, K] x [K, N*r] matmul, zero the
        # non-selected rank columns with the (repeated) one-hot, and project
        # back through the pre-transposed [N*r, O] bank — two full-lane MXU
        # matmuls with no batch dims. A per-example gathered/batched
        # formulation was measured 116 ms/call at B=24 (r=32 lane tiles +
        # batch-dim dots); this form costs N*r*(1/I+1/O) of the base matmul
        # FLOPs (~6% at N=4, r=32) plus the bank stream. One-hot masking is
        # exact in any float dtype (masked columns contribute 0.0 * w = 0.0
        # terms), so row b computes single-adapter LoRA of adapter sel[b].
        y = matmul_t(x, w["base"])
        dt = x.dtype
        A = w["A"]                                       # [N, r, I]
        Bt = w["Bt"]                                     # [N, r, O] pre-transposed
        sel = w["sel"].astype(dt)                        # [Bex, N] one-hot
        N, r, I = A.shape
        O = Bt.shape[-1]
        lead, K = x.shape[:-1], x.shape[-1]
        Bex = sel.shape[0]
        x3 = x.reshape(Bex, -1, K)                       # rows are batch-major
        T = x3.shape[1]
        if _multilora_impl() == "einsum":
            # A/B variant (VERDICT r4 #3b): fold the sel mask into one
            # einsum instead of an explicit repeat+multiply, letting XLA
            # choose where to apply it. Same math, different graph shape.
            u4 = (x3.reshape(Bex * T, K) @ A.reshape(N * r, I).astype(dt).T
                  ).reshape(Bex, T, N, r)
            delta = jnp.einsum("btnr,bn,nro->bto", u4, sel, Bt.astype(dt),
                               preferred_element_type=dt)
            return y + delta.reshape(*lead, O)
        u = x3.reshape(Bex * T, K) @ A.reshape(N * r, I).astype(dt).T
        # mask columns are n-major blocks of r, matching A.reshape(N*r, I)
        mask = jnp.repeat(sel, r, axis=1)                # [Bex, N*r]
        u = (u.reshape(Bex, T, N * r) * mask[:, None, :]).reshape(Bex * T, N * r)
        delta = u @ Bt.reshape(N * r, O).astype(dt)
        return y + delta.reshape(*lead, O)
    if is_multilora_fused(w):
        # concat-fused multi-LoRA (models/multilora.fuse_bank_into_base):
        # ONE widened dot computes base output and rank projection together —
        # the per-target first delta matmul disappears from the graph
        # (VERDICT r4 #3a). The rank rows ride the base's own representation:
        # int8 bases carry int8-quantized A rows (delta perturbation ~0.4% of
        # the delta itself — far inside trained-margin token equality,
        # certified by scripts/multilora_parity.py), bf16 bases carry A rows
        # verbatim (bit-identical delta math to the masked form).
        dt = x.dtype
        Bt = w["Bt"]                                     # [N, r, O]
        sel = w["sel"].astype(dt)                        # [Bex, N]
        N, r, O = Bt.shape
        lead, K = x.shape[:-1], x.shape[-1]
        x2 = x.reshape(-1, K)
        # the widened dot mirrors the PLAIN int8 dispatch exactly (pallas wi8
        # first, then w8a8, then dense dequant): under OVLA_PALLAS the
        # bare-base rows must take the same numeric class as a plain int8
        # leaf would, or set_adapters(fused=True)'s "bare-base rows are
        # bitwise the plain base" guarantee silently breaks (ADVICE r4).
        y_u = _mlf_widened_dot(x2, w, dt)
        y, u = y_u[:, :O], y_u[:, O:]                    # [.., O], [.., N*r]
        Bex = sel.shape[0]
        T = x2.shape[0] // Bex
        mask = jnp.repeat(sel, r, axis=1)                # [Bex, N*r]
        u = (u.reshape(Bex, T, N * r) * mask[:, None, :]).reshape(Bex * T, N * r)
        delta = u @ Bt.reshape(N * r, O).astype(dt)
        return (y + delta).reshape(*lead, O)
    if is_lora_wrapped(w):
        # QLoRA-style frozen base: plain or int8 {"q","s"} — the int8 base
        # takes the fast w8a8 forward whose custom VJP (straight-through,
        # dequantized-weight backward) keeps d/dx alive for the adapters.
        y = matmul_t(x, w["base"])
        # low-rank side path: two tiny matmuls XLA fuses into the layer scan;
        # never materializes a merged [O, I] weight (the memory lever that
        # lets a 7B base finetune on one 16 GB chip)
        delta = (x @ w["A"].astype(x.dtype).T) @ w["B"].astype(x.dtype).T
        return y + delta
    if is_nibble_quant(w):
        lead = x.shape[:-1]
        out = _nib_matmul(x.reshape(-1, x.shape[-1]), w)
        return out.reshape(*lead, -1)
    if not is_quantized(w):
        return x @ w.T
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    if "q4" in w:
        # dual-precision leaf: row count picks the copy (static per trace —
        # the prefill and decode scan bodies trace separately, so each jit
        # reads exactly one copy's bytes on its hot path). The decode copy
        # is int4 at EVERY decode M, including the M=1 regime where XLA's
        # grouped dot is slow (PERF_r03.md: bs=1 sequential int4 136.6 vs
        # int8 82.4 ms): routing M=1 to the int8 copy would make the
        # speculative verify (M=B*T, int4) and the sequential tail (M=1)
        # read DIFFERENT weights, breaking spec-vs-sequential token
        # equality by construction rather than by reduction order. bs=1
        # sequential serving should use int8 or speculative mix instead.
        if _use_w4a8() and x2.shape[0] <= _w4a8_group_m_max():
            out = _w4a8_dot_grouped(x2, w["q4"], w["s4"])
        elif _use_w8a8():
            out = _w8a8_matmul(x2, {"q": w["q"], "s": w["s"]})
        else:
            wd = dequantize_weight(w, x.dtype)
            out = x2 @ wd.T
        return out.reshape(*lead, -1)
    int8 = w["q"].dtype == jnp.int8 and not is_grouped_int4(w)
    int4 = w["q"].dtype == jnp.int4
    if _use_pallas() and int8:
        out = _wi8_matmul_2d(x2, w["q"], w["s"])
    elif _use_w8a8() and int8:
        out = _w8a8_matmul(x2, w)
    elif _use_w4a8() and int4:
        # grouped int4 on the int8 MXU (see the w4a8 section above); the
        # OVLA_W4A8=0 escape hatch falls back to the materialized bf16 dequant
        out = _w4a8_matmul(x2, w)
    else:
        wd = dequantize_weight(w, x.dtype)
        out = x2 @ wd.T
    return out.reshape(*lead, -1)


def random_params_like(
    shapes: Any, key: jax.Array, weight_scale: float = 0.02,
    int4_as_codes: bool = False,
) -> Any:
    """Random params for an eval_shape tree that may contain quantized leaves.

    Benchmark initializer: generates int8 codes uniformly, per-channel "s"
    scale leaves POSITIVE at the ~absmax(N(0, weight_scale))/127 operating
    point, and float leaves N(0, weight_scale) — without ever materializing
    the bf16 twin of the quantized weights (init->quantize co-materializes
    both, which OOMs a 16 GB chip at 13B scale). Throughput-benchmark use
    only; values are sane (finite logits) but arbitrary."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    ks = jax.random.split(key, len(flat))
    # absmax of ~4k draws from N(0, w) is ~4w (sqrt(2 ln K) ≈ 4.1 at K=4096),
    # so per-channel scales land at ~4w/127 — the same operating point
    # quantize(init(N(0, w))) produces, keeping value-dependent bench outputs
    # (speculative acceptance, loss magnitudes) comparable across rounds
    s_lo = weight_scale * 4.0 / 127.0
    leaves = []
    for (path, s), k in zip(flat, ks):
        name = path[-1].key if hasattr(path[-1], "key") else ""
        if s.dtype == jnp.int8:
            leaves.append(jax.random.randint(k, s.shape, -127, 128, dtype=jnp.int8))
        elif s.dtype == jnp.int4:
            # int4_as_codes=True keeps the leaf as int8 codes: a jitted tree
            # init must NOT emit s4 outputs (poisoned layout metadata — see
            # _canonical_s4_format); the caller materialize_int4()s each
            # code leaf eagerly afterwards. Nibble planes ("hi"/"lo") use
            # the full s4 range [-8, 7] (their defining partition); grouped
            # int4 codes stay symmetric [-7, 7] (absmax/7 grid).
            lo_i = -8 if name in ("hi", "lo") else -7
            codes = jax.random.randint(k, s.shape, lo_i, 8, dtype=jnp.int8)
            leaves.append(codes if int4_as_codes else materialize_int4(codes))
        elif name in ("s", "s4"):
            # grouped-int4 scales ("s4", and bare grouped "s" leaves share
            # the branch harmlessly): absmax over a 128-group of N(0, w) is
            # ~3.2w, over /7 — keep effective weight magnitudes at the same
            # operating point as the int8 copies
            lo = weight_scale * 3.2 / 7.0 if name == "s4" else s_lo
            leaves.append((lo * (1.0 + jax.random.uniform(k, s.shape, jnp.float32))
                           ).astype(s.dtype))
        elif jnp.issubdtype(s.dtype, jnp.floating):
            leaves.append((jax.random.normal(k, s.shape, jnp.float32) * weight_scale
                           ).astype(s.dtype))
        else:
            leaves.append(jnp.zeros(s.shape, s.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def random_params_like_eager_int4(
    shapes: Any, key: jax.Array, weight_scale: float = 0.02,
) -> Any:
    """random_params_like for trees with s4 leaves, without ever
    co-materializing the full int8 CODES tree with the s4 tree.

    The jit+int4_as_codes pattern holds every codes leaf alive until the
    whole tree is materialized — 13 GB of codes + 6.9 GB of s4 at 13B scale,
    an instant OOM on a 16 GB chip. Here one jit produces every NON-int4
    leaf, then the s4 leaves are born one at a time (generate codes ->
    materialize_int4 -> drop codes), bounding the peak at one codes leaf.
    """
    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    int4_idx = [i for i, (_, s) in enumerate(flat) if s.dtype == jnp.int4]
    int4_set = set(int4_idx)

    # one jit for the non-int4 leaves (int4 slots become size-0 placeholders
    # the tree structure keeps, so key-splitting stays identical to
    # random_params_like for reproducibility-by-structure)
    def rest(k):
        full = random_params_like(shapes, k, weight_scale, int4_as_codes=True)
        leaves = jax.tree_util.tree_leaves(full)
        return [jnp.zeros((0,), jnp.int8) if i in int4_set else l
                for i, l in enumerate(leaves)]

    leaves = jax.jit(rest)(key)
    ks = jax.random.split(jax.random.fold_in(key, 4), max(len(int4_idx), 1))
    for j, i in enumerate(int4_idx):
        path, shape = flat[i][0], flat[i][1].shape
        name = path[-1].key if hasattr(path[-1], "key") else ""
        # SAME per-name ranges as random_params_like: nibble planes span the
        # full s4 range [-8, 7], grouped codes stay symmetric [-7, 7]
        lo_i = -8 if name in ("hi", "lo") else -7
        codes = jax.jit(
            lambda k, sh=shape, lo=lo_i: jax.random.randint(
                k, sh, lo, 8, dtype=jnp.int8)
        )(ks[j])
        leaves[i] = materialize_int4(codes)
        del codes   # frees the int8 twin before the next leaf is born
    return jax.tree_util.tree_unflatten(treedef, leaves)


# --- pytree-level quantization ----------------------------------------------

_DEFAULT_QUANT_SUFFIXES = (
    "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj",
    "lm_head",
)

# ViT tower linear leaves; _DEFAULT + VIT == the FULL shipped turbo weight
# set (the single source of truth for bench.py / check_parity / the
# trained-weight certificate — a drifted copy would certify a different
# quantization than the one served)
VIT_QUANT_SUFFIXES = ("qkv_w", "proj_w", "fc1_w", "fc2_w")
TURBO_QUANT_SUFFIXES = _DEFAULT_QUANT_SUFFIXES + VIT_QUANT_SUFFIXES


def quantize_params(
    params: Any,
    suffixes: tuple = _DEFAULT_QUANT_SUFFIXES,
    bits: int = 8,
    group_size: int = 128,
    emit_codes: bool = False,
) -> Any:
    """Quantize matching weight leaves of a param pytree (path-suffix match).

    Default: the Llama trunk + lm_head (the decode bandwidth); embeddings,
    norms, ViT and projector stay bf16. bits=4 selects grouped int4
    (quantize_weight_int4) — half the weight stream of int8 again.
    `emit_codes` (bits=4 under jit): leave int4 leaves as int8 CODES for the
    caller to materialize_int4 eagerly per leaf (s4 jit outputs carry
    poisoned layout metadata — see _canonical_s4_format).

    bits="mix": dual-precision serving tier — the DECODE-stream leaves
    (_DEFAULT_QUANT_SUFFIXES: llama trunk + lm_head, the bytes every cached
    decode step streams) carry BOTH int8 and grouped-int4 copies
    (quantize_weight_mixed); everything else in `suffixes` (the ViT towers,
    which only ever run at prefill M) stays single-copy int8.

    bits="nibble": the nested successor of "mix" (VERDICT r4 #1) — the
    decode-stream leaves hold ONE int8-grade trunk as two 4-bit planes
    (quantize_weight_nibble: exact-int8 prefill, hi-plane int4-traffic
    decode) at int8's resident bytes instead of mix's 1.5x; ViT stays int8.
    """
    if bits not in (4, 8, "mix", "nibble"):
        raise ValueError(f"bits must be 4, 8, 'mix' or 'nibble', got {bits}")

    def walk(path, leaf):
        name = path[-1].key if path and hasattr(path[-1], "key") else ""
        if name in suffixes and np.ndim(leaf) >= 2:
            if bits in ("mix", "nibble"):
                if name in _DEFAULT_QUANT_SUFFIXES:
                    if bits == "nibble":
                        return quantize_weight_nibble(leaf,
                                                      emit_codes=emit_codes)
                    return quantize_weight_mixed(leaf, group_size=group_size,
                                                 emit_codes=emit_codes)
                return quantize_weight(leaf)
            if bits == 4:
                if np.shape(leaf)[-1] % min(group_size, np.shape(leaf)[-1]):
                    # in-dims with no usable group size (SigLIP-so400m's mlp
                    # dim 4304 = 2^4 * 269 admits nothing >= 32) fall back to
                    # per-channel int8 — these ViT leaves are a small slice of
                    # the weight stream the int4 tier exists to halve
                    return quantize_weight(leaf)
                return quantize_weight_int4(leaf, group_size=group_size,
                                            emit_codes=emit_codes)
            return quantize_weight(leaf)
        return leaf

    # NOTE full-scale checkpoint loads must NOT call this on a device-
    # resident bf16 tree: an eager walk materializes f32 absmax transients
    # per leaf and a whole-tree device jit needs ~20.6 GB at 7B-mix
    # (PERF_r04.md dress-rehearsal findings). models/load.py quantizes on
    # the CPU backend and ships only quantized bytes.
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    return jax.tree_util.tree_unflatten(
        treedef, [walk(p, l) for p, l in flat]
    )
