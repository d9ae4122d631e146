"""Pallas flash-attention (prefill) kernel for TPU.

Blockwise softmax(QK^T)V with on-chip running-max/denominator accumulation —
scores never touch HBM (the XLA path materializes ~775 MB/layer at B=16
OpenVLA prefill). Numerically equivalent to llama.attention (fp32 accumulation)
up to reduction order.

Env-gated like the int8 kernel (OVLA_PALLAS=1): Mosaic compilation hangs on
the axon-tunneled backend this build runs against; the kernel is validated in
interpret mode on CPU (tests/test_attention_kernel.py) and slots in on a
directly-attached TPU runtime.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

NEG_INF = -2.3819763e38


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, block_k: int, scale: float):
    """One (batch*head, q-block) program: scan KV blocks with running softmax.

    Block shapes carry a leading singleton (batch*head) axis:
    q_ref [1, Bq, Dh]; k_ref/v_ref [1, S, Dh]; mask_ref [1, Bq, S]; o_ref like q.
    """
    q = q_ref[0].astype(jnp.float32) * scale
    Bq, Dh = q.shape
    S = k_ref.shape[1]
    n_blocks = S // block_k

    def body(carry, i):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = q @ k.T + mask_ref[0, :, pl.ds(i * block_k, block_k)]       # [Bq, block_k]
        m_new = jnp.maximum(m_prev, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_new = l_prev * corr + p.sum(axis=-1, keepdims=True)
        acc = acc * corr + p @ v
        return (m_new, l_new, acc), ()

    init = (
        jnp.full((Bq, 1), NEG_INF, jnp.float32),
        jnp.zeros((Bq, 1), jnp.float32),
        jnp.zeros((Bq, Dh), jnp.float32),
    )
    (m, l, acc), _ = lax.scan(body, init, jnp.arange(n_blocks))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def flash_attention(
    q: jnp.ndarray,        # [B, Tq, H, Dh]
    k: jnp.ndarray,        # [B, Tk, H, Dh]  (kv heads pre-repeated)
    v: jnp.ndarray,
    mask: jnp.ndarray,     # [B, 1, Tq, Tk] additive f32
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    from jax.experimental.pallas import tpu as pltpu

    B, Tq, H, Dh = q.shape
    Tk = k.shape[1]
    scale = 1.0 / np.sqrt(Dh)
    # pad sequence dims to block multiples (padded keys masked out)
    q_pad = (-Tq) % block_q
    k_pad = (-Tk) % block_k
    if q_pad:
        q = jnp.pad(q, ((0, 0), (0, q_pad), (0, 0), (0, 0)))
    if k_pad:
        k = jnp.pad(k, ((0, 0), (0, k_pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, k_pad), (0, 0), (0, 0)))
    mask_full = jnp.broadcast_to(mask, (B, 1, Tq, Tk))[:, 0]
    mask_full = jnp.pad(mask_full, ((0, 0), (0, q_pad), (0, k_pad)),
                        constant_values=NEG_INF)
    Tqp, Tkp = Tq + q_pad, Tk + k_pad

    # layout: merge (B, H) into the grid's leading axis
    qr = q.transpose(0, 2, 1, 3).reshape(B * H, Tqp, Dh)
    kr = k.transpose(0, 2, 1, 3).reshape(B * H, Tkp, Dh)
    vr = v.transpose(0, 2, 1, 3).reshape(B * H, Tkp, Dh)
    mr = jnp.repeat(mask_full, H, axis=0)  # [B*H, Tqp, Tkp] (broadcast over heads)

    kernel = functools.partial(_flash_kernel, block_k=block_k, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(B * H, Tqp // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, Dh), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, Tkp, Dh), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, Tkp, Dh), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, block_q, Tkp), lambda b, i: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, Dh), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Tqp, Dh), q.dtype),
        interpret=interpret,
    )(qr, kr, vr, mr)
    out = out.reshape(B, H, Tqp, Dh).transpose(0, 2, 1, 3)
    return out[:, :Tq]
