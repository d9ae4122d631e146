#!/usr/bin/env python
"""Standalone chip probe for the fused quantized-ViT kernels (ops/vit_mlp.py).

Times ONE kernel (or its XLA-turbo equivalent) as a chained fori_loop so the
per-call time comes from differencing two chain lengths — the tunnel adds
~40 ms per fetch, so single-chain "ms/call" numbers are inflated by 40/iters
(PERF_r03.md measurement calibration). Run each invocation in its own
subprocess under `timeout`: a Mosaic compile hang must not take the session
down.

    python scripts/probe_vit_kernels.py --kernel mlp --iters 64
    python scripts/probe_vit_kernels.py --kernel mlp --iters 192
    # ms/call = (t_192 - t_64) / 128

Kernels: mlp (fused_mlp_residual), ln (fused_ln_w8a8 at the qkv shape),
xla_mlp / xla_ln (the default turbo-path equivalents, for the A/B).
Shapes default to the DINOv2-L tower at B=24 flat rows (M=6264, D=1024,
F=4096, qkv N=3072) — PERF_r03 "remaining headroom" #1.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--kernel", choices=["mlp", "ln", "xla_mlp", "xla_ln"], required=True)
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--M", type=int, default=6264)   # 24 * 261 flat DINOv2 rows
    ap.add_argument("--D", type=int, default=1024)
    ap.add_argument("--F", type=int, default=4096)
    ap.add_argument("--N", type=int, default=3072)   # qkv fused out-dim
    ap.add_argument("--interpret", action="store_true",
                    help="CPU interpret-mode smoke (correct wiring, no timing)")
    args = ap.parse_args()

    if args.interpret:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.lax as lax
    import jax.numpy as jnp

    M, D, F, N = args.M, args.D, args.F, args.N
    interp = bool(args.interpret)

    # build ALL test data on device (host->device through the tunnel is ~MB/s)
    @jax.jit
    def make_data(key):
        ks = jax.random.split(key, 8)
        x = (jax.random.normal(ks[0], (M, D), jnp.float32) * 0.5).astype(jnp.bfloat16)
        mk = lambda k, shape: jnp.clip(
            jnp.round(jax.random.normal(k, shape, jnp.float32) * 40), -127, 127
        ).astype(jnp.int8)
        return {
            "x": x,
            "ln_s": jnp.ones((D,), jnp.bfloat16),
            "ln_b": jnp.zeros((D,), jnp.bfloat16),
            "fc1": {"q": mk(ks[1], (F, D)), "s": jnp.full((F,), 0.004, jnp.float32)},
            "fc1_b": jnp.zeros((F,), jnp.bfloat16),
            "fc2": {"q": mk(ks[2], (D, F)), "s": jnp.full((D,), 0.004, jnp.float32)},
            "fc2_b": jnp.zeros((D,), jnp.bfloat16),
            "ls2": jnp.ones((D,), jnp.bfloat16),
            "wqkv": {"q": mk(ks[3], (N, D)), "s": jnp.full((N,), 0.004, jnp.float32)},
            "bqkv": jnp.zeros((N,), jnp.bfloat16),
        }

    data = make_data(jax.random.key(0))

    from openvla_probe_tpu.ops.linear import _w8a8_matmul as w8a8_matmul
    from openvla_probe_tpu.ops.vit_mlp import fused_ln_w8a8, fused_mlp_residual

    def xla_ln_norm(x, s, b, eps=1e-6):
        xf = x.astype(jnp.float32)
        mean = xf.mean(-1, keepdims=True)
        var = ((xf - mean) ** 2).mean(-1, keepdims=True)
        return ((xf - mean) * lax.rsqrt(var + eps) * s.astype(jnp.float32)
                + b.astype(jnp.float32)).astype(x.dtype)

    if args.kernel == "mlp":
        step = lambda x: fused_mlp_residual(
            x, data["ln_s"], data["ln_b"], data["fc1"], data["fc1_b"],
            data["fc2"], data["fc2_b"], data["ls2"], act="gelu_tanh",
            interpret=interp)
    elif args.kernel == "xla_mlp":
        def step(x):
            h = xla_ln_norm(x, data["ln_s"], data["ln_b"])
            y = w8a8_matmul(h, data["fc1"]) + data["fc1_b"]
            g = jax.nn.gelu(y.astype(jnp.float32), approximate=True).astype(x.dtype)
            y2 = w8a8_matmul(g, data["fc2"]) + data["fc2_b"]
            return x + y2 * data["ls2"]
    elif args.kernel == "ln":
        step = lambda x: fused_ln_w8a8(
            x, data["wqkv"], data["bqkv"], ln=(data["ln_s"], data["ln_b"]),
            interpret=interp)[:, :D]
    else:  # xla_ln
        def step(x):
            h = xla_ln_norm(x, data["ln_s"], data["ln_b"])
            return (w8a8_matmul(h, data["wqkv"]) + data["bqkv"])[:, :D]

    @jax.jit
    def chain(x):
        return lax.fori_loop(0, args.iters, lambda i, v: step(v), x)

    if interp:
        out = np.asarray(chain(data["x"])[:2, :2].astype(jnp.float32))
        print(f"interpret ok kernel={args.kernel} iters={args.iters} out00={out[0,0]:.4f}")
        return

    # warm compile + one throwaway fetch
    np.asarray(chain(data["x"])[:1, :1].astype(jnp.float32))
    t0 = time.perf_counter()
    np.asarray(chain(data["x"])[:1, :1].astype(jnp.float32))
    t1 = time.perf_counter()
    total_ms = (t1 - t0) * 1e3
    print(f'{{"kernel": "{args.kernel}", "iters": {args.iters}, '
          f'"total_ms": {total_ms:.2f}, '
          f'"naive_ms_per_call": {total_ms / args.iters:.4f}}}')


if __name__ == "__main__":
    main()
