#!/usr/bin/env python
"""Single-chip 7B LoRA finetune throughput (QLoRA-style int8 base, streamed).

The reference's LoRA finetune needs 27-72 GB of GPU HBM for OpenVLA-7B
(vla-scripts/finetune.py:9-11: bs=12 on 48 GB, bs=24 on 80 GB, minimum
~27 GB). Here the frozen trunk is int8 (w8a8 forward with a straight-through
dequant backward), adapters stream through `matmul_t` without ever
materializing a merged weight, and decoder/ViT blocks rematerialize in
backward — the full 7B finetunes on ONE 16 GB v5e chip.

Prints ONE JSON line: examples/sec for a full LoRA train step (fwd+bwd+Adam)
at OpenVLA-7B scale on synthetic RLDS-shaped batches.

Env knobs: FT_BATCH (default 8), FT_STEPS (default 10), FT_RANK (default 32),
FT_SEQ (default 64 text tokens; +256 patches +1 BOS in the spliced sequence),
FT_QUANT=int8|bf16 base representation, FT_SCALE=tiny|full|13b (13b also
quantizes the ViT towers by default, FT_QUANT_VIT=1, to fit the 16 GB chip).
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openvla_probe_tpu.utils.platform import apply_platform_env

apply_platform_env()


def main() -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from openvla_probe_tpu.models import vlm
    from openvla_probe_tpu.ops.linear import quantize_params
    from openvla_probe_tpu.training import lora
    from openvla_probe_tpu.training.train_state import OptimizerConfig, make_optimizer
    from openvla_probe_tpu.training.train_step import vla_loss_fn
    from openvla_probe_tpu.vla.action_tokenizer import ActionCodec

    import dataclasses

    scale = os.environ.get("FT_SCALE", "full")
    B = int(os.environ.get("FT_BATCH", "8"))
    steps = int(os.environ.get("FT_STEPS", "10"))
    rank = int(os.environ.get("FT_RANK", "32"))
    T = int(os.environ.get("FT_SEQ", "64"))
    quant = os.environ.get("FT_QUANT", "int8")

    if scale == "tiny":
        cfg = vlm.VLMConfig.tiny()
        T = min(T, 16)
    elif scale == "13b":
        cfg = vlm.VLMConfig.openvla_13b()
    else:
        cfg = vlm.VLMConfig.openvla_7b()
    # remat everywhere: training at 7B scale cannot hold per-layer scores
    cfg = dataclasses.replace(
        cfg,
        llm=dataclasses.replace(cfg.llm, remat=True),
        vision=tuple(dataclasses.replace(v, remat=True) for v in cfg.vision),
    )
    S = cfg.vision[0].image_size
    codec = ActionCodec(vocab_size=min(cfg.llm.vocab_size, 32000))

    # quantized-tree init WITHOUT materializing the bf16 twin (at 13B even a
    # fused init->quantize co-materializes a 5.7 GB bf16 stack with the int8
    # tree); values are arbitrary — this is a throughput bench
    if quant in ("int8", "int4"):
        from openvla_probe_tpu.ops.linear import (
            _DEFAULT_QUANT_SUFFIXES,
            random_params_like,
            random_params_like_eager_int4,
        )

        suffixes = list(_DEFAULT_QUANT_SUFFIXES)
        if os.environ.get("FT_QUANT_VIT", "1" if scale == "13b" else "0") == "1":
            suffixes += ["qkv_w", "proj_w", "fc1_w", "fc2_w"]
        shapes = jax.eval_shape(
            lambda key: quantize_params(vlm.init_params(cfg, key),
                                        suffixes=tuple(suffixes),
                                        bits=4 if quant == "int4" else 8),
            jax.random.key(0))
        if quant == "int4":
            # FT_QUANT=int4: the true 4-bit QLoRA base (3.4 GB at 7B /
            # 6.9 GB at 13B) — per-leaf eager s4 birth, never the whole
            # codes tree (ops.linear.random_params_like_eager_int4)
            params = random_params_like_eager_int4(shapes, jax.random.key(0))
        else:
            params = jax.jit(lambda key: random_params_like(shapes, key))(
                jax.random.key(0))
    else:
        params = jax.jit(lambda key: vlm.init_params(cfg, key))(jax.random.key(0))
    jax.block_until_ready(params)
    _ = np.asarray(jax.tree.leaves(params)[0].ravel()[0])

    lcfg = lora.LoRAConfig(r=rank)
    lora_params = jax.jit(
        lambda k: lora.init_lora_params(params, lcfg, k)
    )(jax.random.key(1))
    # base as a jit ARGUMENT (a closed-over base is captured as ~8.5 GB of
    # lowering constants at 7B scale)
    loss_fn = lora.make_lora_loss_with_base(
        functools.partial(vla_loss_fn, codec=codec), lcfg, stream=True)

    opt = make_optimizer(
        OptimizerConfig(learning_rate=5e-4, lr_schedule_type="constant",
                        max_steps=max(steps, 2), weight_decay=0.0),
        lora_params)
    opt_state = opt.init(lora_params)

    rng = np.random.default_rng(0)
    V = cfg.llm.vocab_size
    ids = rng.integers(2, min(V, 32000), (B, T)).astype(np.int32)
    ids[:, 0] = 1
    labels = np.full((B, T), -100, np.int64)
    labels[:, -9:-1] = rng.integers(V - 256, V, (B, 8))  # 7 action tokens + stop
    batch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((B, T), jnp.int32),
        "pixel_values": jnp.asarray(
            rng.normal(size=(B, 6, S, S)).astype(np.float32), cfg.llm.dtype),
        "labels": jnp.asarray(labels, jnp.int32),
    }

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step_fn(lp, opt_state, base, batch):
        (loss, m), g = jax.value_and_grad(
            lambda l: loss_fn(l, base, cfg, batch), has_aux=True)(lp)
        up, opt_state = opt.update(g, opt_state, lp)
        return optax.apply_updates(lp, up), opt_state, loss

    t0 = time.time()
    lora_params, opt_state, loss = step_fn(lora_params, opt_state, params, batch)
    _ = float(np.asarray(loss))  # fetch: only a host transfer truly waits
    compile_s = time.time() - t0

    for _ in range(2):
        lora_params, opt_state, loss = step_fn(lora_params, opt_state, params, batch)
    _ = float(np.asarray(loss))
    t0 = time.time()
    for _ in range(steps):
        lora_params, opt_state, loss = step_fn(lora_params, opt_state, params, batch)
    final_loss = float(np.asarray(loss))
    dt = (time.time() - t0) / steps

    # model FLOPs estimate: 3x forward cost (fwd + 2x bwd), + remat recompute
    seq = 1 + cfg.num_patches + T - 1
    n_llm = {"full": 6.74e9, "13b": 13.0e9}.get(scale, 1e6)
    flops = 3 * 2 * n_llm * seq * B
    print(json.dumps({
        "metric": f"{'13B' if scale == '13b' else '7B'} LoRA finetune examples/sec/chip",
        "value": round(B / dt, 3),
        "unit": "examples/s",
        "step_ms": round(dt * 1e3, 1),
        "batch": B,
        "rank": rank,
        "seq": int(seq),
        "base_quant": quant,
        "loss": round(final_loss, 4),
        "approx_tflops": round(flops / dt / 1e12, 1),
        "compile_s": round(compile_s, 1),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
