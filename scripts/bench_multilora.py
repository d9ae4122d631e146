#!/usr/bin/env python
"""Multi-LoRA serving throughput A/B: masked vs einsum vs concat-fused.

VERDICT r3 weak #3: N=4 multi-LoRA costs −11.9% (44.57 -> 39.26 calls/s) of
which only ~5-6 ms is bank HBM stream — the other ~65 ms is graph-shape cost
of the delta matmuls riding the decode scan. This harness measures the
candidate fusions at full OpenVLA-7B scale on the chip, one mode per
invocation (one chip owner; bounded subprocesses compose outside):

  --mode plain    int8 base, no adapters (control)
  --mode masked   current dense-N masked form (two extra matmuls/target)
  --mode einsum   sel folded into one contraction (VERDICT r4 #3b)
  --mode fused    A banks concat-quantized onto the base rows offline —
                  ONE widened dot/target (VERDICT r4 #3a)

Prints ONE JSON line. BENCH_PROFILE=<dir> wraps the timed loop in a
jax.profiler trace for scripts/analyze_trace.py.
"""

from __future__ import annotations

import json
import os
import sys
import time
from dataclasses import dataclass
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

import numpy as np

from openvla_probe_tpu.utils.platform import apply_platform_env

apply_platform_env()
from openvla_probe_tpu.conf.registry import parse_config


@dataclass(frozen=True)
class MLBenchConfig:
    mode: str = "masked"          # plain | masked | einsum | fused
    n_adapters: int = 4
    rank: int = 32
    batch: int = 24
    calls: int = 30
    scale: str = "full"           # full | tiny (smoke)


def main(bc: MLBenchConfig) -> None:
    if os.environ.get("OVLA_COMPILE_CACHE"):
        from openvla_probe_tpu.utils.platform import setup_compilation_cache

        setup_compilation_cache(os.environ["OVLA_COMPILE_CACHE"])
    if bc.mode == "einsum":
        os.environ["OVLA_MULTILORA_IMPL"] = "einsum"

    import functools

    import jax
    import jax.numpy as jnp

    from openvla_probe_tpu.models import multilora, vla, vlm
    from openvla_probe_tpu.ops.image import ImageTransformConfig, apply_image_transform
    from openvla_probe_tpu.ops.linear import (
        TURBO_QUANT_SUFFIXES,
        quantize_params,
        random_params_like,
    )
    from openvla_probe_tpu.training import lora as _lora

    if bc.scale == "tiny":
        cfg = vlm.VLMConfig.tiny()
        serving = vla.VLAServingConfig(vlm=cfg, prompt_pad_len=16,
                                       codec_vocab_size=cfg.llm.vocab_size)
        from openvla_probe_tpu.ops.image import BackboneTransformSpec

        s = cfg.vision[0].image_size
        img_cfg = ImageTransformConfig(specs=(
            BackboneTransformSpec((s, s), "bicubic", (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
            BackboneTransformSpec((s, s), "bicubic", (0.5, 0.5, 0.5), (0.5, 0.5, 0.5)),
        ))
        img_hw = (64, 64)
    else:
        cfg = vlm.VLMConfig.openvla_7b().turbo()
        serving = vla.VLAServingConfig(vlm=cfg, prompt_pad_len=32, tier="turbo")
        img_cfg = ImageTransformConfig.dinosiglip_224()
        img_hw = (256, 256)
    serving = serving.with_env_overrides()

    # int8 base, generated quantized directly (bench.py pattern — never
    # co-materialize the bf16 twin at 7B)
    shapes = jax.eval_shape(
        lambda key: quantize_params({**vlm.init_params(cfg, key)},
                                    suffixes=TURBO_QUANT_SUFFIXES, bits=8),
        jax.random.key(0))
    params = jax.jit(lambda key: random_params_like(shapes, key))(jax.random.key(0))
    jax.block_until_ready(params)

    # N random adapter banks, born ON device (tunnel host->device is ~MB/s)
    lcfg = _lora.LoRAConfig(r=bc.rank, include_lm_head=True)
    ad_shapes = jax.eval_shape(
        lambda key: _lora.init_lora_params(jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes), lcfg, key),
        jax.random.key(1))

    def make_bank(key):
        trees = [random_params_like(ad_shapes, k)
                 for k in jax.random.split(key, bc.n_adapters)]
        return multilora.stack_adapter_banks(trees, lcfg)

    bank = jax.jit(make_bank)(jax.random.key(2))
    jax.block_until_ready(bank)

    rng = np.random.default_rng(0)
    image = rng.integers(0, 256, size=(bc.batch, *img_hw, 3), dtype=np.uint8)
    P = serving.prompt_pad_len
    prompt_len = min(26, P - 2)
    ids = np.zeros((bc.batch, P), np.int32)
    ids[:, 0] = 1
    hi = min(20000, cfg.llm.vocab_size - 1)
    ids[:, 1:prompt_len - 1] = rng.integers(min(1000, hi - 1), hi,
                                            (bc.batch, prompt_len - 2))
    ids[:, prompt_len - 1] = vla.EMPTY_TOKEN_ID % cfg.llm.vocab_size
    sel_ids = np.array([(i % (bc.n_adapters + 1)) - 1
                        for i in range(bc.batch)], np.int32)  # incl. -1 rows
    sel = np.asarray(multilora.adapter_one_hot(sel_ids, bc.n_adapters))

    args = dict(
        image_u8=jnp.asarray(image), input_ids=jnp.asarray(ids),
        prompt_len=jnp.full((bc.batch,), prompt_len, jnp.int32),
        q01=jnp.asarray(-np.ones(7, np.float32)),
        q99=jnp.asarray(np.ones(7, np.float32)),
        action_mask=jnp.asarray(np.array([True] * 6 + [False])),
    )

    def serve(p, image_u8, input_ids, prompt_len, q01, q99, action_mask):
        return vla.predict_action_from_image(
            p, serving, image_u8, img_cfg, input_ids, prompt_len,
            q01, q99, action_mask)

    if bc.mode == "plain":
        fn = jax.jit(serve)
        call_args = (params,)
    elif bc.mode in ("masked", "einsum"):
        def ml(p, bank, sel, **kw):
            return serve(multilora.attach_multilora(p, bank, sel), **kw)

        fn = jax.jit(ml)
        call_args = (params, bank, jnp.asarray(sel))
    elif bc.mode == "fused":
        # donate params+bank: fuse duplicates the trunk's int8 rows (qf) —
        # without donation the 6.7 GB int8 trunk would be resident twice
        fused = jax.jit(multilora.fuse_bank_into_base,
                        donate_argnums=(0, 1))(params, bank)
        jax.block_until_ready(fused)
        params = bank = None

        def mlf(fp, sel, **kw):
            return serve(multilora.attach_multilora_fused(fp, sel), **kw)

        fn = jax.jit(mlf)
        call_args = (fused, jnp.asarray(sel))
    else:
        raise ValueError(f"unknown mode {bc.mode}")

    t0 = time.time()
    out = fn(*call_args, **args)
    _ = np.asarray(out["action_tokens"])
    compile_s = time.time() - t0
    for _ in range(3):
        _ = np.asarray(fn(*call_args, **args)["action_tokens"])

    import contextlib

    prof_dir = os.environ.get("BENCH_PROFILE", "")
    ctx = jax.profiler.trace(prof_dir) if prof_dir else contextlib.nullcontext()
    with ctx:
        t0 = time.time()
        for _ in range(bc.calls):
            out = fn(*call_args, **args)
        _ = np.asarray(out["action_tokens"])
        dt = (time.time() - t0) / bc.calls

    print(json.dumps({
        "metric": f"multilora {bc.mode} calls/s",
        "value": round(bc.batch / dt, 3),
        "unit": "calls/s",
        "p50_latency_ms": round(dt * 1e3, 2),
        "mode": bc.mode, "n_adapters": bc.n_adapters, "rank": bc.rank,
        "batch": bc.batch, "compile_s": round(compile_s, 1),
        # the VERDICT r4 #3 op-count lever: grouped same-input rank
        # projections (q/k/v->1, gate/up->1) — A/B via OVLA_MULTILORA_GROUPED
        "grouped": os.environ.get("OVLA_MULTILORA_GROUPED", "0") == "1",
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main(parse_config(MLBenchConfig))
