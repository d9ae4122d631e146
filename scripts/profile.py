#!/usr/bin/env python
"""Capture a jax.profiler trace of the serving hot path (or a train step).

The reference has no tracing/profiling machinery (SURVEY.md §5) — this is the
superset: writes a TensorBoard-loadable trace directory for any of the
compiled paths.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from openvla_probe_tpu.utils.platform import apply_platform_env

apply_platform_env()
from openvla_probe_tpu.conf.registry import parse_config


@dataclass(frozen=True)
class ProfileConfig:
    what: str = "serve"             # serve | train
    scale: str = "tiny"             # tiny | full
    out_dir: str = "profiles"
    n_calls: int = 5


def main(cfg: ProfileConfig) -> None:
    import numpy as np

    import jax

    from openvla_probe_tpu.models import vla, vlm
    from openvla_probe_tpu.ops.image import BackboneTransformSpec, ImageTransformConfig

    model_cfg = vlm.VLMConfig.tiny() if cfg.scale == "tiny" else vlm.VLMConfig.openvla_7b()
    params = jax.jit(lambda k: vlm.init_params(model_cfg, k))(jax.random.key(0))
    out = Path(cfg.out_dir)
    out.mkdir(parents=True, exist_ok=True)

    if cfg.what == "serve":
        s = model_cfg.vision[0].image_size
        img_cfg = (ImageTransformConfig.dinosiglip_224() if s == 224 else ImageTransformConfig(
            specs=(BackboneTransformSpec((s, s), "bicubic", (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
                   BackboneTransformSpec((s, s), "bicubic", (0.5, 0.5, 0.5), (0.5, 0.5, 0.5)))))
        serving = vla.VLAServingConfig(vlm=model_cfg, prompt_pad_len=32,
                                       codec_vocab_size=min(model_cfg.llm.vocab_size, 32000))

        class _Tok:
            def encode(self, t):
                return [1] + [(hash(w) % 400) + 3 for w in t.split()]

        stats = {"bridge_orig": {"action": {"q01": -np.ones(7, np.float32),
                                            "q99": np.ones(7, np.float32)}}}
        model = vla.OpenVLA(params, serving, _Tok(), stats, img_cfg)
        g = np.random.default_rng(0)
        img = g.integers(0, 256, (256, 256, 3), dtype=np.uint8)
        model.predict_action(img, "warm up the compile cache")  # compile outside trace
        with jax.profiler.trace(str(out)):
            for _ in range(cfg.n_calls):
                model.predict_action(img, "profile this call")
    else:
        from openvla_probe_tpu.training import OptimizerConfig, TrainState, make_optimizer, make_train_step

        opt = make_optimizer(OptimizerConfig(max_steps=10), params)
        state = TrainState.create(params, opt)
        step = make_train_step(model_cfg, opt, donate=False)
        g = np.random.default_rng(0)
        B, T, S = 2, 16, model_cfg.vision[0].image_size
        batch = {
            "input_ids": g.integers(2, model_cfg.llm.vocab_size, (B, T)).astype(np.int32),
            "attention_mask": np.ones((B, T), np.int32),
            "pixel_values": g.normal(size=(B, 6, S, S)).astype(np.float32),
            "labels": np.where(np.arange(T) >= T - 8,
                               g.integers(2, model_cfg.llm.vocab_size, (B, T)), -100).astype(np.int32),
        }
        state, _ = step(state, batch)  # compile outside trace
        with jax.profiler.trace(str(out)):
            for _ in range(cfg.n_calls):
                state, _ = step(state, batch)
    print(f"trace written to {out} (load with TensorBoard's profile plugin)")


if __name__ == "__main__":
    main(parse_config(ProfileConfig))
