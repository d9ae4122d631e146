#!/usr/bin/env python
"""Smoke/latency verification: N random-image predict_action calls.

Equivalent of the reference's vla-scripts/extern/verify_openvla.py:30-89 (and
scripts/extern/verify_prismatic.py): loads a checkpoint (or a random-weight
model at --scale tiny/full), runs repeated predict_action calls, prints
per-call wall times + tokens. This doubles as the quick perf harness.
"""

from __future__ import annotations

import sys
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from openvla_probe_tpu.utils.platform import apply_platform_env

apply_platform_env()
from openvla_probe_tpu.conf.registry import parse_config


@dataclass(frozen=True)
class VerifyConfig:
    checkpoint: Optional[str] = None     # local HF-layout dir; None = random weights
    scale: str = "tiny"                  # random-weight scale when no checkpoint
    n_calls: int = 100
    quantize_int8: bool = False
    instruction: str = "put spoon on towel"


def main(cfg: VerifyConfig) -> None:
    import numpy as np

    import jax

    from openvla_probe_tpu.models import vla as vla_mod, vlm
    from openvla_probe_tpu.serving.server import get_openvla_prompt

    if cfg.checkpoint:
        from openvla_probe_tpu.models.load import load_vla

        model = load_vla(cfg.checkpoint, quantize_int8=cfg.quantize_int8)
    else:
        from openvla_probe_tpu.ops.image import BackboneTransformSpec, ImageTransformConfig

        model_cfg = vlm.VLMConfig.tiny() if cfg.scale == "tiny" else vlm.VLMConfig.openvla_7b()
        params = jax.jit(lambda k: vlm.init_params(model_cfg, k))(jax.random.key(0))
        serving = vla_mod.VLAServingConfig(
            vlm=model_cfg, prompt_pad_len=48,
            codec_vocab_size=min(model_cfg.llm.vocab_size, 32000),
        )
        s = model_cfg.vision[0].image_size
        img_cfg = (
            ImageTransformConfig.dinosiglip_224() if s == 224 else ImageTransformConfig(
                specs=(BackboneTransformSpec((s, s), "bicubic", (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
                       BackboneTransformSpec((s, s), "bicubic", (0.5, 0.5, 0.5), (0.5, 0.5, 0.5))))
        )

        class _Tok:
            def encode(self, txt):
                return [1] + [(hash(w) % 1000) + 100 for w in txt.split()]

        stats = {"bridge_orig": {"action": {
            "q01": -np.ones(7, np.float32), "q99": np.ones(7, np.float32),
            "mask": np.array([True] * 6 + [False])}}}
        model = vla_mod.OpenVLA(params, serving, _Tok(), stats, img_cfg)

    prompt = get_openvla_prompt(cfg.instruction)
    g = np.random.default_rng(0)
    times = []
    for i in range(cfg.n_calls):
        image = g.integers(0, 256, (256, 256, 3), dtype=np.uint8)
        t0 = time.time()
        out = model.predict_action(image, prompt, unnorm_key="bridge_orig")
        dt = time.time() - t0
        times.append(dt)
        print(f"=>> call {i:03d}: {dt*1e3:8.2f} ms  tokens={out['action_tokens'].tolist()}")
    times = np.asarray(times[3:]) if len(times) > 5 else np.asarray(times)
    print(f"\nsteady-state: p50={np.median(times)*1e3:.2f} ms  "
          f"mean={times.mean()*1e3:.2f} ms  => {1.0/times.mean():.2f} calls/s")


if __name__ == "__main__":
    main(parse_config(VerifyConfig))
