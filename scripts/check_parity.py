#!/usr/bin/env python
"""Token-agreement harness: bf16 parity mode vs int8 turbo serving mode.

Greedy action tokens are the serving contract (SURVEY.md §7: argmax-token
equality, not float equality). This script runs N random (or directory-sourced)
images through BOTH modes of a checkpoint and reports exact-token agreement
per dimension — the quantization-drift check that gates enabling the turbo
mode in deployment.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from openvla_probe_tpu.utils.platform import apply_platform_env

apply_platform_env()
from openvla_probe_tpu.conf.registry import parse_config
from openvla_probe_tpu.overwatch import initialize_overwatch

overwatch = initialize_overwatch(__name__)


@dataclass(frozen=True)
class ParityConfig:
    checkpoint: Optional[str] = None     # local HF-layout dir; None = tiny random
    n_images: int = 32
    image_dir: Optional[str] = None      # real frames if available
    instruction: str = "put spoon on towel"
    unnorm_key: Optional[str] = None


def _tiny_model(quant: bool):
    import numpy as np

    import jax

    from openvla_probe_tpu.models import vla, vlm
    from openvla_probe_tpu.ops.image import BackboneTransformSpec, ImageTransformConfig

    cfg = vlm.VLMConfig.tiny()
    params = vlm.init_params(cfg, jax.random.key(0))
    if quant:
        from openvla_probe_tpu.ops.linear import quantize_params

        params = {**params, "llm": quantize_params(params["llm"])}
    serving = vla.VLAServingConfig(vlm=cfg, prompt_pad_len=16,
                                   codec_vocab_size=cfg.llm.vocab_size)
    img_cfg = ImageTransformConfig(specs=(
        BackboneTransformSpec((28, 28), "bicubic", (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
        BackboneTransformSpec((28, 28), "bicubic", (0.5, 0.5, 0.5), (0.5, 0.5, 0.5))))

    class _Tok:
        def encode(self, t):
            return [1] + [(hash(w) % 400) + 3 for w in t.split()]

    stats = {"bridge_orig": {"action": {"q01": -np.ones(7, np.float32),
                                        "q99": np.ones(7, np.float32)}}}
    return vla.OpenVLA(params, serving, _Tok(), stats, img_cfg)


def main(cfg: ParityConfig) -> None:
    import numpy as np

    if cfg.checkpoint:
        from openvla_probe_tpu.models.load import load_vla

        model_ref = load_vla(cfg.checkpoint, quantize_int8=False)
        model_turbo = load_vla(cfg.checkpoint, quantize_int8=True)
        unnorm = cfg.unnorm_key
    else:
        overwatch.info("No checkpoint given; running the tiny random model")
        model_ref = _tiny_model(False)
        model_turbo = _tiny_model(True)
        unnorm = "bridge_orig"

    g = np.random.default_rng(0)
    if cfg.image_dir:
        from PIL import Image

        paths = sorted(Path(cfg.image_dir).glob("*.jpg")) + sorted(Path(cfg.image_dir).glob("*.png"))
        images = [np.asarray(Image.open(p).convert("RGB")) for p in paths[: cfg.n_images]]
    else:
        images = [g.integers(0, 256, (224, 224, 3), dtype=np.uint8) for _ in range(cfg.n_images)]

    prompt = f"In: What action should the robot take to {cfg.instruction.lower()}?\nOut:"
    agree = np.zeros(7, np.int64)
    total = 0
    max_bin_diff = 0
    for img in images:
        t_ref = model_ref.predict_action(img, prompt, unnorm_key=unnorm)["action_tokens"]
        t_turbo = model_turbo.predict_action(img, prompt, unnorm_key=unnorm)["action_tokens"]
        agree += (t_ref == t_turbo).astype(np.int64)
        max_bin_diff = max(max_bin_diff, int(np.abs(
            t_ref.astype(np.int64) - t_turbo.astype(np.int64)).max()))
        total += 1
    rates = agree / total
    overwatch.info(f"per-dim exact-token agreement over {total} images: "
                   + " ".join(f"{r:.3f}" for r in rates))
    overwatch.info(f"overall agreement: {rates.mean():.4f}; max bin drift: {max_bin_diff}")


if __name__ == "__main__":
    main(parse_config(ParityConfig))
