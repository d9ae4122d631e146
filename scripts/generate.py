#!/usr/bin/env python
"""Interactive REPL for base-VLM generation (image + chat prompt).

Equivalent of the reference's scripts/generate.py:52-133: load a Prismatic
VLM checkpoint, read an image path/URL-file and chat turns, greedy-generate.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from openvla_probe_tpu.conf.registry import parse_config


@dataclass(frozen=True)
class GenerateConfig:
    model_path: str = "prism-dinosiglip-224px+7b"
    max_new_tokens: int = 128
    image: str = ""                       # local image path
    # reference REPL sampling flags (scripts/generate.py:44-45)
    do_sample: bool = False
    temperature: float = 1.0
    seed: int = 0


def main(cfg: GenerateConfig) -> None:
    import numpy as np
    from PIL import Image

    import jax.numpy as jnp

    from openvla_probe_tpu.models import generate as gen
    from openvla_probe_tpu.models.load import load
    from openvla_probe_tpu.ops.image import apply_image_transform

    bundle = load(cfg.model_path)
    tokenizer = bundle["tokenizer"]
    prompt_cls = bundle["prompt_builder"]

    assert cfg.image, "--image <path> is required"
    image = np.asarray(Image.open(cfg.image).convert("RGB"))
    pixels = jnp.asarray(apply_image_transform(jnp.asarray(image), bundle["image_cfg"]))[None]

    print("|=> Enter prompts (ctrl-D to exit)")
    builder = prompt_cls()
    try:
        while True:
            msg = input("|=> Enter Prompt: ")
            prompt_text = builder.get_potential_prompt(msg)
            ids = tokenizer.encode(prompt_text)
            text = gen.generate_text(
                bundle["params"], bundle["cfg"], tokenizer, ids,
                pixel_values=pixels, max_new_tokens=cfg.max_new_tokens,
                do_sample=cfg.do_sample, temperature=cfg.temperature,
                seed=cfg.seed,
            )
            builder.add_turn("human", msg)
            builder.add_turn("gpt", text)
            print(f"|=> {text}")
    except EOFError:
        print()


if __name__ == "__main__":
    main(parse_config(GenerateConfig))
