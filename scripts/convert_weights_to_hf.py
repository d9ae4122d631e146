#!/usr/bin/env python
"""Export a framework checkpoint to the HF-layout safetensors format.

Equivalent of the reference's vla-scripts/extern/convert_openvla_weights_to_hf.py
(and scripts/extern/convert_prismatic_weights_to_hf.py): our orbax run dir (or
an in-memory pytree) -> model.safetensors + config.json, loadable by
`load_vla` here or by the HF AutoClasses of the reference ecosystem.
"""

from __future__ import annotations

import json
import sys
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from openvla_probe_tpu.conf.registry import parse_config
from openvla_probe_tpu.overwatch import initialize_overwatch

overwatch = initialize_overwatch(__name__)


@dataclass(frozen=True)
class HFConvertConfig:
    run_dir: str = ""                       # framework run dir (orbax ckpts)
    output_dir: str = "hf-export"
    vision_backbone_id: str = "dinosiglip-vit-so-224px"
    llm_backbone_id: str = "llama2-7b-pure"
    arch_specifier: str = "no-align+fused-gelu-mlp"
    image_resize_strategy: str = "resize-naive"


def main(cfg: HFConvertConfig) -> None:
    import jax
    import numpy as np
    from safetensors.numpy import save_file

    from openvla_probe_tpu.models import catalog
    from openvla_probe_tpu.training import checkpointing as ckpt

    assert cfg.run_dir, "--run_dir is required"
    model_cfg, img_cfg, _ = catalog.build_vlm_config(
        cfg.vision_backbone_id, cfg.llm_backbone_id, cfg.arch_specifier,
        cfg.image_resize_strategy,
    )
    path = ckpt.latest_checkpoint(cfg.run_dir)
    assert path is not None, f"No checkpoint under {cfg.run_dir}"
    overwatch.info(f"Converting {path}")
    # restore the bare param tree (TrainState or {params: ...} or raw params)
    restored = ckpt.load_checkpoint(path, None)
    params = restored.get("params", restored) if isinstance(restored, dict) else restored.params

    state = catalog.params_to_hf_state(params, model_cfg)
    out = Path(cfg.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    save_file(state, str(out / "model.safetensors"))
    hf_config = {
        "model_type": "openvla",
        "vision_backbone_id": cfg.vision_backbone_id,
        "llm_backbone_id": cfg.llm_backbone_id,
        "arch_specifier": cfg.arch_specifier,
        "image_resize_strategy": cfg.image_resize_strategy,
        "text_config": {"vocab_size": model_cfg.llm.vocab_size},
        "pad_to_multiple_of": 64,
    }
    stats_path = Path(cfg.run_dir) / "dataset_statistics.json"
    if stats_path.exists():
        hf_config["norm_stats"] = json.loads(stats_path.read_text())
    (out / "config.json").write_text(json.dumps(hf_config, indent=2))
    overwatch.info(f"Wrote HF export to {out}")


if __name__ == "__main__":
    main(parse_config(HFConvertConfig))
