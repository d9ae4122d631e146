#!/usr/bin/env python
"""Serve an OpenVLA checkpoint over REST (`POST /act`).

Equivalent of the reference's vla-scripts/deploy.py:66-145 on the stdlib
server: json-numpy payload {image, instruction, unnorm_key?} -> 7-DoF action.
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
class DeployConfig:
    openvla_path: str = "openvla-7b"       # local HF-layout checkpoint dir
    host: str = "0.0.0.0"
    port: int = 8000
    quantize_int8: bool = False            # turbo serving mode (non-bit-parity)
    quantize_bits: str = "8"               # 8 | 4 (grouped int4, half the
                                           # stream) | mix (int8 prefill +
                                           # int4 decode, fastest end-to-end)
    prompt_pad_len: int = 48
    dynamic_batching: bool = False         # micro-batch concurrent requests
    max_batch: int = 24
    max_wait_ms: float = 8.0
    # multi-LoRA serving (models/multilora.py): comma list "name=adapter_dir"
    # of scripts/finetune.py adapter checkpoints. All named adapters stay
    # resident over the ONE (quantized) base; a request picks its adapter via
    # the payload's "adapter" field, and mixed-adapter requests micro-batch
    # together. The reference needs one merged model replica per task.
    adapters: str = ""
    # concat-fused adapter install (PERF_r04.md: 39.17 vs 38.03 calls/s at
    # N=4): A banks quantize onto the base weight rows; every request rides
    # the fused graph (bare-base rows stay bitwise). int8/bf16 bases only.
    fused_adapters: bool = False


def main(cfg: DeployConfig) -> None:
    from openvla_probe_tpu.models.load import load_vla
    from openvla_probe_tpu.serving.server import OpenVLAServer

    overwatch.info(f"Loading OpenVLA from {cfg.openvla_path}")
    model = load_vla(
        cfg.openvla_path, prompt_pad_len=cfg.prompt_pad_len,
        quantize_int8=cfg.quantize_int8,
        quantize_bits=(int(cfg.quantize_bits) if str(cfg.quantize_bits).isdigit()
                       else cfg.quantize_bits),
    )
    if cfg.adapters:
        from openvla_probe_tpu.models import multilora

        pairs = [s.split("=", 1) for s in cfg.adapters.split(",") if s]
        if not all(len(p) == 2 for p in pairs):
            raise ValueError("--adapters must be a comma list of name=dir pairs")
        trees = {name: multilora.load_adapter_checkpoint(d) for name, d in pairs}
        lcfg = multilora.infer_lora_config(next(iter(trees.values())))
        model.set_adapters(trees, lcfg, fused=cfg.fused_adapters)
        overwatch.info(
            f"Installed {len(trees)} LoRA adapters over the shared base "
            f"(r={lcfg.r}{', fused' if cfg.fused_adapters else ''}): {list(trees)}")
    server = OpenVLAServer(
        model, base_vlm=Path(cfg.openvla_path).name,
        dynamic_batching=cfg.dynamic_batching,
        max_batch=cfg.max_batch, max_wait_ms=cfg.max_wait_ms,
    )
    overwatch.info(f"Serving POST /act on {cfg.host}:{cfg.port}")
    server.run(cfg.host, cfg.port)


if __name__ == "__main__":
    main(parse_config(DeployConfig))
