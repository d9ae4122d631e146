#!/usr/bin/env python
"""Synthesize a FULL-SCALE openvla-7b HF snapshot fixture (random weights).

VERDICT r3 #6 (dress rehearsal): the real-weight parity validation remains
environment-blocked (zero egress), so this builds a hub-cache snapshot with
the EXACT file layout of the released `openvla/openvla-7b` repo — sharded
bf16 safetensors + model.safetensors.index.json + full OpenVLAConfig
config.json + dataset_statistics.json + processor/tokenizer sidecars — at
full 7B scale, so `load_vla("openvla/openvla-7b")` (OVLA_HUB_OFFLINE=1) and
`check_parity --checkpoint` exercise every step of the real-weight run
except the download itself.

Layout (huggingface_hub cache contract):
  <cache_dir>/models--openvla--openvla-7b/
    refs/main                      -> <sha>
    snapshots/<sha>/
      config.json                  (OpenVLAConfig schema, hf_export)
      dataset_statistics.json
      preprocessor_config.json / processor_config.json
      tokenizer.json / tokenizer_config.json / special_tokens_map.json
      model-0000i-of-0000N.safetensors   (bf16, ~6 GB shards)
      model.safetensors.index.json

Usage: python scripts/make_synthetic_snapshot.py --out /tmp/ovla_hub
       [--scale full|tiny] [--seed 0] [--shard_gb 6.0]
"""

from __future__ import annotations

import json
import sys
from dataclasses import dataclass
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from openvla_probe_tpu.utils.platform import apply_platform_env

apply_platform_env()
from openvla_probe_tpu.conf.registry import parse_config
from openvla_probe_tpu.overwatch import initialize_overwatch

overwatch = initialize_overwatch(__name__)

SHA = "f" * 40  # fixture revision id


@dataclass(frozen=True)
class SnapshotConfig:
    out: str = "/tmp/ovla_hub"
    scale: str = "full"            # full (7B) | tiny (CI smoke)
    seed: int = 0
    shard_gb: float = 6.0
    repo: str = "openvla/openvla-7b"


def _tiny_tokenizer_json() -> str:
    """A real (loadable) WordLevel tokenizer with the Llama special tokens —
    enough for HostTokenizer.encode to produce valid < vocab prompt ids."""
    words = ["what", "action", "should", "the", "robot", "take", "to", "put",
             "spoon", "on", "towel", "in", "out", "pick", "up", "place",
             "move", "?", ":", "."]
    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2}
    vocab.update({w: i + 3 for i, w in enumerate(words)})
    return json.dumps({
        "version": "1.0",
        "truncation": None, "padding": None,
        "added_tokens": [
            {"id": 0, "content": "<unk>", "single_word": False, "lstrip": False,
             "rstrip": False, "normalized": False, "special": True},
            {"id": 1, "content": "<s>", "single_word": False, "lstrip": False,
             "rstrip": False, "normalized": False, "special": True},
            {"id": 2, "content": "</s>", "single_word": False, "lstrip": False,
             "rstrip": False, "normalized": False, "special": True},
        ],
        "normalizer": {"type": "Lowercase"},
        "pre_tokenizer": {"type": "Whitespace"},
        "post_processor": None, "decoder": None,
        "model": {"type": "WordLevel", "vocab": vocab, "unk_token": "<unk>"},
    })


def main(sc: SnapshotConfig) -> None:
    import numpy as np
    import ml_dtypes

    import jax

    from openvla_probe_tpu.models import catalog, hf_export, vlm

    if sc.scale == "tiny":
        vis_id, llm_id = "dinosiglip-tiny-28px", "llama-tiny"
    else:
        vis_id, llm_id = "dinosiglip-vit-so-224px", "llama2-7b-pure"
    arch, resize = "no-align+fused-gelu-mlp", "resize-naive"
    cfg, img_cfg, _ = catalog.build_vlm_config(vis_id, llm_id, arch, resize)

    org, name = sc.repo.split("/")
    repo_dir = Path(sc.out) / f"models--{org}--{name}"
    snap = repo_dir / "snapshots" / SHA
    snap.mkdir(parents=True, exist_ok=True)
    (repo_dir / "refs").mkdir(exist_ok=True)
    (repo_dir / "refs" / "main").write_text(SHA)

    # --- random bf16 params, host-side (one leaf at a time) -----------------
    overwatch.info("Generating random bf16 params...")
    shapes = jax.eval_shape(lambda: vlm.init_params(cfg, jax.random.key(0)))
    rng = np.random.default_rng(sc.seed)

    def fill(s):
        a = rng.standard_normal(s.shape, dtype=np.float32) * 0.02
        return a.astype(ml_dtypes.bfloat16)

    params = jax.tree.map(fill, shapes)

    overwatch.info("Mapping to the HF state-dict layout...")
    state = catalog.params_to_hf_state(params, cfg)
    del params

    # --- sharded bf16 safetensors + index (released-repo layout) -----------
    from safetensors.numpy import save_file

    budget = int(sc.shard_gb * (1 << 30))
    # plan shard boundaries from byte sizes first, then build and write ONE
    # shard at a time, popping source entries as they convert — holding the
    # full fp32 state AND a converted copy peaks ~40 GB at 7B otherwise
    keys = list(state.keys())
    plans, cur_keys, cur_bytes = [], [], 0
    for k in keys:
        nbytes = state[k].size * 2  # bf16 on disk
        if cur_keys and cur_bytes + nbytes > budget:
            plans.append(cur_keys)
            cur_keys, cur_bytes = [], 0
        cur_keys.append(k)
        cur_bytes += nbytes
    if cur_keys:
        plans.append(cur_keys)
    n = len(plans)
    weight_map, total = {}, 0
    for i, shard_keys in enumerate(plans, start=1):
        fname = (f"model-{i:05d}-of-{n:05d}.safetensors" if n > 1
                 else "model.safetensors")
        shard = {}
        for k in shard_keys:
            v = state.pop(k)
            shard[k] = (v if v.dtype == ml_dtypes.bfloat16
                        else np.asarray(v).astype(ml_dtypes.bfloat16))
        overwatch.info(f"Writing {fname} ({len(shard)} tensors)")
        save_file(shard, str(snap / fname))
        for k, v in shard.items():
            weight_map[k] = fname
            total += v.nbytes
        del shard
    if n > 1:
        (snap / "model.safetensors.index.json").write_text(json.dumps({
            "metadata": {"total_size": total},
            "weight_map": weight_map,
        }, indent=2))
    del state

    # --- config + processor/tokenizer sidecars ------------------------------
    norm_stats = {"bridge_orig": {"action": {
        "q01": [-0.12, -0.11, -0.10, -0.31, -0.35, -0.78, 0.0],
        "q99": [0.13, 0.12, 0.11, 0.31, 0.33, 0.79, 1.0],
        "mean": [0.0] * 7, "std": [0.05] * 7,
        "mask": [True] * 6 + [False],
    }}}
    hf_export.write_export_sidecars(
        snap, cfg, img_cfg, vis_id, llm_id, arch, resize,
        norm_stats=norm_stats)
    (snap / "tokenizer.json").write_text(_tiny_tokenizer_json())
    overwatch.info(f"Snapshot fixture at {snap}")
    print(json.dumps({"snapshot": str(snap), "cache_dir": sc.out,
                      "shards": n, "total_gb": round(total / (1 << 30), 2)}))


if __name__ == "__main__":
    main(parse_config(SnapshotConfig))
