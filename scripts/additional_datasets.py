#!/usr/bin/env python
"""Merge auxiliary instruct datasets (LVIS-Instruct-4V, LRV-Instruct) into the
LLaVa-v1.5 mixture JSONs.

Equivalent of the reference's scripts/additional-datasets/{lvis_instruct_4v,
lrv_instruct}.py: download (or point at) the raw chat JSONs, normalize image
path prefixes, verify image existence, merge with llava_v1_5_mix665k, shuffle
deterministically (seed 7), and write the mix888k / mix1008k / mix1231k files
the DatasetConfig variants reference.
"""

from __future__ import annotations

import json
import random
import sys
from dataclasses import dataclass
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from openvla_probe_tpu.conf.registry import parse_config
from openvla_probe_tpu.overwatch import initialize_overwatch

overwatch = initialize_overwatch(__name__)

LVIS_URL = "https://huggingface.co/datasets/X2FD/LVIS-Instruct4V/resolve/main/lvis_instruct4v_220k.json"
LRV_URLS = {
    "lrv_chart.json": "https://huggingface.co/datasets/VictorSanh/LrvInstruction/resolve/main/chart_release_update.json",
    "lrv_instruct.json": "https://huggingface.co/datasets/VictorSanh/LrvInstruction/resolve/main/filter_cap1.json",
}


@dataclass(frozen=True)
class MergeConfig:
    download_dir: str = "data/download/llava-v1.5-instruct"
    which: str = "lvis4v"          # lvis4v | lrv | lvis4v-lrv
    verify_images: bool = True
    seed: int = 7


def _normalize_lvis(examples, image_prefix="coco/"):
    out = []
    for ex in examples:
        ex = dict(ex)
        if "image" in ex and not ex["image"].startswith(image_prefix):
            ex["image"] = f"{image_prefix}{ex['image']}"
        out.append(ex)
    return out


def _normalize_lrv(examples, image_prefix="lrv/"):
    out = []
    for ex in examples:
        conv = []
        # LRV raw schema: {image_id, question, answer}
        if "question" in ex:
            conv = [
                {"from": "human", "value": f"<image>\n{ex['question']}"},
                {"from": "gpt", "value": ex["answer"]},
            ]
            image = f"{image_prefix}{ex['image_id']}.jpg"
            out.append({"id": str(ex.get("image_id")), "image": image, "conversations": conv})
        else:
            out.append(dict(ex))
    return out


def _verify(examples, root: Path):
    kept = []
    for ex in examples:
        if "image" in ex and not (root / ex["image"]).exists():
            continue
        kept.append(ex)
    return kept


def main(cfg: MergeConfig) -> None:
    from openvla_probe_tpu.preprocessing.download import download_with_progress

    root = Path(cfg.download_dir)
    root.mkdir(parents=True, exist_ok=True)
    base_file = root / "llava_v1_5_mix665k.json"
    assert base_file.exists(), f"{base_file} missing — run preprocessing download first"
    base = json.loads(base_file.read_text())
    random.seed(cfg.seed)

    merged = list(base)
    tag_parts = []
    if "lvis4v" in cfg.which:
        raw = root / "lvis_instruct4v_220k.json"
        if not raw.exists():
            download_with_progress(LVIS_URL, raw)
        lvis = _normalize_lvis(json.loads(raw.read_text()))
        if cfg.verify_images:
            lvis = _verify(lvis, root)
        overwatch.info(f"LVIS-Instruct-4V: {len(lvis)} examples")
        merged += lvis
        tag_parts.append("lvis4v")
    if "lrv" in cfg.which:
        lrv_all = []
        for name, url in LRV_URLS.items():
            raw = root / name
            if not raw.exists():
                download_with_progress(url, raw)
            lrv_all += _normalize_lrv(json.loads(raw.read_text()))
        if cfg.verify_images:
            lrv_all = _verify(lrv_all, root)
        overwatch.info(f"LRV-Instruct: {len(lrv_all)} examples")
        merged += lrv_all
        tag_parts.append("lrv")

    random.shuffle(merged)
    k = round(len(merged) / 1000)
    out = root / f"llava_v1_5_{'_'.join(tag_parts)}_mix{k}k.json"
    out.write_text(json.dumps(merged))
    overwatch.info(f"Wrote {len(merged)} examples -> {out}")


if __name__ == "__main__":
    main(parse_config(MergeConfig))
