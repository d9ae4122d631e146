#!/usr/bin/env python
"""Download + extract the VLM pretraining datasets.

Equivalent of the reference's scripts/preprocess.py:36-45: per-dataset
download/extract via the component registry, plus the OCR-VQA jpg
normalization pass.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from openvla_probe_tpu.conf.registry import parse_config
from openvla_probe_tpu.overwatch import initialize_overwatch

overwatch = initialize_overwatch(__name__)


@dataclass(frozen=True)
class PreprocessConfig:
    dataset_id: str = "llava-laion-cc-sbu-558k"
    root_dir: str = "data/prismatic-vlms"
    convert_ocr_jpg: bool = True


def main(cfg: PreprocessConfig) -> None:
    from openvla_probe_tpu.preprocessing.download import convert_to_jpg, download_extract

    download_extract(cfg.dataset_id, Path(cfg.root_dir))
    ocr_dir = Path(cfg.root_dir) / "download" / cfg.dataset_id / "ocr_vqa" / "images"
    if cfg.convert_ocr_jpg and ocr_dir.exists():
        overwatch.info("Normalizing OCR-VQA images to jpg")
        convert_to_jpg(ocr_dir)
    overwatch.info("Done")


if __name__ == "__main__":
    main(parse_config(PreprocessConfig))
