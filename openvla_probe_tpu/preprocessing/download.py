"""Pretraining-dataset download registry + extraction driver.

Equivalent of the reference's prismatic/preprocessing/download.py: a registry
of the LLaVa-style dataset artifacts (URLs + extraction steps) per dataset id,
with `convert_to_jpg` and `download_extract` drivers. Network access is
environment-dependent; the registry itself is pure data and the extraction
logic runs on anything already on disk.
"""

from __future__ import annotations

import shutil
import tarfile
import zipfile
from pathlib import Path
from typing import Any, Dict, List

from ..overwatch import initialize_overwatch

overwatch = initialize_overwatch(__name__)


DATASET_COMPONENTS: Dict[str, List[Dict[str, Any]]] = {
    "llava-laion-cc-sbu-558k": [
        {
            "name": "chat.json",
            "extract": False,
            "url": "https://huggingface.co/datasets/liuhaotian/LLaVA-Pretrain/resolve/main/blip_laion_cc_sbu_558k.json",
            "do_rename": True,
        },
        {
            "name": "images.zip",
            "extract": True,
            "extract_type": "directory",
            "url": "https://huggingface.co/datasets/liuhaotian/LLaVA-Pretrain/resolve/main/images.zip",
            "do_rename": False,
        },
    ],
    "llava-v1.5-instruct": [
        {
            "name": "llava_v1_5_mix665k.json",
            "extract": False,
            "url": (
                "https://huggingface.co/datasets/liuhaotian/LLaVA-Instruct-150K/"
                "resolve/main/llava_v1_5_mix665k.json"
            ),
            "do_rename": True,
        },
        {
            "name": "coco/train2017",
            "extract": True,
            "extract_type": "directory",
            "url": "http://images.cocodataset.org/zips/train2017.zip",
            "do_rename": True,
        },
        {
            "name": "gqa/images",
            "extract": True,
            "extract_type": "directory",
            "url": "https://downloads.cs.stanford.edu/nlp/data/gqa/images.zip",
            "do_rename": True,
        },
        {
            "name": "ocr_vqa/images",
            "extract": False,
            "url": "https://huggingface.co/datasets/qnguyen3/ocr_vqa/resolve/main/ocr_vqa.zip",
            "do_rename": True,
        },
        {
            "name": "textvqa/train_images",
            "extract": True,
            "extract_type": "directory",
            "url": "https://dl.fbaipublicfiles.com/textvqa/images/train_val_images.zip",
            "do_rename": True,
        },
        {
            "name": "vg/VG_100K",
            "extract": True,
            "extract_type": "directory",
            "url": "https://cs.stanford.edu/people/rak248/VG_100K_2/images.zip",
            "do_rename": True,
        },
        {
            "name": "vg/VG_100K_2",
            "extract": True,
            "extract_type": "directory",
            "url": "https://cs.stanford.edu/people/rak248/VG_100K_2/images2.zip",
            "do_rename": True,
        },
    ],
}


def extract_archive(archive_path: Path, dest_dir: Path) -> None:
    dest_dir.mkdir(parents=True, exist_ok=True)
    if archive_path.suffix == ".zip":
        with zipfile.ZipFile(archive_path) as z:
            z.extractall(dest_dir)
    elif archive_path.suffix in (".tar", ".tgz", ".gz"):
        with tarfile.open(archive_path) as t:
            t.extractall(dest_dir)
    else:
        raise ValueError(f"Unknown archive type {archive_path}")


def download_with_progress(url: str, dest: Path) -> Path:
    import urllib.request

    dest.parent.mkdir(parents=True, exist_ok=True)
    overwatch.info(f"Downloading {url} -> {dest}")
    urllib.request.urlretrieve(url, dest)
    return dest


def download_extract(dataset_id: str, root_dir: Path) -> None:
    """Fetch + extract all components of `dataset_id` under root_dir/download."""
    if dataset_id not in DATASET_COMPONENTS:
        raise KeyError(f"Unknown dataset `{dataset_id}`; have {sorted(DATASET_COMPONENTS)}")
    target = Path(root_dir) / "download" / dataset_id
    target.mkdir(parents=True, exist_ok=True)
    for comp in DATASET_COMPONENTS[dataset_id]:
        dest = target / Path(comp["url"]).name
        if not dest.exists() and not (target / comp["name"]).exists():
            download_with_progress(comp["url"], dest)
        if comp["extract"] and dest.exists():
            extract_archive(dest, target)
            dest.unlink()
        if comp["do_rename"] and dest.exists() and dest.name != comp["name"]:
            final = target / comp["name"]
            final.parent.mkdir(parents=True, exist_ok=True)
            shutil.move(str(dest), str(final))


def convert_to_jpg(images_dir: Path) -> None:
    """Normalize mixed .png/.gif OCR-VQA images to .jpg (reference behavior)."""
    from PIL import Image

    images_dir = Path(images_dir)
    for p in list(images_dir.iterdir()):
        if p.suffix.lower() in (".png", ".gif"):
            im = Image.open(p).convert("RGB")
            im.save(p.with_suffix(".jpg"))
