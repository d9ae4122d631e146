"""Named Open-X dataset mixtures (name -> [(dataset, sampling weight)]).

Weights live in `mixtures.json` — extracted from the reference registry
(prismatic/vla/datasets/rlds/oxe/mixtures.py:11-210; the 18 named mixtures
incl. bridge, rtx, oxe_magic_soup(_plus/_minus), tdroid_*, libero_*_no_noops
are published experiment facts, ported verbatim per SURVEY.md §2).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Tuple

_DATA_PATH = Path(__file__).parent / "mixtures.json"

with open(_DATA_PATH) as f:
    _raw = json.load(f)

OXE_NAMED_MIXTURES: Dict[str, List[Tuple[str, float]]] = {
    name: [tuple(pair) for pair in pairs] for name, pairs in _raw.items()
}
