"""Open-X Embodiment dataset registry: 70 dataset configurations as data.

The per-dataset facts (camera keys, state keys, encoding schemes) live in
`dataset_configs.json` — extracted from the reference registry
(prismatic/vla/datasets/rlds/oxe/configs.py:33-673; camera/state key names and
encodings are properties of the public OXE datasets, ported verbatim per
SURVEY.md §2). This module defines the encodings and the typed accessors.
"""

from __future__ import annotations

import json
from enum import IntEnum
from pathlib import Path
from typing import Any, Dict

_DATA_PATH = Path(__file__).parent / "dataset_configs.json"


class StateEncoding(IntEnum):
    NONE = -1          # no proprioceptive state
    POS_EULER = 1      # EEF XYZ (3) + RPY (3) + <PAD> (1) + gripper (1)
    POS_QUAT = 2       # EEF XYZ (3) + quaternion (4) + gripper (1)
    JOINT = 3          # joint angles (7, padded) + gripper (1)
    JOINT_BIMANUAL = 4 # 2 x [joints (6) + gripper (1)]


class ActionEncoding(IntEnum):
    EEF_POS = 1            # EEF delta XYZ (3) + RPY (3) + gripper (1)
    JOINT_POS = 2          # joint deltas (7) + gripper (1)
    JOINT_POS_BIMANUAL = 3 # 2 x [joint deltas (6) + gripper (1)]
    EEF_R6 = 4             # EEF delta XYZ (3) + R6 rotation (6) + gripper (1)


def _parse_enum(value: str):
    kind, name = value.split(".")
    return {"StateEncoding": StateEncoding, "ActionEncoding": ActionEncoding}[kind][name]


def _load_configs() -> Dict[str, Dict[str, Any]]:
    with open(_DATA_PATH) as f:
        raw = json.load(f)
    out = {}
    for name, cfg in raw.items():
        cfg = dict(cfg)
        cfg["state_encoding"] = _parse_enum(cfg["state_encoding"])
        cfg["action_encoding"] = _parse_enum(cfg["action_encoding"])
        out[name] = cfg
    return out


OXE_DATASET_CONFIGS: Dict[str, Dict[str, Any]] = _load_configs()
