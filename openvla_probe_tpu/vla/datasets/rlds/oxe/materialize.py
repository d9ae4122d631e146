"""Assemble per-dataset kwargs + weights for a named OXE mixture.

Behavioral re-implementation of prismatic/vla/datasets/rlds/oxe/materialize.py
(:21-131): EEF_POS/EEF_R6-only gate, absolute-action and normalization masks
(gripper dim is absolute / un-normalized), camera-view filtering, language key
wiring, standardization-transform lookup. Datasets that fail the gate are
skipped with a warning so partial mixtures still build.
"""

from __future__ import annotations

from copy import deepcopy
from pathlib import Path
from typing import Any, Dict, List, Sequence, Tuple, Union

import tensorflow as tf

from .....overwatch import initialize_overwatch
from ....norm_stats import NormalizationType
from .configs import ActionEncoding, OXE_DATASET_CONFIGS
from .transforms import OXE_STANDARDIZATION_TRANSFORMS

overwatch = initialize_overwatch(__name__)

# DROID: transitions with an all-(normalized-)zero action are filtered
# (reference oxe/utils/droid_utils.py:151-172)
_DROID_Q01 = [-0.7776297926902771, -0.5803514122962952, -0.5795090794563293,
              -0.6464047729969025, -0.7041108310222626, -0.8895104378461838]
_DROID_Q99 = [0.7597932070493698, 0.5726242214441299, 0.7351000607013702,
              0.6705610305070877, 0.6464948207139969, 0.8897542208433151]


def zero_action_filter(traj: Dict[str, Any]) -> tf.Tensor:
    """Keep only trajectories whose action differs from normalized zero."""
    q01 = tf.constant(_DROID_Q01, tf.float32)
    q99 = tf.constant(_DROID_Q99, tf.float32)
    norm_zero = tf.clip_by_value(2.0 * (0.0 - q01) / (q99 - q01 + 1e-8) - 1.0, -1.0, 1.0)
    return tf.reduce_any(tf.math.abs(traj["action"][:, :6] - norm_zero) > 1e-5)


def make_oxe_dataset_kwargs(
    dataset_name: str,
    data_root_dir: Union[str, Path],
    load_camera_views: Sequence[str] = ("primary",),
    load_depth: bool = False,
    load_proprio: bool = True,
    load_language: bool = True,
    action_proprio_normalization_type: NormalizationType = NormalizationType.BOUNDS_Q99,
) -> Dict[str, Any]:
    cfg = deepcopy(OXE_DATASET_CONFIGS[dataset_name])
    enc = cfg["action_encoding"]
    if enc not in (ActionEncoding.EEF_POS, ActionEncoding.EEF_R6):
        raise ValueError(f"Cannot load `{dataset_name}`; only EEF_POS & EEF_R6 actions supported!")

    # gripper (last dim) is absolute and NOT normalized; rotation R6 widens to 9
    n_rel = 6 if enc is ActionEncoding.EEF_POS else 9
    kwargs: Dict[str, Any] = {
        "absolute_action_mask": [False] * n_rel + [True],
        "action_normalization_mask": [True] * n_rel + [False],
        "action_proprio_normalization_type": action_proprio_normalization_type,
    }

    missing = set(load_camera_views) - set(cfg["image_obs_keys"])
    if missing:
        raise ValueError(f"Cannot load `{dataset_name}`; missing camera views `{missing}`")
    kwargs["image_obs_keys"] = {
        k: v for k, v in cfg["image_obs_keys"].items() if k in load_camera_views
    }
    if load_depth:
        kwargs["depth_obs_keys"] = {
            k: v for k, v in cfg["depth_obs_keys"].items() if k in load_camera_views
        }
    if load_proprio:
        kwargs["state_obs_keys"] = cfg["state_obs_keys"]
    if load_language:
        kwargs["language_key"] = "language_instruction"
    kwargs["standardize_fn"] = OXE_STANDARDIZATION_TRANSFORMS[dataset_name]
    def _resolve_fns(v):
        if v == "<fn:zero_action_filter>":
            return zero_action_filter
        if isinstance(v, dict):
            return {k2: _resolve_fns(v2) for k2, v2 in v.items()}
        return v

    for k, v in cfg.get("aux_kwargs", {}).items():
        kwargs[k] = _resolve_fns(v)
    return {"name": dataset_name, "data_dir": str(data_root_dir), **kwargs}


def get_oxe_dataset_kwargs_and_weights(
    data_root_dir: Union[str, Path],
    mixture_spec: List[Tuple[str, float]],
    load_camera_views: Sequence[str] = ("primary",),
    load_depth: bool = False,
    load_proprio: bool = True,
    load_language: bool = True,
    action_proprio_normalization_type: NormalizationType = NormalizationType.BOUNDS_Q99,
) -> Tuple[List[Dict[str, Any]], List[float]]:
    """Mixture spec -> (per-dataset kwargs for make_interleaved_dataset, weights)."""
    seen, filtered = set(), []
    for name, weight in mixture_spec:
        if name in seen:
            overwatch.warning(f"Skipping duplicate dataset: `{(name, weight)}`")
            continue
        seen.add(name)
        filtered.append((name, weight))

    per_dataset_kwargs, weights = [], []
    for name, weight in filtered:
        try:
            per_dataset_kwargs.append(
                make_oxe_dataset_kwargs(
                    name, data_root_dir, load_camera_views, load_depth,
                    load_proprio, load_language, action_proprio_normalization_type,
                )
            )
            weights.append(weight)
        except ValueError as e:
            overwatch.warning(f"Skipping `{name}` due to error: {e}")
    return per_dataset_kwargs, weights
