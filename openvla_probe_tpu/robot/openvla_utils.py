"""OpenVLA-specific eval helpers: loading, train-matched preprocessing, action query.

Behavioral re-implementation of experiments/robot/openvla_utils.py — with the
key TPU-native improvement: `get_vla_action(..., return_embeddings=True)`
costs ONE fused prefill (the reference runs a second full forward just for
hidden-state capture, openvla_utils.py:188-203).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

from ..models.load import load_vla
from ..models.vla import OpenVLA
from ..overwatch import initialize_overwatch
from ..vla.norm_stats import load_dataset_statistics

overwatch = initialize_overwatch(__name__)

# constants matching the reference (openvla_utils.py:25-29)
OPENVLA_IMAGE_SIZE = 224


def get_vla(cfg: Any) -> OpenVLA:
    """Load the serving model from cfg.pretrained_checkpoint (local dir)."""
    import dataclasses

    model = load_vla(
        cfg.pretrained_checkpoint,
        quantize_int8=getattr(cfg, "load_in_8bit", False),
    )
    if getattr(cfg, "speculative_decode", False) and model.cfg.tier == "parity":
        # the eval harness makes this trade explicitly and loudly: in parity
        # tier, speculative greedy equality is margin-certified (PARITY_r03
        # trained-weight measurement), not bit-guaranteed — callers wanting
        # the hard bit-equality contract should disable speculative_decode
        # or serve int8 (load_in_8bit=True)
        overwatch.warning(
            "speculative_decode with a bf16 parity-tier model: greedy "
            "equality is margin-certified, not bit-guaranteed; opting in "
            "via speculative_in_parity='allow'")
        model.cfg = dataclasses.replace(model.cfg, speculative_in_parity="allow")
    # optional stats override sidecar next to the checkpoint (reference :60-72)
    sidecar = Path(cfg.pretrained_checkpoint) / "dataset_statistics.json"
    if sidecar.exists():
        model.norm_stats = load_dataset_statistics(sidecar)
    return model


def get_processor(cfg: Any):
    """The fused model owns preprocessing; exposed for API parity."""
    return get_vla(cfg) if isinstance(cfg, (str, Path)) else None


def crop_and_resize(image: np.ndarray, crop_scale: float, batch_size: int = 1) -> np.ndarray:
    """Center crop to `crop_scale` of the AREA then resize back — matches the
    train-time random-crop augmentation at eval (reference :81-124, in TF).

    image: float32 [..., H, W, 3] in [0, 1].
    """
    import tensorflow as tf

    img = tf.convert_to_tensor(image)
    expanded = img.shape.ndims == 3
    if expanded:
        img = img[None]
    new_side = tf.sqrt(crop_scale)
    y0 = x0 = (1.0 - new_side) / 2.0
    boxes = tf.tile(tf.stack([[y0, x0, y0 + new_side, x0 + new_side]]), [tf.shape(img)[0], 1])
    out = tf.image.crop_and_resize(
        img, boxes, tf.range(tf.shape(img)[0]), (OPENVLA_IMAGE_SIZE, OPENVLA_IMAGE_SIZE)
    )
    out = out.numpy()
    return out[0] if expanded else out


def center_crop_image_u8(image: np.ndarray, crop_scale: float = 0.9) -> np.ndarray:
    """uint8 convenience wrapper around crop_and_resize."""
    out = crop_and_resize(image.astype(np.float32) / 255.0, crop_scale)
    return np.clip(np.round(out * 255.0), 0, 255).astype(np.uint8)


def pool_tokens(hidden: np.ndarray, mode: str = "mean") -> np.ndarray:
    """[T, D] -> [D] (reference :126-137; the fused path already pools on
    device — this exists for external feature streams)."""
    if mode == "mean":
        return np.asarray(hidden).mean(axis=-2)
    if mode == "final":
        return np.asarray(hidden)[..., -1, :]
    raise ValueError(f"Unknown pooling mode {mode}")


class SpeculativeActionState:
    """Per-episode draft state for verified speculative serving: the previous
    control step's action tokens are the draft for the next step (robot
    actions change slowly, so acceptance is high and decode collapses toward
    a single prefill — token-exact either way). Reset at episode boundaries."""

    def __init__(self) -> None:
        self.last_tokens: Optional[np.ndarray] = None
        self.accepted_total = 0
        self.steps = 0

    def reset(self) -> None:
        self.last_tokens = None

    def observe(self, out: Dict[str, np.ndarray]) -> None:
        self.last_tokens = np.asarray(out["action_tokens"])
        if "n_accepted" in out:
            self.accepted_total += int(np.asarray(out["n_accepted"]).sum())
        self.steps += 1

    @property
    def acceptance_rate(self) -> float:
        a = self.last_tokens.shape[-1] if self.last_tokens is not None else 1
        return self.accepted_total / max(self.steps * a, 1)


def get_vla_action(
    vla: OpenVLA,
    obs: Dict[str, Any],
    task_label: str,
    unnorm_key: Optional[str] = None,
    center_crop: bool = False,
    return_embeddings: bool = False,
    base_vlm: str = "openvla-7b",
    spec_state: Optional[SpeculativeActionState] = None,
) -> Dict[str, np.ndarray]:
    """One control step: observation image + instruction -> 7-DoF action
    (+ optional 33-layer pooled hidden states, same prefill). v01 base models
    use the chat-style prompt (reference openvla_utils.py:178-183).

    Pass a `SpeculativeActionState` to run verified speculative decode across
    the control loop (greedy tokens identical; latency drops with acceptance)."""
    image = np.asarray(obs["full_image"])
    if center_crop:
        image = center_crop_image_u8(image, crop_scale=0.9)
    if "v01" in base_vlm:
        prompt = (
            "USER: What action should the robot take to "
            f"{task_label.lower()}? ASSISTANT:"
        )
    else:
        prompt = f"In: What action should the robot take to {task_label.lower()}?\nOut:"
    draft = spec_state.last_tokens if spec_state is not None else None
    out = vla.predict_action(
        image, prompt, unnorm_key=unnorm_key,
        return_hidden_states=return_embeddings,
        draft_tokens=draft,
    )
    if spec_state is not None:
        spec_state.observe(out)
    return out
