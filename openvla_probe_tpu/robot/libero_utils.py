"""LIBERO simulation helpers: env construction, train-matched image pipeline.

Behavioral re-implementation of experiments/robot/libero/libero_utils.py:
the exact eval-time image path (180° rotation -> JPEG encode/decode cycle ->
lanczos3 antialiased resize to 224) that mirrors the RLDS training data
generation, plus env plumbing (gated on the external LIBERO package), rollout
video writing, and quat->axis-angle.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import numpy as np


def get_libero_env(task: Any, model_family: str = "openvla", resolution: int = 256):
    """OffScreenRenderEnv at `resolution`, seeded 0 (reference :18-25).
    Requires the external LIBERO package."""
    try:
        from libero.libero import get_libero_path
        from libero.libero.envs import OffScreenRenderEnv
    except ImportError as e:
        raise ImportError(
            "LIBERO is not installed in this environment; install "
            "Lifelong-Robot-Learning/LIBERO to run simulation rollouts"
        ) from e
    task_description = task.language
    bddl = os.path.join(get_libero_path("bddl_files"), task.problem_folder, task.bddl_file)
    env = OffScreenRenderEnv(bddl_file_name=bddl, camera_heights=resolution, camera_widths=resolution)
    env.seed(0)  # IMPORTANT: affects object positions even under fixed init states
    return env, task_description


def get_libero_dummy_action(model_family: str = "openvla"):
    """No-op action to settle objects at episode start (reference :28-30)."""
    return [0, 0, 0, 0, 0, 0, -1]


def resize_image(img: np.ndarray, resize_size: Tuple[int, int]) -> np.ndarray:
    """Train-matched resize: JPEG encode/decode cycle + lanczos3 antialias
    (reference :33-47 — must match the RLDS data-generation pipeline)."""
    import tensorflow as tf

    img_t = tf.convert_to_tensor(img)
    img_t = tf.image.encode_jpeg(img_t)
    img_t = tf.io.decode_image(img_t, expand_animations=False, dtype=tf.uint8)
    img_t = tf.image.resize(img_t, resize_size, method="lanczos3", antialias=True)
    img_t = tf.cast(tf.clip_by_value(tf.round(img_t), 0, 255), tf.uint8)
    return img_t.numpy()


def get_libero_image(obs: Dict[str, Any], resize_size: int = 224) -> np.ndarray:
    """Agent-view image -> eval frame: rotate 180° then train-matched resize
    (reference :50-58)."""
    img = obs["agentview_image"]
    img = img[::-1, ::-1]
    return resize_image(img, (resize_size, resize_size))


def save_rollout_video(rollout_images, idx: int, success: bool, task_description: str,
                       out_dir: str = "./rollouts", log_file=None) -> Path:
    """MP4 writer for episode replays (reference :61-74). Uses imageio when
    present; falls back to an .npz frame dump."""
    Path(out_dir).mkdir(parents=True, exist_ok=True)
    tag = "success" if success else "failure"
    # timestamp + task slug in the name (reference embeds DATE_TIME + task,
    # libero_utils.py:61-74) — otherwise reruns silently overwrite replays
    import re
    import time as _time

    stamp = _time.strftime("%Y_%m_%d-%H_%M_%S")
    slug = re.sub(r"[^a-z0-9]+", "_", task_description.lower())[:60].strip("_")
    base = Path(out_dir) / f"{stamp}--rollout--episode={idx}--task={slug}--{tag}"
    try:
        import imageio

        path = base.with_suffix(".mp4")
        writer = imageio.get_writer(path, fps=30)
        for img in rollout_images:
            writer.append_data(img)
        writer.close()
    except Exception:
        # imageio absent OR its ffmpeg backend missing (get_writer raises
        # ValueError, not ImportError) — never lose the rollout over a codec
        base.with_suffix(".mp4").unlink(missing_ok=True)  # drop partial file
        path = base.with_suffix(".npz")
        np.savez_compressed(path, frames=np.stack(rollout_images))
    if log_file is not None:
        log_file.write(f"Saved rollout video at {path}\n")
    return path


def quat2axisangle(quat: np.ndarray) -> np.ndarray:
    """(x, y, z, w) quaternion -> axis-angle (reference :77-101)."""
    quat = np.asarray(quat, np.float64).copy()
    if quat[3] > 1.0:
        quat[3] = 1.0
    elif quat[3] < -1.0:
        quat[3] = -1.0
    den = np.sqrt(1.0 - quat[3] * quat[3])
    if np.isclose(den, 0.0):
        return np.zeros(3)
    return (quat[:3] * 2.0 * np.arccos(quat[3])) / den
