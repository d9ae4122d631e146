#!/usr/bin/env python
"""Regenerate LIBERO HDF5 datasets by replaying demos (no-op + failure filtered).

Behavioral re-implementation of
experiments/robot/libero/regenerate_libero_dataset.py: replay each raw demo
through the simulator at 256px, drop transitions whose action is a no-op
(near-zero deltas AND unchanged gripper command), keep only successful
replays, write new HDF5s + a metainfo JSON. Feeds the `libero_*_no_noops`
RLDS conversions.

Requires the external LIBERO package + h5py.
"""

from __future__ import annotations

import json
import sys
from dataclasses import dataclass
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

import numpy as np

from openvla_probe_tpu.conf.registry import parse_config
from openvla_probe_tpu.overwatch import initialize_overwatch

overwatch = initialize_overwatch(__name__)

IMAGE_RESOLUTION = 256


@dataclass(frozen=True)
class RegenConfig:
    libero_task_suite: str = "libero_spatial"
    libero_raw_data_dir: str = ""
    libero_target_dir: str = ""


def is_noop(action, prev_action=None, threshold: float = 1e-4) -> bool:
    """No-op = near-zero non-gripper deltas AND unchanged gripper command.
    First-step actions only need criterion (1) against the gripper's rest."""
    action = np.asarray(action)
    if prev_action is None:
        return bool(np.linalg.norm(action[:-1]) < threshold)
    prev_action = np.asarray(prev_action)
    return bool(
        np.linalg.norm(action[:-1]) < threshold and action[-1] == prev_action[-1]
    )


def main(cfg: RegenConfig) -> None:
    import h5py

    from openvla_probe_tpu.robot.libero_utils import get_libero_dummy_action, get_libero_env

    try:
        from libero.libero import benchmark
    except ImportError as e:
        raise SystemExit(f"LIBERO not installed: {e}")

    assert cfg.libero_raw_data_dir and cfg.libero_target_dir
    target = Path(cfg.libero_target_dir)
    target.mkdir(parents=True, exist_ok=True)
    suite = benchmark.get_benchmark_dict()[cfg.libero_task_suite]()

    metainfo: dict = {}
    num_replays = num_success = num_noops = 0
    for task_id in range(suite.n_tasks):
        task = suite.get_task(task_id)
        env, _ = get_libero_env(task, resolution=IMAGE_RESOLUTION)
        raw_path = Path(cfg.libero_raw_data_dir) / f"{task.name}_demo.hdf5"
        if not raw_path.exists():
            overwatch.warning(f"Missing raw file {raw_path}; skipping task")
            continue
        out_path = target / raw_path.name
        with h5py.File(raw_path, "r") as fin, h5py.File(out_path, "w") as fout:
            grp = fout.create_group("data")
            for demo_key in fin["data"]:
                demo = fin[f"data/{demo_key}"]
                actions = np.asarray(demo["actions"])
                init_state = np.asarray(demo["states"])[0]
                env.reset()
                obs = env.set_init_state(init_state)
                for _ in range(10):
                    obs, *_ = env.step(get_libero_dummy_action())
                states, images, kept_actions = [], [], []
                prev_action, done = None, False
                for action in actions:
                    if is_noop(action, prev_action):
                        num_noops += 1
                        prev_action = action
                        continue
                    states.append(env.get_sim_state() if hasattr(env, "get_sim_state")
                                  else np.zeros(1))
                    images.append(obs["agentview_image"])
                    kept_actions.append(action)
                    obs, _, done, _ = env.step(action.tolist())
                    prev_action = action
                num_replays += 1
                ep_key = f"task{task_id}_{demo_key}"
                metainfo.setdefault(task.name, {})[ep_key] = {
                    "success": bool(done),
                    "initial_state": init_state.tolist(),
                }
                if done:
                    num_success += 1
                    d = grp.create_group(demo_key)
                    d.create_dataset("actions", data=np.stack(kept_actions))
                    d.create_dataset("states", data=np.stack(states))
                    d.create_dataset("obs/agentview_rgb", data=np.stack(images))
                overwatch.info(
                    f"replayed {num_replays} (success {num_success}, "
                    f"noops filtered {num_noops})"
                )
        env.close()
    with open(target / "metainfo.json", "w") as f:
        json.dump(metainfo, f, indent=2)
    overwatch.info(f"Done: {num_success}/{num_replays} successful replays -> {target}")


if __name__ == "__main__":
    main(parse_config(RegenConfig))
