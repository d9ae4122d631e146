#!/usr/bin/env python
"""Interactive BridgeData V2 real-robot evaluation loop (WidowX).

Equivalent of the reference's experiments/robot/bridge/run_bridgev2_eval.py:
connect to the WidowX control server, loop {task label -> rollout -> y/n},
with the sticky-gripper wrapper and the train-matched preprocessing path.
Requires the external `widowx_envs` stack.
"""

from __future__ import annotations

import sys
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from openvla_probe_tpu.utils.platform import apply_platform_env

apply_platform_env()
from openvla_probe_tpu.conf.registry import parse_config
from openvla_probe_tpu.overwatch import initialize_overwatch

overwatch = initialize_overwatch(__name__)


@dataclass(frozen=True)
class BridgeEvalConfig:
    model_family: str = "openvla"
    pretrained_checkpoint: str = ""
    unnorm_key: Optional[str] = "bridge_orig"
    center_crop: bool = False

    host_ip: str = "localhost"
    port: int = 5556
    im_size: int = 256
    blocking: bool = True
    sticky_gripper_num_steps: int = 1
    max_episodes: int = 50
    max_steps: int = 60
    control_frequency: float = 5.0
    load_in_8bit: bool = False


def main(cfg: BridgeEvalConfig) -> None:
    import numpy as np

    from openvla_probe_tpu.robot import bridge_utils, robot_utils
    from openvla_probe_tpu.robot.robot_utils import get_action, get_model

    assert cfg.pretrained_checkpoint, "--pretrained_checkpoint is required"
    model = get_model(cfg)
    env = bridge_utils.get_widowx_env(cfg, model)

    task_label = ""
    episodes, successes = 0, 0
    while episodes < cfg.max_episodes:
        task_label = bridge_utils.get_next_task_label(task_label)
        obs = env.reset()
        t_step = 1.0 / cfg.control_frequency
        for t in range(cfg.max_steps):
            start = time.time()
            obs = bridge_utils.refresh_obs(obs, env)
            out = get_action(cfg, model, obs, task_label)
            action = robot_utils.normalize_gripper_action(out["actions"], binarize=True)
            obs, _, _, _ = env.step(action)
            elapsed = time.time() - start
            if elapsed < t_step:
                time.sleep(t_step - elapsed)
        episodes += 1
        ok = input("Success? (y/n): ").strip().lower().startswith("y")
        successes += int(ok)
        overwatch.info(f"{successes}/{episodes} successes")
    overwatch.info(f"FINAL: {successes}/{episodes} = {successes/max(episodes,1):.3f}")


if __name__ == "__main__":
    main(parse_config(BridgeEvalConfig))
