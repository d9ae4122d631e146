"""BridgeData V2 / WidowX real-robot evaluation plumbing.

Behavioral re-implementation of experiments/robot/bridge/ (widowx_env.py:17-50
gym wrapper over WidowXClient, bridgev2_utils.py:24-41 env/obs helpers).
Hardware access requires the external `widowx_envs` package; everything here
degrades to clear errors without it.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional, Tuple

import numpy as np

# Bridge eval constants (bridgev2_utils defaults)
BRIDGE_PROPRIO_DIM = 7
WIDOWX_DEFAULT_HOST = "localhost"
WIDOWX_DEFAULT_PORT = 5556


def get_widowx_env_params(cfg: Any) -> Dict[str, Any]:
    """Default WidowX environment parameters (bridgev2_utils.py:24-41)."""
    return {
        "camera_topics": [{"name": "/blue/image_raw"}],
        "override_workspace_boundaries": [
            [0.1, -0.20, -0.01, -1.57, 0],
            [0.45, 0.25, 0.30, 1.57, 0],
        ],
        "move_duration": 0.2,
        "fix_zangle": 0.1,
        "return_full_image": True,
    }


class WidowXGym:
    """Gym-style wrapper over a WidowXClient (widowx_env.py:17-50)."""

    def __init__(
        self,
        widowx_client: Any,
        im_size: int = 256,
        blocking: bool = True,
        sticky_gripper_num_steps: int = 1,
    ) -> None:
        self.widowx_client = widowx_client
        self.im_size = im_size
        self.blocking = blocking
        self.sticky_gripper_num_steps = sticky_gripper_num_steps
        self.is_gripper_closed = False
        self.num_consecutive_gripper_change_actions = 0

    def step(self, action: np.ndarray) -> Tuple[Dict[str, Any], float, bool, Dict]:
        # sticky gripper: require N consecutive flip commands before toggling
        if (action[-1] < 0.5) != self.is_gripper_closed:
            self.num_consecutive_gripper_change_actions += 1
        else:
            self.num_consecutive_gripper_change_actions = 0
        if self.num_consecutive_gripper_change_actions >= self.sticky_gripper_num_steps:
            self.is_gripper_closed = not self.is_gripper_closed
            self.num_consecutive_gripper_change_actions = 0
        action = np.asarray(action, np.float64).copy()
        action[-1] = 0.0 if self.is_gripper_closed else 1.0
        self.widowx_client.step_action(action, blocking=self.blocking)
        obs = self._get_obs()
        return obs, 0.0, False, {}

    def reset(self) -> Dict[str, Any]:
        self.widowx_client.reset()
        self.is_gripper_closed = False
        self.num_consecutive_gripper_change_actions = 0
        return self._get_obs()

    def _get_obs(self) -> Dict[str, Any]:
        raw = None
        while raw is None:
            raw = self.widowx_client.get_observation()
            if raw is None:
                time.sleep(0.05)
        image = raw["full_image"]
        return {
            "full_image": image,
            "image_primary": image,
            "proprio": raw.get("state", np.zeros(BRIDGE_PROPRIO_DIM)),
        }


def get_widowx_env(cfg: Any, model: Any = None) -> WidowXGym:
    """Connect to the WidowX control server (requires `widowx_envs`)."""
    try:
        from widowx_envs.widowx_env_service import WidowXClient, WidowXConfigs
    except ImportError as e:
        raise ImportError(
            "widowx_envs is not installed; real-robot Bridge eval needs the "
            "BridgeData WidowX controller stack"
        ) from e
    env_params = WidowXConfigs.DefaultEnvParams.copy()
    env_params.update(get_widowx_env_params(cfg))
    host = getattr(cfg, "host_ip", WIDOWX_DEFAULT_HOST)
    port = getattr(cfg, "port", WIDOWX_DEFAULT_PORT)
    client = WidowXClient(host=host, port=port)
    client.init(env_params)
    return WidowXGym(
        client,
        im_size=getattr(cfg, "im_size", 256),
        blocking=getattr(cfg, "blocking", True),
        sticky_gripper_num_steps=getattr(cfg, "sticky_gripper_num_steps", 1),
    )


def get_next_task_label(task_label: str) -> str:
    """Interactive task-label prompt (run_bridgev2_eval.py flow)."""
    if task_label:
        user = input(f"Enter task label (hit enter for `{task_label}`): ").strip()
        return user or task_label
    label = ""
    while not label:
        label = input("Enter task label: ").strip()
    return label


def refresh_obs(obs: Dict[str, Any], env: WidowXGym) -> Dict[str, Any]:
    new_obs = env._get_obs()
    obs.update(new_obs)
    return obs
