"""End-to-end `scripts/run_bridgev2_eval.main` against a scripted WidowX.

Same pattern as tests/test_libero_eval_e2e.py: fake only the external
boundary (`widowx_envs.widowx_env_service`) and the operator's stdin, then
drive the REAL interactive eval loop — env connect, task-label prompt,
sticky-gripper wrapper, train-matched obs refresh, control-rate pacing,
success bookkeeping — on the tiny model.

Reference: experiments/robot/bridge/run_bridgev2_eval.py +
widowx_env.py:17-50 (the gym wrapper this repo re-implements in
robot/bridge_utils.py).
"""

import builtins
import json
import sys
import types

import numpy as np
import pytest

import jax

from openvla_probe_tpu.models import catalog
from openvla_probe_tpu.robot.bridge_utils import WidowXGym

VIS_ID = "dinosiglip-tiny-28px"
LLM_ID = "llama-tiny"
ARCH = "no-align+fused-gelu-mlp"


class _FakeWidowXClient:
    """Records every commanded action; serves deterministic observations."""

    def __init__(self, host="localhost", port=5556):
        self.host, self.port = host, port
        self.inited_with = None
        self.actions = []
        self.resets = 0
        self._t = 0
        self._obs_calls = 0

    def init(self, env_params):
        self.inited_with = env_params

    def reset(self):
        self.resets += 1
        self._t = 0

    def step_action(self, action, blocking=True):
        self.actions.append((np.asarray(action, np.float64), blocking))
        self._t += 1

    def get_observation(self):
        self._obs_calls += 1
        if self._obs_calls == 1:
            return None  # exercise the retry-until-frame loop once
        g = np.random.default_rng(self._t)
        return {
            "full_image": g.integers(0, 256, (256, 256, 3), dtype=np.uint8),
            "state": np.arange(7, dtype=np.float64),
        }


@pytest.fixture(scope="module")
def tiny_bridge_ckpt(tmp_path_factory):
    cfg, _, _ = catalog.build_vlm_config(VIS_ID, LLM_ID, ARCH, "resize-naive")
    from openvla_probe_tpu.models import vlm

    params = vlm.init_params(cfg, jax.random.key(1))
    run = tmp_path_factory.mktemp("bridge_ckpt")
    (run / "checkpoints").mkdir()
    import torch

    from tests.test_hub_load import _native_state_from_params

    torch.save({"model": _native_state_from_params(params, cfg)},
               run / "checkpoints" / "latest-checkpoint.pt")
    (run / "config.json").write_text(json.dumps({"model": {
        "model_id": "tiny-bridge",
        "vision_backbone_id": VIS_ID,
        "llm_backbone_id": LLM_ID,
        "arch_specifier": ARCH,
        "image_resize_strategy": "resize-naive",
    }}))
    (run / "dataset_statistics.json").write_text(json.dumps({
        "bridge_orig": {"action": {
            "q01": [-1.0] * 7, "q99": [1.0] * 7,
            "mask": [True] * 6 + [False],
        }}
    }))
    return run


class _FakeTok:
    def encode(self, s):
        return [1] + [(11 + 7 * i) % 400 for i in range(len(s.split()))]


def test_run_bridgev2_eval_main_e2e(tiny_bridge_ckpt, monkeypatch):
    from openvla_probe_tpu.models import load as load_mod

    monkeypatch.setattr(load_mod, "_tokenizer_for", lambda path, bundle: _FakeTok())
    client_box = {}

    def _make_client(host="localhost", port=5556):
        client_box["c"] = _FakeWidowXClient(host, port)
        return client_box["c"]

    svc = types.ModuleType("widowx_envs.widowx_env_service")
    svc.WidowXClient = _make_client
    svc.WidowXConfigs = types.SimpleNamespace(
        DefaultEnvParams={"action_mode": "3trans3rot1grip"})
    pkg = types.ModuleType("widowx_envs")
    pkg.widowx_env_service = svc
    monkeypatch.setitem(sys.modules, "widowx_envs", pkg)
    monkeypatch.setitem(sys.modules, "widowx_envs.widowx_env_service", svc)

    prompts = iter(["put the spoon on the towel", "y"])
    monkeypatch.setattr(builtins, "input", lambda *a: next(prompts))

    from scripts import run_bridgev2_eval as rbe

    cfg = rbe.BridgeEvalConfig(
        pretrained_checkpoint=str(tiny_bridge_ckpt),
        max_episodes=1,
        max_steps=3,
        control_frequency=1000.0,
        sticky_gripper_num_steps=2,
    )
    rbe.main(cfg)

    c = client_box["c"]
    # env_params merged our overrides over the stack defaults
    assert c.inited_with["action_mode"] == "3trans3rot1grip"
    assert c.inited_with["return_full_image"] is True
    assert c.resets == 1
    # one commanded action per control step, 7-DoF, gripper resolved by the
    # sticky wrapper to the {0, 1} absolute convention
    assert len(c.actions) == 3
    for a, blocking in c.actions:
        assert a.shape == (7,) and blocking is True
        assert a[-1] in (0.0, 1.0)


def test_sticky_gripper_requires_consecutive_flips():
    """Unit pin of the sticky-gripper contract (widowx_env.py:26-39): N
    consecutive flip commands toggle the gripper; interruptions reset."""
    c = _FakeWidowXClient()
    c._t = 1  # serve frames immediately
    env = WidowXGym(c, sticky_gripper_num_steps=2)
    env.step(np.array([0, 0, 0, 0, 0, 0, 0.0]))   # flip attempt 1 (close)
    assert not env.is_gripper_closed
    env.step(np.array([0, 0, 0, 0, 0, 0, 1.0]))   # interruption: stay open
    assert not env.is_gripper_closed
    env.step(np.array([0, 0, 0, 0, 0, 0, 0.0]))   # flip attempt 1 again
    env.step(np.array([0, 0, 0, 0, 0, 0, 0.0]))   # flip attempt 2 -> toggles
    assert env.is_gripper_closed
    # commanded absolute gripper reflects the wrapper state, not the policy
    assert [a[-1] for a, _ in c.actions] == [1.0, 1.0, 1.0, 0.0]
