"""End-to-end `scripts/run_libero_eval.main` against a scripted mock LIBERO.

The reference eval scripts (run_libero_eval_object.py / _spatial.py) can only
be exercised with LIBERO + mujoco + the `detection` oracle package installed.
This test injects minimal in-process fakes for both external packages and
drives the REAL eval entrypoint — settle steps, speculative control loop,
capture, post-success continuation, episode flush, reference-schema .pt
export, video writer, and the eval.log format — on the tiny model, then
checks the artifacts feed the probe pipeline (logs parser + episode loader).

What the fakes replace is exactly the external boundary (SURVEY §2.3):
`libero.libero.benchmark` / `OffScreenRenderEnv` and
`detection.object_detectors`. Everything else is the shipping code path.
"""

import json
import sys
import types

import numpy as np
import pytest

import jax

from openvla_probe_tpu.models import catalog
from openvla_probe_tpu.probe import episodes as ep_mod
from openvla_probe_tpu.probe import logs as logs_mod

VIS_ID = "dinosiglip-tiny-28px"
LLM_ID = "llama-tiny"
ARCH = "no-align+fused-gelu-mlp"

# object-suite label vocabularies (reference key files)
K_REL, K_ACT = 461, 20


# ---------------------------------------------------------------------------
# fakes for the two external packages
# ---------------------------------------------------------------------------

class _FakeTask:
    """Mirrors the fields get_libero_env reads off a LIBERO task."""

    language = "pick up the alphabet soup and place it in the basket"
    problem_folder = "libero_object"
    bddl_file = "task0.bddl"


class _FakeSuite:
    n_tasks = 1

    def get_task(self, task_id):
        assert task_id == 0
        return _FakeTask()

    def get_task_init_states(self, task_id):
        # init state encodes the step at which the episode succeeds
        # (0 => never): trial 0 succeeds after 2 action steps, trial 1 fails.
        return [np.array([2]), np.array([0])]


class _FakeEnv:
    """Scripted OffScreenRenderEnv twin: deterministic frames, success at the
    step index carried by the init state."""

    def __init__(self, bddl_file_name=None, camera_heights=256, camera_widths=256):
        assert bddl_file_name.endswith("task0.bddl")
        self.res = (camera_heights, camera_widths)
        self._succeed_at = 0
        self._t = 0

    def seed(self, s):
        self._seed = s

    def reset(self):
        self._t = 0

    def set_init_state(self, state):
        self._succeed_at = int(np.asarray(state).ravel()[0])
        self._t = 0
        return self._obs()

    def _obs(self):
        g = np.random.default_rng(self._t)
        img = g.integers(0, 256, (*self.res, 3), dtype=np.uint8)
        return {"agentview_image": img}

    def step(self, action):
        assert len(action) == 7
        self._t += 1
        done = self._succeed_at > 0 and self._t >= self._succeed_at + NUM_WAIT
        return self._obs(), 0.0, done, {}


class _FakeDetector:
    def __init__(self, k):
        self.k, self.t = k, 0

    def detect_binary_states(self):
        self.t += 1
        g = np.random.default_rng(self.t)
        out = g.integers(0, 2, self.k).astype(np.int8)
        out[0] = -1  # exercise the "unknown" label value
        return out


NUM_WAIT = 1


class _FakeTok:
    """Deterministic stand-in for the checkpoint tokenizer (native run dirs
    ship none; the loader warns and leaves it to the caller)."""

    def encode(self, s):
        return [1] + [(11 + 7 * i) % 400 for i in range(len(s.split()))]


def _install_fakes(monkeypatch, tmp_path):
    from openvla_probe_tpu.models import load as load_mod

    monkeypatch.setattr(load_mod, "_tokenizer_for", lambda path, bundle: _FakeTok())
    libero_pkg = types.ModuleType("libero")
    libero_mod = types.ModuleType("libero.libero")
    envs_mod = types.ModuleType("libero.libero.envs")
    bench_mod = types.ModuleType("libero.libero.benchmark")
    bench_mod.get_benchmark_dict = lambda: {"libero_object": _FakeSuite}
    libero_mod.benchmark = bench_mod
    libero_mod.get_libero_path = lambda kind: str(tmp_path / kind)
    envs_mod.OffScreenRenderEnv = _FakeEnv
    libero_pkg.libero = libero_mod
    det_mod = types.ModuleType("detection")
    det_mod.object_detectors = types.SimpleNamespace(
        for_task=lambda env, rel, act: _FakeDetector(len(rel) + len(act)))
    det_mod.action_detectors = types.SimpleNamespace()
    for name, mod in {
        "libero": libero_pkg, "libero.libero": libero_mod,
        "libero.libero.envs": envs_mod, "libero.libero.benchmark": bench_mod,
        "detection": det_mod,
    }.items():
        monkeypatch.setitem(sys.modules, name, mod)


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    """HF-layout tiny checkpoint dir with libero_object stats for unnorm."""
    cfg, img_cfg, _ = catalog.build_vlm_config(VIS_ID, LLM_ID, ARCH, "resize-naive")
    from openvla_probe_tpu.models import vlm

    params = vlm.init_params(cfg, jax.random.key(0))
    run = tmp_path_factory.mktemp("libero_ckpt")
    (run / "checkpoints").mkdir()
    import torch

    from tests.test_hub_load import _native_state_from_params

    torch.save({"model": _native_state_from_params(params, cfg)},
               run / "checkpoints" / "latest-checkpoint.pt")
    (run / "config.json").write_text(json.dumps({"model": {
        "model_id": "tiny-libero",
        "vision_backbone_id": VIS_ID,
        "llm_backbone_id": LLM_ID,
        "arch_specifier": ARCH,
        "image_resize_strategy": "resize-naive",
    }}))
    (run / "dataset_statistics.json").write_text(json.dumps({
        "libero_object": {"action": {
            "q01": [-1.0] * 7, "q99": [1.0] * 7,
            "mask": [True] * 6 + [False],
        }}
    }))
    return run


def test_run_libero_eval_main_e2e(tiny_ckpt, tmp_path, monkeypatch):
    _install_fakes(monkeypatch, tmp_path)
    from scripts import run_libero_eval as rle

    cfg = rle.GenerateConfig(
        pretrained_checkpoint=str(tiny_ckpt),
        task_suite_name="libero_object",
        num_steps_wait=NUM_WAIT,
        num_trials_per_task=2,
        post_success_steps=2,
        max_steps=4,
        run_root_dir=str(tmp_path / "logs"),
        save_videos=True,
        export_pt=True,
        speculative_decode=True,
    )
    rle.main(cfg)

    run_dir = tmp_path / "logs" / "libero_object"

    # --- eval.log: format consumed by probe.logs (parse_libero_log twin)
    records = logs_mod.parse_eval_log((run_dir / "eval.log").read_text())
    assert [r["episode"] for r in records] == [0, 1]
    assert [r["success"] for r in records] == [True, False]
    summary = logs_mod.per_task_summary(records)
    assert summary[-1]["success_rate"] == 0.5

    # --- episode artifacts: trial 0 = 2 control steps + 2 post-success
    #     capture-only steps; trial 1 = max_steps failures
    eps = ep_mod.list_episodes(run_dir)
    assert [ep_mod.episode_index(p) for p in eps if p.suffix == ".npz"] == [0, 1]
    ep0 = ep_mod.load_episode(run_dir / "episode_0.npz")
    ep1 = ep_mod.load_episode(run_dir / "episode_1.npz")
    hid = ep0["visual_semantic_encoding"]          # [L+1, T, D]
    assert hid.ndim == 3 and hid.shape[1] == 2 + 2
    assert ep1["visual_semantic_encoding"].shape[1] == 4
    assert bool(ep0["success"]) and not bool(ep1["success"])
    assert ep0["symbolic_state_object_relations"].shape == (4, K_REL)
    assert ep0["symbolic_state_action_subgoals"].shape == (4, K_ACT)
    assert set(np.unique(ep0["symbolic_state_object_relations"])) <= {-1, 0, 1}

    # --- reference-schema .pt export sits next to each .npz and round-trips
    ep0_pt = ep_mod.load_episode(run_dir / "episode_0.pt")
    np.testing.assert_allclose(
        np.asarray(ep0_pt["visual_semantic_encoding"], np.float32),
        np.asarray(hid, np.float32), rtol=0, atol=0)

    # --- video artifacts (mp4 via imageio, else .npz frame dump)
    vids = [p for p in run_dir.iterdir()
            if "--rollout--" in p.name and p.suffix in (".mp4", ".npz")]
    assert len(vids) == 2
    assert sum("--success" in v.name for v in vids) == 1

    # --- captured hiddens feed the probe trainer (1 layer, tiny budget)
    from openvla_probe_tpu.probe.train_probes import ProbeTrainConfig, train_probes

    res = train_probes(run_dir, ProbeTrainConfig(epochs=2, batch_size=64),
                       layers=(0,))
    assert res["bank"].w.shape[0] == 1 and res["records"]
