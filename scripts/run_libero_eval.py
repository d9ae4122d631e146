#!/usr/bin/env python
"""LIBERO rollout evaluation with per-layer hidden-state + symbolic-state capture.

Unified equivalent of the reference's run_libero_eval_object.py /
run_libero_eval_spatial.py pair (they differ only in task suite + key files —
here `--task_suite_name` selects both). Per control step the fused serving
path returns the action AND the 33 mean-pooled layer states from ONE prefill
(the reference pays a second full forward, openvla_utils.py:188-203); symbolic
{-1,0,1} state vectors come from the external `detection` package's oracles.

Episode artifacts (`episode_N.npz`: stacked hidden states + label matrices,
reference's episode_N.pt schema) feed openvla_probe_tpu.probe.train_probes.
On success the rollout continues for `post_success_steps` capture-only steps
(reference :64,330-339).

Requires external packages: LIBERO (+ robosuite/mujoco) and `detection`.
"""

from __future__ import annotations

import ast
import sys
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

LABEL_KEY_DIR = REPO_ROOT / "openvla_probe_tpu" / "robot" / "label_keys"
PROBE_LAYERS = list(range(33))


@dataclass(frozen=True)
class GenerateConfig:
    model_family: str = "openvla"
    pretrained_checkpoint: str = ""
    task_suite_name: str = "libero_object"   # libero_object | libero_spatial | libero_goal | libero_10
    center_crop: bool = True
    unnorm_key: Optional[str] = None

    num_steps_wait: int = 10                 # settle steps with dummy actions
    num_trials_per_task: int = 50
    post_success_steps: int = 300
    max_steps: int = 300

    run_root_dir: str = "experiments/logs"
    save_videos: bool = True
    seed: int = 7
    load_in_8bit: bool = False
    speculative_decode: bool = True          # draft = previous step's tokens
                                             # (token-exact; big latency win)
    export_pt: bool = False                  # also write reference-schema
                                             # episode_N.pt next to each .npz
    # optional wandb logging (reference run_libero_eval_object.py:369-403)
    use_wandb: bool = False
    wandb_project: str = "openvla"
    wandb_entity: Optional[str] = None
    run_id_note: Optional[str] = None


def load_label_keys(task_suite_name: str):
    kind = "object" if "object" in task_suite_name else "spatial"
    rel = ast.literal_eval((LABEL_KEY_DIR / f"{kind}_object_relations_keys.txt").read_text())
    act = ast.literal_eval((LABEL_KEY_DIR / f"{kind}_action_states_keys.txt").read_text())
    return rel, act


def main(cfg: GenerateConfig) -> None:
    import numpy as np

    from openvla_probe_tpu.probe.episodes import EpisodeWriter
    from openvla_probe_tpu.robot import libero_utils, robot_utils
    from openvla_probe_tpu.robot.openvla_utils import SpeculativeActionState
    from openvla_probe_tpu.robot.robot_utils import get_action, get_model

    assert cfg.pretrained_checkpoint, "--pretrained_checkpoint is required"
    robot_utils.set_seed_everywhere(cfg.seed)
    rel_keys, act_keys = load_label_keys(cfg.task_suite_name)
    overwatch.info(f"{cfg.task_suite_name}: {len(rel_keys)} relations + {len(act_keys)} action states")

    model = get_model(cfg)

    try:
        from libero.libero import benchmark
    except ImportError as e:
        raise SystemExit(f"LIBERO not installed: {e}")
    try:
        from detection import object_detectors, action_detectors  # external oracle pkg
    except ImportError as e:
        raise SystemExit(
            f"The external `detection` package (symbolic-state oracles) is required: {e}"
        )

    suite = benchmark.get_benchmark_dict()[cfg.task_suite_name]()
    run_dir = Path(cfg.run_root_dir) / cfg.task_suite_name
    run_dir.mkdir(parents=True, exist_ok=True)
    log = open(run_dir / "eval.log", "a")

    wandb_run = None
    if cfg.use_wandb:
        import wandb

        run_id = f"EVAL-{cfg.task_suite_name}-{Path(cfg.pretrained_checkpoint).name}"
        if cfg.run_id_note:
            run_id += f"--{cfg.run_id_note}"
        wandb_run = wandb.init(entity=cfg.wandb_entity, project=cfg.wandb_project,
                               name=run_id)

    writer = EpisodeWriter(run_dir)
    episode_counter, successes, total = 0, 0, 0
    for task_id in range(suite.n_tasks):
        task = suite.get_task(task_id)
        init_states = suite.get_task_init_states(task_id)
        env, task_description = libero_utils.get_libero_env(task, cfg.model_family)
        detector = object_detectors.for_task(env, rel_keys, act_keys)
        task_successes, task_episodes = 0, 0

        for ep in range(cfg.num_trials_per_task):
            env.reset()
            obs = env.set_init_state(init_states[ep % len(init_states)])
            # verified speculative decode across the control loop: previous
            # step's tokens draft the next (token-exact; latency drops with
            # acceptance). Reset at the episode boundary.
            spec_state = SpeculativeActionState() if cfg.speculative_decode else None
            frames = []
            success = False
            t = 0
            while t < cfg.max_steps + cfg.num_steps_wait:
                if t < cfg.num_steps_wait:
                    obs, _, _, _ = env.step(libero_utils.get_libero_dummy_action())
                    t += 1
                    continue
                image = libero_utils.get_libero_image(obs)
                frames.append(image)
                out = get_action(
                    cfg, model, {"full_image": image}, task_description,
                    return_embeddings=True, spec_state=spec_state,
                )
                labels = detector.detect_binary_states()
                writer.append(
                    out["hidden_pooled"],
                    symbolic_state_object_relations=labels[: len(rel_keys)],
                    symbolic_state_action_subgoals=labels[len(rel_keys):],
                )
                action = robot_utils.normalize_gripper_action(out["actions"], binarize=True)
                action = robot_utils.invert_gripper_action(action)
                obs, _, done, _ = env.step(action.tolist())
                t += 1
                if done:
                    success = True
                    break

            if success:
                # capture-only continuation after success (reference :330-339)
                for _ in range(cfg.post_success_steps):
                    image = libero_utils.get_libero_image(obs)
                    out = get_action(cfg, model, {"full_image": image}, task_description,
                                     return_embeddings=True, spec_state=spec_state)
                    labels = detector.detect_binary_states()
                    writer.append(
                        out["hidden_pooled"],
                        symbolic_state_object_relations=labels[: len(rel_keys)],
                        symbolic_state_action_subgoals=labels[len(rel_keys):],
                    )
                    obs, _, _, _ = env.step(libero_utils.get_libero_dummy_action())

            ep_path = writer.flush(episode_counter, success=success)
            if cfg.export_pt:
                from openvla_probe_tpu.probe.episodes import export_episode_pt

                export_episode_pt(ep_path)
            if cfg.save_videos:
                libero_utils.save_rollout_video(
                    frames, episode_counter, success, task_description, run_dir, log
                )
            log.write(f"Episode {episode_counter} success: {success}\n")
            log.flush()
            successes += int(success)
            task_successes += int(success)
            task_episodes += 1
            total += 1
            episode_counter += 1
            overwatch.info(
                f"[{cfg.task_suite_name}] task {task_id} ep {ep}: success={success} "
                f"({successes}/{total} = {successes/total:.3f})"
            )
        if wandb_run is not None:
            # per-task rates, reference run_libero_eval_object.py:383-390
            wandb_run.log({
                f"success_rate/{task_description}": task_successes / max(task_episodes, 1),
                f"num_episodes/{task_description}": task_episodes,
            })
    log.write(f"FINAL success rate: {successes}/{total} = {successes/total:.4f}\n")
    log.close()
    if wandb_run is not None:
        wandb_run.log({
            "success_rate/total": successes / max(total, 1),
            "num_episodes/total": total,
        })
        wandb_run.save(str(run_dir / "eval.log"))
        wandb_run.finish()


if __name__ == "__main__":
    main(parse_config(GenerateConfig))
