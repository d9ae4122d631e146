"""REAL 2-process `jax.distributed` execution certificate (VERDICT r4 #2).

Every prior multi-host artifact in this repo (the 8-device dryrun,
tests/test_multihost_data.py, tests/test_sharded_serving.py) ran inside ONE
OS process on a virtual mesh. This script spawns TWO actual OS processes
(coordinator + worker over local TCP — the counterpart of the reference's
torchrun rendezvous + dist.barrier() choreography,
/root/reference/prismatic/training/strategies/base_strategy.py:230,241,382,
launch commands README.md:184,278,412) and certifies, in their true
cross-process form:

  1. `initialize_distributed` rendezvous (parallel/distributed.py:23-45) on
     the CPU backend with gloo collectives;
  2. per-process disjoint RLDS shards fed from REAL jax.process_index
     (the same make_dataset_from_rlds wiring RLDSDataset drives);
  3. the REAL `scripts/train.py` at tiny scale: per-process dummy-stream
     shards -> make_array_from_process_local_data global batches -> sharded
     train steps whose psums cross the process boundary;
  4. a cross-process collective orbax save, a cross-process sharded restore
     (--is_resume), and one resumed step;
  5. equality vs the single-process run: the loss trajectory matches
     step-for-step (incl. the post-restore steps) and the final checkpoints
     match leaf-for-leaf.

Usage: python scripts/dryrun_multihost.py            (orchestrates everything)
       ... --worker rlds --pid N                     (internal worker mode)

Prints one status tail line:  dryrun_multihost OK: ...
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
PORT = int(os.environ.get("OVLA_MULTIHOST_PORT", "29417"))
STEPS_A = 2          # steps before the collective save
STEPS_B = 4          # total steps (resume runs 3..4)
GLOBAL_BS = 8
TRAIN_ARGS = [
    "--vla.base_vlm", "dinosiglip-tiny-28px::llama-tiny",
    "--vla.data_mix", "dummy",
    "--vla.global_batch_size", str(GLOBAL_BS),
    "--vla.per_device_batch_size", "2",
    "--vla.expected_world_size", "4",
    "--vla.shuffle_buffer_size", "100",
    "--save_interval", "2",
    "--mesh_dp", "2", "--mesh_fsdp", "2",
    "--run_id", "mh",
]


def _env(n_proc: int, pid: int, n_local_dev: int) -> dict:
    env = dict(os.environ)
    env.update({
        "OVLA_PLATFORM": "cpu",
        "OVLA_HOST_DEVICE_COUNT": str(n_local_dev),
        "XLA_FLAGS": f"--xla_force_host_platform_device_count={n_local_dev}",
        "JAX_PLATFORMS": "cpu",
    })
    if n_proc > 1:
        env.update({
            "COORDINATOR_ADDRESS": f"127.0.0.1:{PORT}",
            "JAX_NUM_PROCESSES": str(n_proc),
            "JAX_PROCESS_ID": str(pid),
        })
    return env


def _run_train(tag: str, root: Path, n_proc: int, extra: list) -> None:
    """Launch train.py as n_proc real OS processes; raise on any failure."""
    procs = []
    for pid in range(n_proc):
        log = open(root / f"{tag}.p{pid}.log", "w")
        procs.append((subprocess.Popen(
            [sys.executable, str(REPO / "scripts" / "train.py"),
             "--run_root_dir", str(root / tag)] + TRAIN_ARGS + extra,
            env=_env(n_proc, pid, 4 // n_proc), cwd=str(REPO),
            stdout=log, stderr=log), log))
    rcs = []
    for p, log in procs:
        try:
            rcs.append(p.wait(timeout=900))
        except subprocess.TimeoutExpired:
            p.kill()
            rcs.append(-9)
        log.close()
    if any(rc != 0 for rc in rcs):
        tails = {i: (root / f"{tag}.p{i}.log").read_text()[-2000:]
                 for i in range(n_proc)}
        raise RuntimeError(f"{tag}: rcs={rcs}\n" + "\n---\n".join(
            f"[p{i}]\n{t}" for i, t in tails.items()))


def _losses(run_dir: Path) -> list:
    """(step, loss) from the checkpoint directory NAMES (the name-encoded
    step/epoch/loss contract, training/checkpointing.checkpoint_name): the
    per-step jsonl tracker only flushes every 10 steps, but every saved
    checkpoint carries its exact step loss to 4 decimals — with
    save_interval=2 that samples the trajectory at steps 2 and 4."""
    sys.path.insert(0, str(REPO))
    from openvla_probe_tpu.training.checkpointing import parse_checkpoint_name

    rows = []
    for p in (run_dir / "mh" / "checkpoints").iterdir():
        parsed = parse_checkpoint_name(p.name)
        if parsed:
            rows.append((parsed[0], parsed[2]))
    return sorted(dict(rows).items())


def _worker_rlds(pid: int) -> None:
    """2-process RLDS shard check: the REAL-process_index sharding path."""
    sys.path.insert(0, str(REPO))
    import jax

    jax.config.update("jax_platforms", "cpu")
    from openvla_probe_tpu.parallel.distributed import initialize_distributed

    initialize_distributed()
    assert jax.process_count() == 2, jax.process_count()
    import numpy as np
    import tensorflow as tf

    from openvla_probe_tpu.vla.datasets.rlds import dataset as rd
    from openvla_probe_tpu.vla.norm_stats import NormalizationType

    N_TRAJ, T = 8, 6

    def source(split):
        def gen():
            g = np.random.default_rng(0)
            for i in range(N_TRAJ):
                tag = f"traj-{i}".encode()
                yield {
                    "observation": {"image_0": np.array([b""] * T, object)},
                    "action": g.normal(size=(T, 7)).astype(np.float32),
                    "language_instruction": np.array([tag] * T, object),
                }

        return tf.data.Dataset.from_generator(
            gen, output_signature={
                "observation": {"image_0": tf.TensorSpec((None,), tf.string)},
                "action": tf.TensorSpec((None, 7), tf.float32),
                "language_instruction": tf.TensorSpec((None,), tf.string),
            })

    # EXACTLY RLDSDataset's wiring (vla/datasets/datasets.py:124-132):
    # num_shards/shard_index from the REAL process topology
    ds, _ = rd.make_dataset_from_rlds(
        name="ds_mh", data_dir="",
        image_obs_keys={"primary": "image_0"},
        language_key="language_instruction",
        action_proprio_normalization_type=NormalizationType.BOUNDS_Q99,
        trajectory_dataset_fn=source, train=True,
        num_shards=jax.process_count(), shard_index=jax.process_index())
    tags = sorted({t["task"]["language_instruction"][0].decode()
                   for t in ds.as_numpy_iterator()})
    from jax.experimental import multihost_utils

    # fixed-width tag codes -> allgather across the two processes
    codes = np.asarray([int(t.split("-")[1]) for t in tags], np.int32)
    pad = np.full(N_TRAJ, -1, np.int32)
    pad[:codes.size] = codes
    allc = np.asarray(multihost_utils.process_allgather(pad))
    mine = set(codes.tolist())
    theirs = set(allc[1 - jax.process_index()].tolist()) - {-1}
    assert mine and theirs, (mine, theirs)
    assert not (mine & theirs), f"shards overlap: {mine & theirs}"
    assert mine | theirs == set(range(N_TRAJ)), (mine, theirs)
    multihost_utils.sync_global_devices("rlds_done")
    print(f"RLDS_SHARDS p{jax.process_index()} ok "
          f"mine={sorted(mine)}", flush=True)


def _compare_checkpoints(single_dir: Path, multi_dir: Path) -> float:
    """Single-process restore of both step-4 checkpoints; max rel diff."""
    sys.path.insert(0, str(REPO))
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import orbax.checkpoint as ocp

    def latest(root: Path) -> Path:
        cks = sorted((root / "mh" / "checkpoints").iterdir())
        return cks[-1]

    def restore(path: Path):
        # the multi-process checkpoint's saved device ids (0,1,2048,2049 —
        # process 1's devices carry the process offset) can't map onto this
        # single-process parent, so restore into an EXPLICIT fully-replicated
        # template built from the checkpoint's own metadata
        sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        with ocp.StandardCheckpointer() as ck:
            meta = ck.metadata(path)
            tree = getattr(meta, "item_metadata", meta)   # orbax StepMetadata
            template = jax.tree.map(
                lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype,
                                               sharding=sharding), tree)
            return ck.restore(path, template)

    a = restore(latest(single_dir).absolute())
    b = restore(latest(multi_dir).absolute())
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    worst = 0.0
    for x, y in zip(la, lb):
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        d = np.abs(x - y).max() if x.size else 0.0
        scale = max(np.abs(x).max(), 1e-6)
        worst = max(worst, float(d / scale))
    return worst


def main() -> None:
    if "--worker" in sys.argv:
        _worker_rlds(int(sys.argv[sys.argv.index("--pid") + 1]))
        return

    t0 = time.time()
    # the parent restores the 4-device checkpoints itself at the end —
    # orbax maps the saved DeviceMetadata ids onto current devices, so the
    # parent must expose 4 CPU devices BEFORE jax's backend initializes
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    root = Path(tempfile.mkdtemp(prefix="ovla_mh_"))
    print(f"# workdir {root}", flush=True)

    # --- phase RLDS: real-process_index shard disjointness ----------------
    procs = []
    for pid in range(2):
        log = open(root / f"rlds.p{pid}.log", "w")
        procs.append((subprocess.Popen(
            [sys.executable, __file__, "--worker", "rlds", "--pid", str(pid)],
            env=_env(2, pid, 1), cwd=str(REPO), stdout=log, stderr=log), log))
    rcs = []
    for p, _ in procs:
        try:
            rcs.append(p.wait(timeout=600))
        except subprocess.TimeoutExpired:
            # kill BOTH workers: one hung process (stale rendezvous port,
            # tf.data stall) must not orphan its peer inside the gloo
            # rendezvous — an orphan holds the fixed port and poisons every
            # rerun
            for q, _ in procs:
                q.kill()
            rcs.append(-9)
    for _, log in procs:
        log.close()
    if any(rc != 0 for rc in rcs):
        tails = "\n---\n".join((root / f"rlds.p{i}.log").read_text()[-1500:]
                               for i in range(2))
        raise RuntimeError(f"rlds shard check failed rcs={rcs}\n{tails}")
    rlds_ok = True
    print("# rlds shard check ok", flush=True)

    # --- phase S: single-process reference (4 local devices) --------------
    _run_train("single", root, 1, ["--vla.max_steps", str(STEPS_B)])
    print("# single-process run done", flush=True)

    # --- phase M1: 2-process run to the collective save -------------------
    _run_train("multi", root, 2, ["--vla.max_steps", str(STEPS_A)])
    print("# 2-process run (steps 1-2 + collective save) done", flush=True)

    # --- phase M2: 2-process RESUME from the collective checkpoint --------
    _run_train("multi", root, 2, ["--vla.max_steps", str(STEPS_B),
                                  "--is_resume", "true",
                                  "--resume_step", str(STEPS_A)])
    print("# 2-process resume (steps 3-4) done", flush=True)

    # --- compare ----------------------------------------------------------
    ls = _losses(root / "single")
    lm = _losses(root / "multi")
    assert [s for s, _ in ls] == [s for s, _ in lm] == [STEPS_A, STEPS_B], (ls, lm)
    worst_loss = max(abs(a - b) / max(abs(a), 1e-9)
                     for (_, a), (_, b) in zip(ls, lm))
    assert worst_loss < 1e-3, f"loss trajectories diverge: {ls} vs {lm}"
    worst_ckpt = _compare_checkpoints(root / "single", root / "multi")
    assert worst_ckpt < 1e-3, f"final checkpoints diverge: {worst_ckpt}"

    print(
        "dryrun_multihost OK: procs=2 devices=4 rendezvous=gloo "
        f"rlds_shards_disjoint={rlds_ok} steps={STEPS_B} "
        f"resume_from_collective_ckpt=True "
        f"loss_match={worst_loss:.2e} ckpt_match={worst_ckpt:.2e} "
        f"losses={[round(v, 4) for _, v in lm]} "
        f"wall={time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
