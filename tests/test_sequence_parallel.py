"""Sequence parallelism: a dp x sp x tp train step matches the unsharded
baseline.

SP here is pure GSPMD: `parallel.mesh.sequence_sharding` pins [B, T] token
arrays to P(dp, sp) and the UNCHANGED train step runs under those shardings —
XLA all-gathers where attention needs the full sequence and keeps
embedding/FFN/loss math on local token shards (scaling-book recipe). The
reference has no SP at all (torch FSDP only, SURVEY.md §2.5).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from openvla_probe_tpu.models import vlm
from openvla_probe_tpu.parallel.mesh import make_mesh, sequence_sharding
from openvla_probe_tpu.parallel.sharding import shard_params
from openvla_probe_tpu.training.train_state import OptimizerConfig, TrainState, make_optimizer
from openvla_probe_tpu.training.train_step import make_sharded_train_step, make_train_step
from openvla_probe_tpu.vla.action_tokenizer import ActionCodec


def _batch(cfg, B=4, T=24, seed=0):
    rng = np.random.default_rng(seed)
    S = cfg.vision[0].image_size
    batch = {
        "input_ids": rng.integers(2, cfg.llm.vocab_size, (B, T)).astype(np.int32),
        "attention_mask": np.ones((B, T), np.int32),
        "pixel_values": rng.normal(size=(B, 6, S, S)).astype(np.float32),
        "labels": np.full((B, T), -100, np.int32),
    }
    batch["labels"][:, -8:] = rng.integers(
        cfg.llm.vocab_size - 256, cfg.llm.vocab_size, (B, 8))
    return batch


@pytest.mark.parametrize("axes", [
    {"dp": 2, "sp": 2, "tp": 2},
    {"dp": 1, "sp": 4, "tp": 2},
])
def test_sp_train_step_matches_unsharded(axes):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = vlm.VLMConfig.tiny()
    codec = ActionCodec(vocab_size=cfg.llm.vocab_size)
    params = vlm.init_params(cfg, jax.random.key(0))
    opt = make_optimizer(OptimizerConfig(max_steps=10), params)
    batch = _batch(cfg)

    # unsharded baseline
    base_state = TrainState.create(params, opt)
    base_step = make_train_step(cfg, opt, codec=codec)
    base_state, base_metrics = base_step(base_state, {k: jnp.asarray(v) for k, v in batch.items()})
    base_loss = float(base_metrics["loss"])

    # dp x sp x tp sharded (re-init: the baseline step donated its state)
    params = vlm.init_params(cfg, jax.random.key(0))
    mesh = make_mesh(axes, jax.devices()[:8])
    state = TrainState.create(params, opt)
    state_shardings = shard_params(state, mesh, strategy="tp")
    state = jax.device_put(state, state_shardings)
    batch_shardings = sequence_sharding(mesh, batch)
    # token arrays really are sequence-sharded, pixels batch-only
    assert batch_shardings["input_ids"].spec == P("dp", "sp")
    assert batch_shardings["labels"].spec == P("dp", "sp")
    assert batch_shardings["pixel_values"].spec == P("dp")
    sharded_batch = jax.device_put(batch, batch_shardings)
    step = make_sharded_train_step(cfg, opt, mesh, state_shardings,
                                   batch_shardings, codec=codec)
    state, metrics = step(state, sharded_batch)

    assert np.isfinite(base_loss)
    assert float(metrics["loss"]) == pytest.approx(base_loss, rel=2e-4)
    assert float(metrics["grad_norm"]) == pytest.approx(
        float(base_metrics["grad_norm"]), rel=2e-3)


def test_sequence_sharding_falls_back_without_sp_axis():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = vlm.VLMConfig.tiny()
    mesh = make_mesh({"dp": 4, "tp": 2}, jax.devices()[:8])
    shardings = sequence_sharding(mesh, _batch(cfg))
    assert shardings["input_ids"].spec == P("dp")

    # T not divisible by sp -> that leaf stays batch-only
    mesh_sp = make_mesh({"dp": 2, "sp": 2, "tp": 2}, jax.devices()[:8])
    odd = {"input_ids": np.zeros((4, 23), np.int32)}
    assert sequence_sharding(mesh_sp, odd)["input_ids"].spec == P("dp")
