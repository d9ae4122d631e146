"""Remat, ZeRO-2 shardings, and gradient accumulation tests."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openvla_probe_tpu.models import llama, vlm
from openvla_probe_tpu.parallel.mesh import make_mesh
from openvla_probe_tpu.parallel.sharding import shard_train_state
from openvla_probe_tpu.training.train_state import OptimizerConfig, TrainState, make_optimizer
from openvla_probe_tpu.training.train_step import make_train_step
from openvla_probe_tpu.vla.action_tokenizer import ActionCodec

IGNORE = -100


def test_remat_grads_match_plain(rng):
    cfg = llama.LlamaConfig.tiny()
    cfg_remat = dataclasses.replace(cfg, remat=True)
    params = llama.init_params(cfg, jax.random.key(0))
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 8)))
    mask = jnp.ones((2, 8), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(8), (2, 8))

    def loss(p, c):
        e = llama.embed_tokens(p, ids)
        logits = llama.forward(p, c, e, mask, pos)["logits"]
        return jnp.mean(jax.nn.log_softmax(logits)[..., 0])

    g_plain = jax.grad(lambda p: loss(p, cfg))(params)
    g_remat = jax.grad(lambda p: loss(p, cfg_remat))(params)
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)


def test_vit_remat_grads_match_plain(rng):
    from openvla_probe_tpu.models import vit

    cfg = vit.ViTConfig.tiny()
    cfg_remat = dataclasses.replace(cfg, remat=True)
    params = vit.init_params(cfg, jax.random.key(0))
    px = jnp.asarray(rng.normal(size=(2, 3, cfg.image_size, cfg.image_size)), jnp.float32)

    def loss(p, c):
        return jnp.mean(vit.forward_features(p, c, px) ** 2)

    np.testing.assert_allclose(
        float(loss(params, cfg)), float(loss(params, cfg_remat)), rtol=1e-6)
    g_plain = jax.grad(lambda p: loss(p, cfg))(params)
    g_remat = jax.grad(lambda p: loss(p, cfg_remat))(params)
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)


def test_zero2_shardings():
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh({"dp": 2, "fsdp": 2, "tp": 2})
    cfg = vlm.VLMConfig.tiny()
    params = vlm.init_params(cfg, jax.random.key(0))
    optimizer = make_optimizer(OptimizerConfig(max_steps=10), params)
    state = TrainState.create(params, optimizer)
    sh = shard_train_state(state, mesh, strategy="zero2")
    # params replicated
    assert sh.params["llm"]["layers"]["q_proj"].spec == P(None, None, None)
    # Adam moments sharded along fsdp
    mu_sh = jax.tree_util.tree_leaves(
        jax.tree.map(lambda s: s.spec, sh.opt_state, is_leaf=lambda x: hasattr(x, "spec"))
    )
    assert any("fsdp" in str(s) for s in mu_sh)
    # state is placeable + usable
    placed = jax.device_put(state, sh)
    assert int(jax.device_get(placed.step)) == 0


def test_zero3_vs_zero2_param_placement():
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh({"dp": 2, "fsdp": 2, "tp": 2})
    cfg = vlm.VLMConfig.tiny()
    params = vlm.init_params(cfg, jax.random.key(0))
    optimizer = make_optimizer(OptimizerConfig(max_steps=10), params)
    state = TrainState.create(params, optimizer)
    z3 = shard_train_state(state, mesh, strategy="fsdp")
    assert "fsdp" in str(z3.params["llm"]["layers"]["q_proj"].spec)


def test_grad_accumulation_matches_full_batch(rng):
    cfg = vlm.VLMConfig.tiny()
    params = vlm.init_params(cfg, jax.random.key(1))
    codec = ActionCodec(vocab_size=cfg.llm.vocab_size)
    B, T, S = 4, 12, cfg.vision[0].image_size
    # equal per-example valid-label counts so mean-of-means == global mean
    labels = np.full((B, T), IGNORE, np.int64)
    labels[:, -6:] = rng.integers(cfg.llm.vocab_size - 256, cfg.llm.vocab_size, (B, 6))
    batch = {
        "input_ids": jnp.asarray(rng.integers(2, cfg.llm.vocab_size, (B, T)), jnp.int32),
        "attention_mask": jnp.ones((B, T), jnp.int32),
        "pixel_values": jnp.asarray(rng.normal(size=(B, 6, S, S)), jnp.float32),
        "labels": jnp.asarray(labels),
    }
    opt = make_optimizer(OptimizerConfig(learning_rate=1e-3, lr_schedule_type="constant",
                                         max_steps=10), params)
    s0 = TrainState.create(params, opt)
    step1 = make_train_step(cfg, opt, codec=codec, donate=False)
    step2 = make_train_step(cfg, opt, codec=codec, donate=False, grad_accum_steps=2)
    s_full, m_full = step1(s0, batch)
    s_acc, m_acc = step2(s0, batch)
    np.testing.assert_allclose(float(m_full["loss"]), float(m_acc["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s_full.params["llm"]["lm_head"], np.float32),
        np.asarray(s_acc.params["llm"]["lm_head"], np.float32),
        atol=2e-5,
    )


def test_checkpoint_keep_limit_never_deletes_just_written(tmp_path):
    """Reused run_dir with HIGHER-step checkpoints from a prior run: pruning
    must keep the just-written (lower-step) checkpoint and parse nan losses."""
    from openvla_probe_tpu.training import checkpointing as ckpt

    state = {"w": jnp.ones((4,))}
    p_old = ckpt.save_checkpoint(tmp_path, state, step=1000, epoch=1, loss=0.5)
    p_new = ckpt.save_checkpoint(tmp_path, state, step=100, epoch=0,
                                 loss=float("nan"), keep_limit=1)
    assert p_new.exists(), "pruning deleted the checkpoint it just wrote"
    # nan loss sanitized into a parseable name
    meta = ckpt.parse_checkpoint_name(p_new.name)
    assert meta is not None and meta[0] == 100
    # latest_checkpoint still resolves (old one survived as the max-step)
    assert ckpt.latest_checkpoint(tmp_path) is not None


def test_async_checkpoint_writer(tmp_path):
    """AsyncCheckpointWriter: background writes restore identically, the
    snapshot is immune to post-save mutation of the live state, keep_limit
    prunes only after the NEXT save confirms the previous write committed,
    and close() makes the final checkpoint durable."""
    from openvla_probe_tpu.training import checkpointing as ckpt

    state = {"w": jnp.arange(8, dtype=jnp.float32), "b": jnp.ones((2, 3))}
    with ckpt.AsyncCheckpointWriter(keep_limit=2) as writer:
        paths = []
        for step in (1, 2, 3):
            # mutate the pytree between saves the way a train loop would;
            # each snapshot must capture its own step's values
            live = jax.tree.map(lambda a: a + step, state)
            paths.append(writer.save(tmp_path, live, step=step, loss=0.1 * step))
        writer.wait()
        # keep_limit=2: step 1 pruned, steps 2+3 present
        assert not paths[0].exists()
        assert paths[1].exists() and paths[2].exists()
        got = ckpt.load_checkpoint(paths[2], state)
        np.testing.assert_array_equal(
            np.asarray(got["w"]), np.arange(8, dtype=np.float32) + 3)
        assert ckpt.latest_checkpoint(tmp_path) == paths[2]
    # close() idempotence across context exit
    got2 = ckpt.load_checkpoint(paths[1], state)
    np.testing.assert_array_equal(np.asarray(got2["b"]), np.ones((2, 3)) + 2)
