"""Per-layer array trainable masks (unfreeze_last_llm_layer semantics)."""

import numpy as np

import jax
import jax.numpy as jnp

from openvla_probe_tpu.models import vlm
from openvla_probe_tpu.training import OptimizerConfig, TrainState, make_optimizer, make_train_step
from openvla_probe_tpu.vla.action_tokenizer import ActionCodec


def test_array_mask_unfreezes_only_last_layer(rng):
    cfg = vlm.VLMConfig.tiny()
    params = vlm.init_params(cfg, jax.random.key(0))
    L = cfg.llm.num_hidden_layers
    mask = jax.tree.map(lambda _: True, params)
    mask["vision"] = jax.tree.map(lambda _: False, params["vision"])
    mask["llm"] = jax.tree.map(lambda _: False, params["llm"])
    last_only = jnp.arange(L) == L - 1
    mask["llm"]["layers"] = jax.tree.map(lambda _: last_only, params["llm"]["layers"])
    mask["llm"]["norm"] = True
    mask["llm"]["lm_head"] = True

    B, T, S = 2, 12, cfg.vision[0].image_size
    labels = np.full((B, T), -100, np.int64)
    labels[:, -6:] = rng.integers(cfg.llm.vocab_size - 256, cfg.llm.vocab_size, (B, 6))
    batch = {
        "input_ids": jnp.asarray(rng.integers(2, cfg.llm.vocab_size, (B, T)), jnp.int32),
        "attention_mask": jnp.ones((B, T), jnp.int32),
        "pixel_values": jnp.asarray(rng.normal(size=(B, 6, S, S)), jnp.float32),
        "labels": jnp.asarray(labels),
    }
    opt = make_optimizer(OptimizerConfig(learning_rate=1e-2, lr_schedule_type="constant",
                                         max_steps=10), params)
    state = TrainState.create(params, opt)
    step = make_train_step(cfg, opt, codec=ActionCodec(vocab_size=cfg.llm.vocab_size),
                           trainable_mask=mask, donate=False)
    new_state, _ = step(state, batch)

    q0 = np.asarray(params["llm"]["layers"]["q_proj"])
    q1 = np.asarray(new_state.params["llm"]["layers"]["q_proj"])
    # layers 0..L-2 frozen; last layer moved
    np.testing.assert_array_equal(q1[: L - 1], q0[: L - 1])
    assert np.abs(q1[L - 1] - q0[L - 1]).max() > 0
    # embeddings frozen, head trainable
    np.testing.assert_array_equal(
        np.asarray(new_state.params["llm"]["embed_tokens"]),
        np.asarray(params["llm"]["embed_tokens"]))
    assert np.abs(np.asarray(new_state.params["llm"]["lm_head"]) -
                  np.asarray(params["llm"]["lm_head"])).max() > 0
