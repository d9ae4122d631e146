"""Parity tests: functional Llama decoder vs HF LlamaForCausalLM (tiny config, fp32).

Mirrors the project test strategy (SURVEY.md §4): per-module activation diffs vs
the torch reference, then argmax-token equality (the greedy contract).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openvla_probe_tpu.models import llama


@pytest.fixture(scope="module")
def hf_pair():
    import torch
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaForCausalLM

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256, rms_norm_eps=1e-5, rope_theta=10000.0,
        attn_implementation="eager", tie_word_embeddings=False,
    )
    model = LlamaForCausalLM(hf_cfg).eval()
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    cfg = llama.LlamaConfig.tiny()
    params = llama.params_from_hf(state, cfg)
    return model, cfg, params


def test_logits_match_hf(hf_pair, rng):
    import torch

    model, cfg, params = hf_pair
    ids = rng.integers(0, 512, size=(2, 12))
    with torch.no_grad():
        want = model(input_ids=torch.tensor(ids)).logits.numpy()

    embeds = llama.embed_tokens(params, jnp.asarray(ids))
    mask = jnp.ones((2, 12), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(12), (2, 12))
    got = np.asarray(llama.forward(params, cfg, embeds, mask, pos)["logits"])
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_padded_batch_matches_hf(hf_pair, rng):
    import torch

    model, cfg, params = hf_pair
    ids = rng.integers(0, 512, size=(2, 10))
    am = np.ones((2, 10), np.int64)
    am[1, 7:] = 0  # right padding on row 1
    with torch.no_grad():
        want = model(input_ids=torch.tensor(ids), attention_mask=torch.tensor(am)).logits.numpy()

    embeds = llama.embed_tokens(params, jnp.asarray(ids))
    pos = jnp.broadcast_to(jnp.arange(10), (2, 10))
    got = np.asarray(llama.forward(params, cfg, embeds, jnp.asarray(am), pos)["logits"])
    # compare only non-pad positions (HF's pad-position outputs are arbitrary)
    np.testing.assert_allclose(got[0], want[0], atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(got[1, :7], want[1, :7], atol=2e-4, rtol=1e-3)


def test_kv_cache_decode_matches_full_forward(hf_pair, rng):
    """Prefill T0 then decode one-by-one == full forward at each position."""
    _, cfg, params = hf_pair
    B, T0, steps, S = 2, 8, 5, 16
    ids = rng.integers(0, 512, size=(B, T0 + steps))

    # full forward reference
    full_embeds = llama.embed_tokens(params, jnp.asarray(ids))
    full_mask = jnp.ones((B, T0 + steps), jnp.int32)
    full_pos = jnp.broadcast_to(jnp.arange(T0 + steps), (B, T0 + steps))
    want = np.asarray(llama.forward(params, cfg, full_embeds, full_mask, full_pos)["logits"])

    # prefill into cache
    cache = llama.KVCache.zeros(cfg, B, S, dtype=jnp.float32)
    mask = jnp.zeros((B, S), jnp.int32).at[:, :T0].set(1)
    pos = jnp.broadcast_to(jnp.arange(T0), (B, T0))
    out = llama.forward(
        params, cfg, full_embeds[:, :T0], mask, pos, cache=cache, cache_index=jnp.int32(0)
    )
    np.testing.assert_allclose(np.asarray(out["logits"]), want[:, :T0], atol=1e-4, rtol=1e-3)
    cache = out["cache"]

    for t in range(T0, T0 + steps):
        mask = jnp.zeros((B, S), jnp.int32).at[:, : t + 1].set(1)
        step_out = llama.forward(
            params, cfg,
            full_embeds[:, t : t + 1],
            mask,
            jnp.full((B, 1), t),
            cache=cache,
            cache_index=jnp.int32(t),
        )
        cache = step_out["cache"]
        np.testing.assert_allclose(
            np.asarray(step_out["logits"][:, 0]), want[:, t], atol=2e-4, rtol=1e-3
        )


def test_hidden_state_taps(hf_pair, rng):
    """hidden_pooled == mean over T of HF's output_hidden_states (pre-final-norm)."""
    import torch

    model, cfg, params = hf_pair
    ids = rng.integers(0, 512, size=(1, 9))
    with torch.no_grad():
        hs = model(input_ids=torch.tensor(ids), output_hidden_states=True).hidden_states
    want = np.stack([h.numpy().mean(axis=1) for h in hs], axis=1)  # [1, L+1, D]

    embeds = llama.embed_tokens(params, jnp.asarray(ids))
    mask = jnp.ones((1, 9), jnp.int32)
    pos = jnp.arange(9)[None]
    out = llama.forward(params, cfg, embeds, mask, pos, collect_hidden_states=True)
    got = np.asarray(out["hidden_pooled"])
    assert got.shape == want.shape == (1, cfg.num_hidden_layers + 1, cfg.hidden_size)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_forward_jits_and_runs(hf_pair):
    _, cfg, params = hf_pair
    fwd = jax.jit(lambda p, e, m, pos: llama.forward(p, cfg, e, m, pos)["logits"])
    e = jnp.zeros((1, 4, cfg.hidden_size))
    logits = fwd(params, e, jnp.ones((1, 4), jnp.int32), jnp.arange(4)[None])
    assert logits.shape == (1, 4, cfg.vocab_size)


def test_rope_dtype_turbo_close_to_parity():
    """bf16 RoPE (turbo) must stay numerically close to the fp32-parity
    rotation on a tiny fp32 model (exactness is not required — it is a
    documented turbo shortcut, like bf16 scores)."""
    import dataclasses

    cfg32 = llama.LlamaConfig.tiny()
    cfg16 = dataclasses.replace(cfg32, rope_dtype=jnp.bfloat16)
    params = llama.init_params(cfg32, jax.random.key(0))
    r = np.random.default_rng(0)
    ids = jnp.asarray(r.integers(3, 500, (2, 9)), jnp.int32)
    e = llama.embed_tokens(params, ids)
    m = jnp.ones((2, 9), jnp.int32)
    p = jnp.broadcast_to(jnp.arange(9), (2, 9))
    out32 = llama.forward(params, cfg32, e, m, p)["logits"]
    out16 = llama.forward(params, cfg16, e, m, p)["logits"]
    assert not np.array_equal(np.asarray(out32), np.asarray(out16))  # knob is live
    np.testing.assert_allclose(np.asarray(out32), np.asarray(out16), atol=0.15, rtol=0.05)
