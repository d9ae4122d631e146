"""Phi-2 block parity vs HF PhiForCausalLM (parallel attn+MLP, partial rotary)."""

import numpy as np
import pytest

import jax.numpy as jnp

from openvla_probe_tpu.models import phi
from openvla_probe_tpu.models.llama import KVCache


@pytest.fixture(scope="module")
def hf_pair():
    import torch
    from transformers import PhiConfig as HFPhiConfig, PhiForCausalLM

    torch.manual_seed(0)
    hf_cfg = HFPhiConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128, partial_rotary_factor=0.5,
        layer_norm_eps=1e-5, rope_theta=10000.0, hidden_act="gelu_new",
        attn_implementation="eager", tie_word_embeddings=False,
    )
    model = PhiForCausalLM(hf_cfg).eval()
    cfg = phi.PhiConfig.tiny(partial_rotary_factor=0.5)
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return model, cfg, phi.params_from_hf(state, cfg)


def test_phi_logits_match_hf(hf_pair, rng):
    import torch

    model, cfg, params = hf_pair
    ids = rng.integers(0, 256, size=(2, 9))
    with torch.no_grad():
        want = model(input_ids=torch.tensor(ids)).logits.numpy()
    e = phi.embed_tokens(params, jnp.asarray(ids))
    got = np.asarray(phi.forward(
        params, cfg, e, jnp.ones((2, 9), jnp.int32),
        jnp.broadcast_to(jnp.arange(9), (2, 9)))["logits"])
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_phi_kv_cache_decode(hf_pair, rng):
    _, cfg, params = hf_pair
    ids = rng.integers(0, 256, size=(1, 7))
    e = phi.embed_tokens(params, jnp.asarray(ids))
    full = np.asarray(phi.forward(
        params, cfg, e, jnp.ones((1, 7), jnp.int32), jnp.arange(7)[None])["logits"])
    # llama KVCache works for phi (same [L,B,S,H,Dh] layout)
    cache = KVCache(
        jnp.zeros((cfg.num_hidden_layers, 1, 10, cfg.num_attention_heads, cfg.head_dim)),
        jnp.zeros((cfg.num_hidden_layers, 1, 10, cfg.num_attention_heads, cfg.head_dim)),
    )
    out = phi.forward(params, cfg, e[:, :5],
                      jnp.zeros((1, 10), jnp.int32).at[:, :5].set(1),
                      jnp.arange(5)[None], cache=cache, cache_index=jnp.int32(0))
    step = phi.forward(params, cfg, e[:, 5:6],
                       jnp.zeros((1, 10), jnp.int32).at[:, :6].set(1),
                       jnp.full((1, 1), 5), cache=out["cache"], cache_index=jnp.int32(5))
    np.testing.assert_allclose(np.asarray(step["logits"][:, 0]), full[:, 5],
                               atol=3e-4, rtol=1e-3)


def test_phi_vlm_stack_end_to_end():
    """The phi trunk drives the full VLM stack (multimodal splice + CE loss) —
    regression: 'phi-2-3b' was previously a Llama config with Phi dims."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from openvla_probe_tpu.models import catalog, phi, vlm
    from openvla_probe_tpu.models.vit import ViTConfig

    # catalog entry is the REAL architecture
    assert isinstance(catalog.LLM_BACKBONES["phi-2-3b"]["cfg"], phi.PhiConfig)

    cfg = vlm.VLMConfig(
        llm=phi.PhiConfig.tiny(),
        vision=(ViTConfig.tiny(num_register_tokens=4, no_embed_class=True), ViTConfig.tiny()),
        vision_names=("dino", "siglip"),
        arch_specifier="no-align+fused-gelu-mlp",
    )
    params = vlm.init_params(cfg, jax.random.key(0))
    assert "q_w" in params["llm"]["layers"]          # phi layout, not llama

    r = np.random.default_rng(0)
    B, T, S = 2, 10, cfg.vision[0].image_size
    labels = np.full((B, T), -100, np.int64)
    labels[:, -4:] = r.integers(3, cfg.llm.vocab_size, (B, 4))
    out = vlm.forward(
        params, cfg,
        jnp.asarray(r.integers(2, 250, (B, T)), jnp.int32),
        jnp.ones((B, T), jnp.int32),
        jnp.asarray(r.normal(size=(B, 6, S, S)), jnp.float32),
        jnp.asarray(labels),
    )
    assert out["logits"].shape[-1] == cfg.llm.vocab_size
    assert np.isfinite(np.asarray(out["logits"])).all()

    from openvla_probe_tpu.training.train_step import cross_entropy_loss

    loss = cross_entropy_loss(out["logits"], out["labels"])
    assert np.isfinite(float(loss))
