"""GQA (Mistral-style) parity + windowed frame-transform decode tests."""

import numpy as np
import pytest
import tensorflow as tf

import jax.numpy as jnp

from openvla_probe_tpu.models import llama


def test_gqa_matches_hf_mistral(rng):
    """num_key_value_heads < num_attention_heads: parity vs HF Mistral."""
    import torch
    from transformers import MistralConfig, MistralForCausalLM

    torch.manual_seed(0)
    hf_cfg = MistralConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        sliding_window=None, attn_implementation="eager", tie_word_embeddings=False,
    )
    model = MistralForCausalLM(hf_cfg).eval()
    cfg = llama.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, dtype=jnp.float32,
    )
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = llama.params_from_hf(state, cfg)

    ids = rng.integers(0, 256, size=(2, 10))
    with torch.no_grad():
        want = model(input_ids=torch.tensor(ids)).logits.numpy()
    e = llama.embed_tokens(params, jnp.asarray(ids))
    got = np.asarray(llama.forward(
        params, cfg, e, jnp.ones((2, 10), jnp.int32),
        jnp.broadcast_to(jnp.arange(10), (2, 10)))["logits"])
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_gqa_kv_cache_decode(rng):
    cfg = llama.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        dtype=jnp.float32,
    )
    import jax

    params = llama.init_params(cfg, jax.random.key(0))
    ids = rng.integers(0, 128, size=(1, 6))
    e = llama.embed_tokens(params, jnp.asarray(ids))
    full = np.asarray(llama.forward(
        params, cfg, e, jnp.ones((1, 6), jnp.int32), jnp.arange(6)[None])["logits"])
    cache = llama.KVCache.zeros(cfg, 1, 8, dtype=jnp.float32)
    assert cache.k.shape == (2, 1, 8, 2, 8)  # kv heads = 2
    out = llama.forward(params, cfg, e[:, :4],
                        jnp.zeros((1, 8), jnp.int32).at[:, :4].set(1),
                        jnp.arange(4)[None], cache=cache, cache_index=jnp.int32(0))
    step = llama.forward(params, cfg, e[:, 4:5],
                         jnp.zeros((1, 8), jnp.int32).at[:, :5].set(1),
                         jnp.full((1, 1), 4), cache=out["cache"], cache_index=jnp.int32(4))
    np.testing.assert_allclose(np.asarray(step["logits"][:, 0]), full[:, 4], atol=1e-4, rtol=1e-3)


def test_windowed_frame_decode():
    """apply_frame_transforms decodes windowed [W]-string image observations."""
    from openvla_probe_tpu.vla.datasets.rlds import dataset as rd

    g = np.random.default_rng(0)
    imgs = [tf.image.encode_jpeg(tf.constant(g.integers(0, 256, (64, 64, 3), dtype=np.uint8))).numpy()
            for _ in range(2)]

    def gen():
        yield {
            "observation": {"image_primary": np.array(imgs, object)},
            "action": g.normal(size=(2, 1, 7)).astype(np.float32),
        }

    ds = tf.data.Dataset.from_generator(
        gen,
        output_signature={
            "observation": {"image_primary": tf.TensorSpec((2,), tf.string)},
            "action": tf.TensorSpec((2, 1, 7), tf.float32),
        },
    )
    out = rd.apply_frame_transforms(ds, train=False, resize_size={"primary": (32, 32)})
    frame = next(iter(out.as_numpy_iterator()))
    assert frame["observation"]["image_primary"].shape == (2, 32, 32, 3)
    assert frame["observation"]["image_primary"].dtype == np.uint8
