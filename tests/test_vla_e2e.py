"""End-to-end parity: fused predict_action vs a torch reference twin.

The twin re-implements the reference serving semantics (SURVEY.md §3.1) from
spec on tiny HF modules: dual ViT -2-block features -> channel concat ->
fused projector -> splice after BOS -> greedy full-vocab argmax decode of
`action_dim` tokens -> 256-bin detokenize -> q01/q99 unnorm. Token-exact
agreement is the contract (greedy => bit-exact argmax is feasible).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openvla_probe_tpu.models import llama, projector, vit, vla, vlm
from openvla_probe_tpu.vla.action_tokenizer import ActionCodec

from hf_convert import dinov2_to_params, projector_params_to_torch, siglip_to_params

VOCAB = 512
A_DIM = 7


@pytest.fixture(scope="module")
def twin():
    import torch
    from transformers import (
        Dinov2WithRegistersConfig,
        Dinov2WithRegistersModel,
        LlamaConfig as HFLlamaConfig,
        LlamaForCausalLM,
        SiglipVisionConfig,
        SiglipVisionModel,
    )

    torch.manual_seed(7)
    hf_llama = LlamaForCausalLM(HFLlamaConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256, rms_norm_eps=1e-5,
        attn_implementation="eager", tie_word_embeddings=False,
    )).eval()
    hf_dino = Dinov2WithRegistersModel(Dinov2WithRegistersConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=2, image_size=28, patch_size=14,
        num_register_tokens=2, layerscale_value=1.0, hidden_act="gelu",
        layer_norm_eps=1e-6,
    )).eval()
    hf_siglip = SiglipVisionModel(SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=2, image_size=28, patch_size=14,
        hidden_act="gelu_pytorch_tanh", layer_norm_eps=1e-6,
    )).eval()

    cfg = vlm.VLMConfig(
        llm=llama.LlamaConfig.tiny(vocab_size=VOCAB),
        vision=(
            # HF dinov2 convention: pos over [cls, patches], regs inserted after cls
            vit.ViTConfig(
                image_size=28, patch_size=14, hidden_size=32, num_layers=3,
                num_heads=2, mlp_dim=64, use_cls_token=True, num_register_tokens=2,
                no_embed_class=False, use_layerscale=True, act="gelu",
            ),
            vit.ViTConfig(
                image_size=28, patch_size=14, hidden_size=32, num_layers=3,
                num_heads=2, mlp_dim=64, use_cls_token=False, act="gelu_tanh",
            ),
        ),
    )
    params = {
        "vision": {"dino": dinov2_to_params(hf_dino), "siglip": siglip_to_params(hf_siglip)},
        "projector": projector.init_params("fused-gelu-mlp", 64, 64, jax.random.key(3)),
        "llm": llama.params_from_hf(
            {k: v.detach().numpy() for k, v in hf_llama.state_dict().items()}, cfg.llm
        ),
    }
    torch_proj = projector_params_to_torch(params["projector"], "fused-gelu-mlp")
    serving = vla.VLAServingConfig(vlm=cfg, action_dim=A_DIM, prompt_pad_len=16,
                                   codec_vocab_size=VOCAB)
    return hf_llama, hf_dino, hf_siglip, torch_proj, cfg, params, serving


def torch_predict_action(hf_llama, hf_dino, hf_siglip, torch_proj, pixels, ids, q01, q99, mask):
    """Reference-semantics greedy predict_action (recomputes the full forward
    per step — slow but unambiguous)."""
    import torch

    with torch.no_grad():
        px = torch.tensor(pixels)
        dino_feats = hf_dino(pixel_values=px[:, :3], output_hidden_states=True).hidden_states[-2][:, 3:]
        sig_feats = hf_siglip(pixel_values=px[:, 3:], output_hidden_states=True).hidden_states[-2]
        patches = torch_proj(torch.cat([dino_feats, sig_feats], dim=2))

        cur = torch.tensor(ids)
        for _ in range(A_DIM):
            embeds = hf_llama.get_input_embeddings()(cur)
            mm = torch.cat([embeds[:, :1], patches, embeds[:, 1:]], dim=1)
            logits = hf_llama(inputs_embeds=mm).logits
            nxt = logits[:, -1].argmax(-1, keepdim=True)
            cur = torch.cat([cur, nxt], dim=1)
        toks = cur[:, ids.shape[1]:].numpy()

    codec = ActionCodec(vocab_size=VOCAB)
    norm = np.asarray(codec.decode(jnp.asarray(toks)))
    return toks, np.where(mask, 0.5 * (norm + 1) * (q99 - q01) + q01, norm)


@pytest.fixture(scope="module")
def example(rng=None):
    r = np.random.default_rng(42)
    pixels = r.normal(size=(1, 6, 28, 28)).astype(np.float32)
    # prompt: BOS + random tokens + 29871 — keep ids < VOCAB
    ids = np.array([[1, 17, 202, 33, 47, 29871 % VOCAB]], np.int64)
    ids[ids >= VOCAB] = VOCAB - 300
    q01 = r.uniform(-2, 0, A_DIM).astype(np.float32)
    q99 = r.uniform(0.5, 2, A_DIM).astype(np.float32)
    mask = np.array([True] * (A_DIM - 1) + [False])
    return pixels, ids, q01, q99, mask


def test_predict_action_token_exact(twin, example):
    hf_llama, hf_dino, hf_siglip, torch_proj, cfg, params, serving = twin
    pixels, ids, q01, q99, mask = example
    want_toks, want_actions = torch_predict_action(
        hf_llama, hf_dino, hf_siglip, torch_proj, pixels, ids, q01, q99, mask
    )

    P = serving.prompt_pad_len
    padded = np.zeros((1, P), np.int32)
    padded[0, : ids.shape[1]] = ids[0]
    out = vla.predict_action_core(
        params, serving,
        jnp.asarray(pixels), jnp.asarray(padded),
        prompt_len=jnp.asarray([ids.shape[1]], jnp.int32),
        q01=jnp.asarray(q01), q99=jnp.asarray(q99), action_mask=jnp.asarray(mask),
    )
    np.testing.assert_array_equal(np.asarray(out["action_tokens"]), want_toks)
    np.testing.assert_allclose(np.asarray(out["actions"]), want_actions, atol=1e-5, rtol=1e-4)


def test_padding_invariance(twin, example):
    """Same result regardless of the pad bucket size."""
    cfg, params, serving = twin[4], twin[5], twin[6]
    pixels, ids, q01, q99, mask = example

    results = []
    import dataclasses as dc
    for P in [8, 16]:
        s = dc.replace(serving, prompt_pad_len=P)
        padded = np.zeros((1, P), np.int32)
        padded[0, : ids.shape[1]] = ids[0]
        out = vla.predict_action_core(
            params, s, jnp.asarray(pixels), jnp.asarray(padded),
            prompt_len=jnp.asarray([ids.shape[1]], jnp.int32),
            q01=jnp.asarray(q01), q99=jnp.asarray(q99), action_mask=jnp.asarray(mask),
        )
        results.append(np.asarray(out["action_tokens"]))
    np.testing.assert_array_equal(results[0], results[1])


def test_batched_prompt_lengths(twin, example):
    """Batch with different prompt lengths == each row run alone."""
    cfg, params, serving = twin[4], twin[5], twin[6]
    pixels, ids, q01, q99, mask = example
    r = np.random.default_rng(3)

    pixels2 = np.concatenate([pixels, r.normal(size=pixels.shape).astype(np.float32)])
    P = serving.prompt_pad_len
    ids_b = np.zeros((2, P), np.int32)
    ids_b[0, : ids.shape[1]] = ids[0]
    row2 = np.array([1, 99, 403, 29871 % VOCAB], np.int32)
    ids_b[1, : len(row2)] = row2
    plen = np.array([ids.shape[1], len(row2)], np.int32)

    batch_out = vla.predict_action_core(
        params, serving, jnp.asarray(pixels2), jnp.asarray(ids_b),
        prompt_len=jnp.asarray(plen),
        q01=jnp.asarray(q01), q99=jnp.asarray(q99), action_mask=jnp.asarray(mask),
    )
    for b in range(2):
        solo = vla.predict_action_core(
            params, serving, jnp.asarray(pixels2[b : b + 1]), jnp.asarray(ids_b[b : b + 1]),
            prompt_len=jnp.asarray(plen[b : b + 1]),
            q01=jnp.asarray(q01), q99=jnp.asarray(q99), action_mask=jnp.asarray(mask),
        )
        np.testing.assert_array_equal(
            np.asarray(batch_out["action_tokens"])[b], np.asarray(solo["action_tokens"])[0]
        )


def test_hidden_state_capture_matches_twin(twin, example):
    """Prefill taps == torch twin's mean-pooled output_hidden_states on the
    un-appended sequence (reference capture runs without the trailing 29871)."""
    import torch

    hf_llama, hf_dino, hf_siglip, torch_proj, cfg, params, serving = twin
    pixels, ids, q01, q99, mask = example

    with torch.no_grad():
        px = torch.tensor(pixels)
        dino_feats = hf_dino(pixel_values=px[:, :3], output_hidden_states=True).hidden_states[-2][:, 3:]
        sig_feats = hf_siglip(pixel_values=px[:, 3:], output_hidden_states=True).hidden_states[-2]
        patches = torch_proj(torch.cat([dino_feats, sig_feats], dim=2))
        # capture forward runs on the sequence WITHOUT the trailing empty token
        cur = torch.tensor(ids[:, :-1])
        embeds = hf_llama.get_input_embeddings()(cur)
        mm = torch.cat([embeds[:, :1], patches, embeds[:, 1:]], dim=1)
        hs = hf_llama(inputs_embeds=mm, output_hidden_states=True).hidden_states
        want = np.stack([h.numpy().mean(axis=1) for h in hs], axis=1)

    P = serving.prompt_pad_len
    padded = np.zeros((1, P), np.int32)
    padded[0, : ids.shape[1]] = ids[0]
    out = vla.predict_action_core(
        params, serving, jnp.asarray(pixels), jnp.asarray(padded),
        prompt_len=jnp.asarray([ids.shape[1]], jnp.int32),
        q01=jnp.asarray(q01), q99=jnp.asarray(q99), action_mask=jnp.asarray(mask),
        collect_hidden_states=True,
    )
    got = np.asarray(out["hidden_pooled"])
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)


def test_openvla_wrapper(twin, example, tmp_path):
    """OpenVLA class surface: tokenizer + norm-stats + uint8 image path."""
    cfg, params, serving = twin[4], twin[5], twin[6]
    _, _, q01, q99, mask = example

    class FakeTok:
        def encode(self, s):
            return [1] + [(7 + 13 * i) % 400 for i in range(len(s.split()))]

    from openvla_probe_tpu.ops.image import BackboneTransformSpec, ImageTransformConfig

    img_cfg = ImageTransformConfig(
        specs=(
            BackboneTransformSpec((28, 28), "bicubic", (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
            BackboneTransformSpec((28, 28), "bicubic", (0.5, 0.5, 0.5), (0.5, 0.5, 0.5)),
        ),
        resize_strategy="resize-naive",
    )
    stats = {"bridge_orig": {"action": {"q01": q01, "q99": q99, "mask": mask}}}
    model = vla.OpenVLA(params, serving, FakeTok(), stats, img_cfg)

    img = np.random.default_rng(0).integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
    out = model.predict_action(img, "What action should the robot take to pick up the block?")
    assert out["actions"].shape == (A_DIM,)
    assert out["action_tokens"].shape == (A_DIM,)
    # masked-out gripper dim stays in [-1, 1]
    assert -1.0 <= out["actions"][-1] <= 1.0

    with pytest.raises(ValueError):
        model.predict_action(img, "x", unnorm_key="nonexistent")
