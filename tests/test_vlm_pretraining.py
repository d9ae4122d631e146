"""VLM pretraining data + sampler + greedy generation tests."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openvla_probe_tpu.models import generate as gen, vlm
from openvla_probe_tpu.models.prompting import PurePromptBuilder
from openvla_probe_tpu.preprocessing.datasets import (
    IGNORE_INDEX,
    AlignDataset,
    FinetuneDataset,
    get_dataset_and_collator,
)
from openvla_probe_tpu.utils.batching import SplitModalitySampler


class FakeTok:
    vocab_size = 512

    def encode(self, s):
        return [1] + [50 + (hash(w) % 400) for w in s.split()]

    def decode(self, ids, skip_special_tokens=False):
        return " ".join(f"t{i}" for i in ids)


@pytest.fixture
def llava_style_data(tmp_path):
    from PIL import Image

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    g = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(g.integers(0, 256, (32, 32, 3), dtype=np.uint8)).save(img_dir / f"{i}.jpg")
    examples = [
        {"image": "0.jpg", "conversations": [
            {"from": "human", "value": "<image>\nDescribe."},
            {"from": "gpt", "value": "a red cube on a table"}]},
        {"image": "1.jpg", "conversations": [
            {"from": "human", "value": "What is here? <image>"},
            {"from": "gpt", "value": "a blue ball"},
            {"from": "human", "value": "And color?"},
            {"from": "gpt", "value": "blue"}]},
        {"conversations": [
            {"from": "human", "value": "Just chat."},
            {"from": "gpt", "value": "sure"}]},
    ]
    p = tmp_path / "chat.json"
    p.write_text(json.dumps(examples))
    return p, img_dir


def test_align_dataset(llava_style_data):
    p, img_dir = llava_style_data
    ds = AlignDataset(p, img_dir, lambda im: np.zeros((6, 8, 8), np.float32), FakeTok())
    ex = ds[0]
    assert ex["labels"][0] == IGNORE_INDEX       # BOS masked
    assert (ex["labels"][1:] != IGNORE_INDEX).all()
    assert ds.get_modality_lengths()[0][0] is True
    assert ds.get_modality_lengths()[2][0] is False


def test_finetune_dataset_masks_human_turns(llava_style_data):
    p, img_dir = llava_style_data
    ds = FinetuneDataset(p, img_dir, lambda im: np.zeros((6, 8, 8), np.float32),
                         FakeTok(), PurePromptBuilder)
    ex = ds[1]
    labels = ex["labels"]
    assert (labels == IGNORE_INDEX).sum() > 0    # human turns masked
    assert (labels != IGNORE_INDEX).sum() > 0    # gpt turns kept
    assert ds[2]["pixel_values"] is None         # text-only example


def test_stage_factory(llava_style_data):
    p, img_dir = llava_style_data
    ds, coll = get_dataset_and_collator(
        "align", (p, img_dir), lambda im: np.zeros((6, 8, 8), np.float32),
        FakeTok(), PurePromptBuilder,
    )
    batch = coll([ds[0], ds[1]])
    assert batch["input_ids"].shape[0] == 2
    with pytest.raises(ValueError):
        get_dataset_and_collator("nope", (p, img_dir), None, None, None)


def test_split_modality_sampler():
    g = np.random.default_rng(0)
    lengths = [(bool(i % 2), int(g.integers(5, 50))) for i in range(64)]
    sampler = SplitModalitySampler(lengths, global_batch_size=8, num_replicas=2, rank=0)
    idxs = list(sampler)
    assert len(idxs) == len(sampler)
    # reconstruct global batches from both replicas: each batch single-modality
    s1 = SplitModalitySampler(lengths, global_batch_size=8, num_replicas=2, rank=1)
    idxs1 = list(s1)
    for b in range(len(idxs) // 4):
        batch = idxs[b * 4 : (b + 1) * 4] + idxs1[b * 4 : (b + 1) * 4]
        mods = {lengths[i][0] for i in batch}
        assert len(mods) == 1, f"mixed-modality batch {batch}"
    # deterministic per epoch
    assert list(sampler) == idxs
    sampler.set_epoch(1)
    assert list(sampler) != idxs


def test_greedy_generation_with_eos():
    cfg = vlm.VLMConfig.tiny()
    params = vlm.init_params(cfg, jax.random.key(0))
    tok = FakeTok()
    text = gen.generate_greedy(
        params, cfg, tok, [1, 7, 12], pixel_values=None, max_new_tokens=6
    )
    assert isinstance(text, str)


def test_score_candidates_prefers_forced_token():
    cfg = vlm.VLMConfig.tiny()
    params = vlm.init_params(cfg, jax.random.key(0))
    g = np.random.default_rng(0)
    px = jnp.asarray(g.normal(size=(1, 6, 28, 28)).astype(np.float32))
    prompt = [1, 9, 33]
    # candidate equal to the model's own greedy continuation must out-score a random one
    full = gen._generate_jit(
        params, cfg, jnp.asarray([prompt + [0] * 5], jnp.int32)[:, :8],
        jnp.asarray([3], jnp.int32), px, 2,
    )
    greedy = [int(t) for t in np.asarray(full)[0]]
    scores = gen.score_candidates(params, cfg, prompt, [greedy, [5, 6]], pixel_values=px)
    assert scores[0] > scores[1]


def test_mixed_batch_unimodal_rows_match_unspliced_forward():
    """A text-only row inside a mixed batch must compute EXACTLY the
    unspliced unimodal forward (regression: zero-image patches previously
    leaked into text-only rows with attention mask 1)."""
    from openvla_probe_tpu.models.llama import LlamaConfig
    from openvla_probe_tpu.models.vit import ViTConfig

    cfg = vlm.VLMConfig(
        llm=LlamaConfig.tiny(),
        vision=(ViTConfig.tiny(num_register_tokens=4, no_embed_class=True), ViTConfig.tiny()),
        vision_names=("dino", "siglip"),
        arch_specifier="no-align+fused-gelu-mlp",
    )
    params = vlm.init_params(cfg, jax.random.key(0))
    r = np.random.default_rng(0)
    B, T, S = 3, 9, cfg.vision[0].image_size
    ids = jnp.asarray(r.integers(3, 500, (B, T)), jnp.int32)
    am = np.ones((B, T), np.int64)
    am[1, 7:] = 0
    pixels = jnp.asarray(r.normal(size=(B, 6, S, S)), jnp.float32)
    labels = jnp.asarray(r.integers(3, 500, (B, T)))
    is_mm = jnp.asarray([True, False, True])

    out = vlm.forward(params, cfg, ids, jnp.asarray(am), pixels, labels,
                      multimodal_mask=is_mm)
    N = cfg.num_patches

    # ground truth for the text-only row: plain unimodal forward
    uni = vlm.forward(params, cfg, ids[1:2], jnp.asarray(am[1:2]), None, labels[1:2])
    # text tokens of row 1 sit at spliced slots [0] + [1+N ..); compare the
    # next-token logits AT THE TEXT SLOTS (BOS slot predicts an IGNORE patch
    # label in the spliced layout, so loss-relevant slots start at 1+N)
    got_text = np.asarray(out["logits"][1, 1 + N:, :])
    want_text = np.asarray(uni["logits"][0, 1:, :])
    np.testing.assert_allclose(got_text[:6], want_text[:6], atol=2e-4, rtol=1e-3)

    # multimodal rows are unchanged vs the all-multimodal path
    full = vlm.forward(params, cfg, ids, jnp.asarray(am), pixels, labels)
    np.testing.assert_allclose(np.asarray(out["logits"][0]), np.asarray(full["logits"][0]),
                               atol=1e-5)
