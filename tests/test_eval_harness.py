"""Eval harness tests: normalization, metrics, closed-set + open-ended flows."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openvla_probe_tpu.eval import (
    EvalExample,
    evaluate_closed_set,
    evaluate_open_ended,
    exact_match,
    load_jsonl_dataset,
    normalize_answer,
    vqa_accuracy,
)
from openvla_probe_tpu.eval.harness import _continuation_ids
from openvla_probe_tpu.models import generate as gen, vlm
from openvla_probe_tpu.models.prompting import PromptBuilder


class FakeTok:
    vocab_size = 512

    def encode(self, s):
        return [1] + [50 + (hash(w) % 400) for w in s.split()]

    def decode(self, ids, skip_special_tokens=False):
        return " ".join(f"t{i}" for i in ids)


def test_normalize_answer():
    assert normalize_answer("The  red Ball!") == "red ball"
    assert normalize_answer("a, an, the") == ""
    assert normalize_answer("it's blue-green") == "it s blue green"


def test_exact_match_and_vqa_accuracy():
    assert exact_match("The cat", ["cat", "dog"]) == 1.0
    assert exact_match("bird", ["cat", "dog"]) == 0.0
    # <3 answers -> exact match semantics
    assert vqa_accuracy("cat", ["cat"]) == 1.0
    # VQAv2 soft accuracy: 2 of 10 annotators -> 2/3
    answers = ["cat", "cat"] + ["dog"] * 8
    assert vqa_accuracy("the cat", answers) == pytest.approx(2 / 3)
    assert vqa_accuracy("dog", answers) == 1.0


def test_continuation_ids_splits_at_boundary():
    tok = FakeTok()
    ids = _continuation_ids(tok, "In: q\nOut: ", "hello world")
    # suffix of the full tokenization, non-empty
    full = tok.encode("In: q\nOut: hello world")
    assert ids == full[len(full) - len(ids):]
    assert len(ids) >= 1


def test_load_jsonl_dataset(tmp_path):
    from PIL import Image

    img = tmp_path / "x.jpg"
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(img)
    p = tmp_path / "eval.jsonl"
    rows = [
        {"question": "Q1", "choices": ["a", "b"], "answer_idx": 1, "image": "x.jpg"},
        {"question": "Q2", "answer": "yes"},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    ex = load_jsonl_dataset(str(p), image_root=str(tmp_path))
    assert len(ex) == 2
    assert ex[0].choices == ["a", "b"] and ex[0].answer_idx == 1
    assert ex[0].image.shape == (8, 8, 3)
    assert ex[1].answers == ["yes"] and ex[1].image is None
    only = load_jsonl_dataset(str(p), image_root=str(tmp_path), max_examples=1)
    assert len(only) == 1 and only[0].question == "Q1"


def test_closed_set_with_injected_scorer():
    calls = []

    def score_fn(params, cfg, rows, pixel_values=None):
        calls.append([(list(f), s) for f, s in rows])
        # prefer the LONGEST candidate (deterministic, content-dependent)
        return np.asarray([float(len(f) - s) for f, s in rows])

    examples = [
        EvalExample(question="pick the long one",
                    choices=["a", "much longer answer text"], answer_idx=1),
        EvalExample(question="pick short", choices=["longer answer", "a"], answer_idx=1),
    ]
    report = evaluate_closed_set(
        params={}, cfg=None, tokenizer=FakeTok(), examples=examples,
        score_fn=score_fn,
    )
    assert report["n"] == 2
    assert report["results"][0]["correct"] is True
    assert report["results"][1]["correct"] is False
    assert report["accuracy"] == 0.5
    # cross-example batching: both examples' rows share ONE scorer call
    assert len(calls) == 1 and len(calls[0]) == 4

    # per-example fallback (examples_per_batch=1) gives identical results
    calls.clear()
    solo = evaluate_closed_set(
        params={}, cfg=None, tokenizer=FakeTok(), examples=examples,
        score_fn=score_fn, examples_per_batch=1,
    )
    assert len(calls) == 2
    assert [r["predicted_idx"] for r in solo["results"]] == \
        [r["predicted_idx"] for r in report["results"]]
    assert [r["scores"] for r in solo["results"]] == \
        [r["scores"] for r in report["results"]]

    # length normalization flips the longest-total-score preference
    report = evaluate_closed_set(
        params={}, cfg=None, tokenizer=FakeTok(), examples=examples,
        score_fn=score_fn, length_normalize=True,
    )
    # per-token score now 1.0 for every candidate -> argmax = first index
    assert report["results"][0]["predicted_idx"] == 0


def test_open_ended_with_injected_generator():
    def generate_fn(params, cfg, tokenizer, prompt_ids, pixel_values):
        return "The Cat!"

    examples = [
        EvalExample(question="what animal?", answers=["cat"]),
        EvalExample(question="what color?", answers=["blue"]),
    ]
    report = evaluate_open_ended(
        params={}, cfg=None, tokenizer=FakeTok(), examples=examples,
        generate_fn=generate_fn, metric="exact",
    )
    assert report["accuracy"] == 0.5
    assert report["results"][0]["accuracy"] == 1.0


def test_closed_set_real_tiny_model_self_consistency():
    """With the real scorer on a tiny model: the model's own greedy
    continuation must win against an arbitrary alternative."""
    cfg = vlm.VLMConfig.tiny()
    params = vlm.init_params(cfg, jax.random.key(0))
    tok = FakeTok()

    prompt = "In: what? \nOut: "
    prompt_ids = tok.encode(prompt)
    g = np.random.default_rng(0)
    image = g.integers(0, 256, (28, 28, 3), dtype=np.uint8)

    from openvla_probe_tpu.ops.image import (
        BackboneTransformSpec,
        ImageTransformConfig,
        apply_image_transform,
    )

    s = cfg.vision[0].image_size
    img_cfg = ImageTransformConfig(specs=(
        BackboneTransformSpec((s, s), "bicubic", (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
        BackboneTransformSpec((s, s), "bicubic", (0.5, 0.5, 0.5), (0.5, 0.5, 0.5)),
    ))
    px = apply_image_transform(jnp.asarray(image[None]), img_cfg).astype(cfg.llm.dtype)

    # model's own greedy 2-token continuation
    P = 8
    padded = np.zeros((1, P), np.int32)
    padded[0, : len(prompt_ids)] = prompt_ids
    greedy = [int(t) for t in np.asarray(gen._generate_jit(
        params, cfg, jnp.asarray(padded), jnp.asarray([len(prompt_ids)], jnp.int32),
        px, 2,
    ))[0]]

    class GreedyAwareTok(FakeTok):
        def encode(self, s):
            if s.endswith("GREEDY"):
                return super().encode(s[: -len("GREEDY")]) + greedy
            if s.endswith("ALT"):
                return super().encode(s[: -len("ALT")]) + [5, 6]
            return super().encode(s)

    examples = [EvalExample(question="what?", choices=["GREEDY", "ALT"],
                            answer_idx=0, image=image)]
    report = evaluate_closed_set(
        params=params, cfg=cfg, tokenizer=GreedyAwareTok(), examples=examples,
        image_cfg=img_cfg,
        prompt_builder_factory=lambda: PromptBuilder("pure"),
    )
    assert report["accuracy"] == 1.0
    assert report["results"][0]["scores"][0] > report["results"][0]["scores"][1]


def test_continuation_split_per_candidate_context():
    from openvla_probe_tpu.eval.harness import _continuation_split

    class MergeTok:
        """Simulates the sentencepiece boundary re-merge: a trailing space
        token merges with 'blue' but not with '7'."""

        def encode(self, s):
            if s.endswith("Out: "):
                return [1, 10, 99]          # 99 = lone trailing space
            if s.endswith("Out: blue"):
                return [1, 10, 77]          # re-merged "▁blue" (99 gone)
            if s.endswith("Out: 7"):
                return [1, 10, 99, 55]      # no merge
            return [1, 10]

    tok = MergeTok()
    full_b, i_b = _continuation_split(tok, "Out: ", "blue")
    assert full_b == [1, 10, 77] and i_b == 2    # context EXCLUDES the stale 99
    full_7, i_7 = _continuation_split(tok, "Out: ", "7")
    assert full_7 == [1, 10, 99, 55] and i_7 == 3


def test_continuation_split_rejects_absorbed():
    from openvla_probe_tpu.eval.harness import _continuation_split

    class AbsorbTok:
        def encode(self, s):
            return [1, 10, 99]  # continuation adds nothing

    with pytest.raises(ValueError, match="adds no tokens"):
        _continuation_split(AbsorbTok(), "Out: ", "")


def test_loader_resolves_answer_to_index(tmp_path):
    p = tmp_path / "eval2.jsonl"
    rows = [{"question": "Q", "choices": ["a", "b"], "answer": "b"}]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    ex = load_jsonl_dataset(str(p))
    assert ex[0].answer_idx == 1


def test_closed_set_missing_answer_idx_skips_or_raises():
    examples = [
        EvalExample(question="q", choices=["a", "b"], answer_idx=-1),
        EvalExample(question="ok", choices=["a", "b"], answer_idx=0),
    ]
    score = lambda *a, **k: np.asarray([1.0, 0.0])
    # default: skip loudly, the rest of the run completes
    report = evaluate_closed_set(params={}, cfg=None, tokenizer=FakeTok(),
                                 examples=examples, score_fn=score)
    assert report["n"] == 1 and report["n_skipped"] == 1
    assert "answer_idx" in report["skipped"][0]["error"]
    assert report["accuracy"] == 1.0
    # strict: raise (CI/regression mode)
    with pytest.raises(ValueError, match="answer_idx"):
        evaluate_closed_set(params={}, cfg=None, tokenizer=FakeTok(),
                            examples=examples, score_fn=score, strict=True)


def test_open_ended_batched_generator_default():
    """Without generate_fn, examples batch into ONE generate_batch_fn call,
    and results match the per-example legacy path."""
    calls = []

    def batch_fn(params, cfg, tokenizer, prompts_ids, pixel_values):
        calls.append(len(prompts_ids))
        return ["cat" if len(p) > 6 else "blue" for p in prompts_ids]

    examples = [
        EvalExample(question="what animal is that over there?", answers=["cat"]),
        EvalExample(question="what color?", answers=["blue"]),
    ]
    report = evaluate_open_ended(
        params={}, cfg=None, tokenizer=FakeTok(), examples=examples,
        generate_batch_fn=batch_fn, metric="exact",
    )
    assert calls == [2]  # one batched call for both examples
    assert report["accuracy"] == 1.0 and report["n"] == 2

    # examples_per_batch=1 degenerates to per-example calls, same results
    calls.clear()
    solo = evaluate_open_ended(
        params={}, cfg=None, tokenizer=FakeTok(), examples=examples,
        generate_batch_fn=batch_fn, metric="exact", examples_per_batch=1,
    )
    assert calls == [1, 1]
    assert [r["prediction"] for r in solo["results"]] == \
        [r["prediction"] for r in report["results"]]


def test_generate_greedy_batch_matches_single():
    """Batched greedy generation returns exactly the per-prompt outputs
    (mixed prompt lengths, text-only)."""
    cfg = vlm.VLMConfig.tiny()
    params = vlm.init_params(cfg, jax.random.key(0))
    tok = FakeTok()
    prompts = [
        tok.encode("In: hello world \nOut: "),
        tok.encode("In: a much longer question with many more words here \nOut: "),
        tok.encode("In: q \nOut: "),
    ]
    singles = [gen.generate_greedy(params, cfg, tok, p, max_new_tokens=5)
               for p in prompts]
    batched = gen.generate_greedy_batch(params, cfg, tok, prompts,
                                        max_new_tokens=5)
    assert batched == singles


def test_open_ended_real_model_batched_equals_solo():
    cfg = vlm.VLMConfig.tiny()
    params = vlm.init_params(cfg, jax.random.key(0))
    tok = FakeTok()
    examples = [
        EvalExample(question="what animal?", answers=["cat"], example_id="0"),
        EvalExample(question="what color is the sky today?", answers=["blue"],
                    example_id="1"),
        EvalExample(question="how many?", answers=["three"], example_id="2"),
    ]
    batched = evaluate_open_ended(params=params, cfg=cfg, tokenizer=tok,
                                  examples=examples, max_new_tokens=4,
                                  metric="exact")
    solo = evaluate_open_ended(params=params, cfg=cfg, tokenizer=tok,
                               examples=examples, max_new_tokens=4,
                               metric="exact", examples_per_batch=1)
    assert [r["prediction"] for r in batched["results"]] == \
        [r["prediction"] for r in solo["results"]]


def test_generate_sampling_modes():
    """Greedy unchanged; sampling is deterministic per seed, varies across
    seeds, and temperature->0 collapses to greedy."""
    cfg = vlm.VLMConfig.tiny()
    params = vlm.init_params(cfg, jax.random.key(0))
    tok = FakeTok()
    ids = tok.encode("In: hello world what is this \nOut: ")

    g0 = gen.generate_text(params, cfg, tok, ids, max_new_tokens=6)
    g1 = gen.generate_greedy(params, cfg, tok, ids, max_new_tokens=6)
    assert g0 == g1

    s_a = gen.generate_text(params, cfg, tok, ids, max_new_tokens=6,
                            do_sample=True, temperature=5.0, seed=1)
    s_a2 = gen.generate_text(params, cfg, tok, ids, max_new_tokens=6,
                             do_sample=True, temperature=5.0, seed=1)
    assert s_a == s_a2  # deterministic per seed
    outs = {gen.generate_text(params, cfg, tok, ids, max_new_tokens=6,
                              do_sample=True, temperature=5.0, seed=s)
            for s in range(6)}
    assert len(outs) > 1  # high temperature actually samples

    cold = gen.generate_text(params, cfg, tok, ids, max_new_tokens=6,
                             do_sample=True, temperature=1e-4, seed=3)
    assert cold == g0  # temperature -> 0 collapses to greedy
