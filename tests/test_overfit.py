"""End-to-end training sanity: the tiny VLA overfits a fixed micro-dataset.

Drives the full loop (DummyDataset-style examples -> collator -> jitted train
step with masked CE) and checks the in-graph action-token accuracy rises to
near 1.0 — the 'training actually learns' contract.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openvla_probe_tpu.models import vlm
from openvla_probe_tpu.training import OptimizerConfig, TrainState, make_optimizer, make_train_step
from openvla_probe_tpu.utils.collators import PaddedCollatorForActionPrediction
from openvla_probe_tpu.vla.action_tokenizer import ActionCodec, ActionTokenizer


class FakeTok:
    vocab_size = 512

    def encode(self, s):
        return [1] + [(13 + 31 * i) % 200 for i in range(len(s.split()))]

    def decode(self, ids):
        return " ".join(map(str, ids))


def test_overfit_micro_dataset():
    cfg = vlm.VLMConfig.tiny()
    params = vlm.init_params(cfg, jax.random.key(0))
    codec = ActionCodec(vocab_size=cfg.llm.vocab_size)
    tok = FakeTok()
    at = ActionTokenizer(tok)
    at.codec = codec  # tiny vocab codec
    g = np.random.default_rng(0)
    S = cfg.vision[0].image_size

    # 8 fixed examples: distinct images, distinct action token targets
    examples = []
    for i in range(8):
        ids = tok.encode(f"pick up object number {i} now")
        actions = g.uniform(-1, 1, 7)
        action_ids = (codec.vocab_size - np.digitize(actions, codec.bins)).tolist()
        input_ids = np.asarray(ids + action_ids + [2], np.int64)
        labels = input_ids.copy()
        labels[: -(7 + 1)] = -100
        examples.append({
            "pixel_values": g.normal(size=(6, S, S)).astype(np.float32),
            "input_ids": input_ids,
            "labels": labels,
        })

    collator = PaddedCollatorForActionPrediction(pad_token_id=0, length_buckets=(32,))
    batch = {k: jnp.asarray(v) for k, v in collator(examples).items()}

    opt = make_optimizer(
        OptimizerConfig(learning_rate=2e-3, lr_schedule_type="constant", max_steps=100),
        params,
    )
    state = TrainState.create(params, opt)
    step = make_train_step(cfg, opt, codec=codec, donate=False)

    accs, losses = [], []
    for _ in range(60):
        state, m = step(state, batch)
        accs.append(float(m["action_accuracy"]))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])
    assert accs[-1] > 0.8, accs[-5:]
    assert float(m["l1_loss"]) < 0.1
