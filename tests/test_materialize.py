"""VLA materialize factory + episodic dataset plumbing tests (TFDS-free where possible)."""

import numpy as np
import pytest
import tensorflow as tf

from openvla_probe_tpu.vla.datasets.datasets import EpisodicRLDSDataset, RLDSBatchTransform
from openvla_probe_tpu.vla.datasets.rlds import dataset as rlds_dataset
from openvla_probe_tpu.vla.action_tokenizer import ActionTokenizer


class FakeTok:
    vocab_size = 32000

    def encode(self, s):
        return [1] + [100 + (hash(w) % 1000) for w in s.split()]

    def decode(self, ids):
        return " ".join(map(str, ids))


def test_get_vla_dataset_and_collator_signature():
    """Factory wires transform + collator (dataset ctor needs TFDS; assert the
    pieces it returns are correctly constructed by building them directly)."""
    from openvla_probe_tpu.vla.materialize import get_vla_dataset_and_collator

    # full construction requires TFDS data on disk; validate the factory fails
    # cleanly at the data layer (not at wiring)
    with pytest.raises(Exception) as ei:
        get_vla_dataset_and_collator(
            "/nonexistent", "bridge_orig", lambda im: im, FakeTok(),
        )
    assert "tensorflow_datasets" in str(ei.value) or "No module" in str(ei.value) \
        or "not found" in str(ei.value).lower() or "nonexistent" in str(ei.value)


def test_episodic_dataset_on_synthetic_source(monkeypatch, rng):
    """EpisodicRLDSDataset yields whole trajectories of training examples."""
    imgs = [tf.image.encode_jpeg(tf.constant(
        rng.integers(0, 256, (64, 64, 3), dtype=np.uint8))).numpy() for _ in range(5)]

    def gen():
        yield {
            "observation": {"image_0": np.array(imgs, object),
                            "state": rng.normal(size=(5, 7)).astype(np.float32)},
            "action": rng.normal(size=(5, 7)).astype(np.float32),
            "language_instruction": np.array([b"stack the cups"] * 5, object),
        }

    def fake_source(split):
        return tf.data.Dataset.from_generator(
            gen,
            output_signature={
                "observation": {"image_0": tf.TensorSpec((None,), tf.string),
                                "state": tf.TensorSpec((None, 7), tf.float32)},
                "action": tf.TensorSpec((None, 7), tf.float32),
                "language_instruction": tf.TensorSpec((None,), tf.string),
            },
        )

    orig = rlds_dataset.make_dataset_from_rlds

    def patched(name, data_dir="", **kw):
        kw.pop("trajectory_dataset_fn", None)
        return orig(name, data_dir, trajectory_dataset_fn=fake_source, **kw)

    monkeypatch.setattr(rlds_dataset, "make_dataset_from_rlds", patched)

    tok = FakeTok()
    bt = RLDSBatchTransform(ActionTokenizer(tok), tok,
                            image_transform=lambda im: np.zeros((6, 8, 8), np.float32))
    ds = EpisodicRLDSDataset("/data", "bridge_orig", bt, resize_resolution=(32, 32))
    episode = next(iter(ds))
    # bridge_orig's standardize drops frame 0 and the relabel drops the last
    assert 2 <= len(episode) <= 5
    ex = episode[0]
    assert set(ex.keys()) == {"pixel_values", "input_ids", "labels", "dataset_name"}
    assert (np.asarray(ex["labels"])[:-8] == -100).all()
