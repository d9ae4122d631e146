"""DevicePrefetcher (utils/prefetch.py): background collate+device_put must
be a drop-in for the serial loop — same batches, same order, clean shutdown."""

import threading
import time

import numpy as np
import pytest

import jax

from openvla_probe_tpu.utils.prefetch import DevicePrefetcher


def _collate(buf):
    return {"x": np.stack([b["x"] for b in buf]),
            "i": np.asarray([b["i"] for b in buf])}


def _to_device(batch):
    return {k: jax.numpy.asarray(v) for k, v in batch.items()}


def _source(n):
    for i in range(n):
        yield {"x": np.full((3,), i, np.float32), "i": i}


def test_equivalence_and_order():
    serial = []
    it = _source(12)
    while True:
        buf = [next(it, None) for _ in range(4)]
        if any(b is None for b in buf):
            break
        serial.append(_to_device(_collate(buf)))
    with DevicePrefetcher(_source(12), 4, _collate, _to_device, depth=2) as pf:
        fetched = list(pf)
    assert len(fetched) == len(serial) == 3
    for a, b in zip(fetched, serial):
        np.testing.assert_array_equal(np.asarray(a["x"]), np.asarray(b["x"]))
        np.testing.assert_array_equal(np.asarray(a["i"]), np.asarray(b["i"]))
        assert isinstance(a["x"], jax.Array)


def test_incomplete_final_batch_stops():
    # 10 examples / batch 4 -> 2 full batches, the ragged tail is dropped
    # (infinite RLDS streams never hit this; finite smoke sources do)
    with DevicePrefetcher(_source(10), 4, _collate, _to_device) as pf:
        assert len(list(pf)) == 2


def test_producer_exception_surfaces_in_order():
    def bad_source():
        yield {"x": np.zeros(3, np.float32), "i": 0}
        yield {"x": np.zeros(3, np.float32), "i": 1}
        raise ValueError("stream corrupted")

    with DevicePrefetcher(bad_source(), 2, _collate, _to_device) as pf:
        first = next(pf)   # the complete batch arrives first
        np.testing.assert_array_equal(np.asarray(first["i"]), [0, 1])
        with pytest.raises(ValueError, match="stream corrupted"):
            next(pf)


def test_close_unblocks_full_queue():
    """Producer blocked on a full queue must exit promptly on close()."""
    slow_drain = DevicePrefetcher(_source(100), 2, _collate, _to_device, depth=1)
    next(slow_drain)                  # producer refills; queue full again
    t0 = time.time()
    slow_drain.close()
    slow_drain._thread.join(timeout=5.0)
    assert not slow_drain._thread.is_alive()
    assert time.time() - t0 < 5.0
    with pytest.raises(StopIteration):
        next(slow_drain)


def test_overlap_actually_happens():
    """With depth=2 the producer works ahead while the consumer is busy."""
    produced = []

    def tracking_to_device(b):
        produced.append(int(np.asarray(b["i"])[0]))
        return b

    with DevicePrefetcher(_source(8), 2, _collate, tracking_to_device, depth=2) as pf:
        next(pf)
        # give the producer a moment: it should have prepared MORE than the
        # one batch the consumer took (double buffering)
        deadline = time.time() + 5.0
        while len(produced) < 2 and time.time() < deadline:
            time.sleep(0.01)
        assert len(produced) >= 2
        list(pf)
