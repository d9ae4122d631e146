"""REST server tests: real HTTP round-trip against a stub model."""

import json
import urllib.request

import numpy as np
import pytest

from openvla_probe_tpu.serving.server import (
    OpenVLAServer,
    decode_numpy,
    encode_numpy,
    get_openvla_prompt,
)


class StubModel:
    def __init__(self):
        self.calls = []

    def predict_action(self, image, prompt, unnorm_key=None):
        self.calls.append({"shape": image.shape, "prompt": prompt, "unnorm_key": unnorm_key})
        return {"actions": np.arange(7, dtype=np.float32)}


@pytest.fixture
def server():
    stub = StubModel()
    srv = OpenVLAServer(stub)
    srv.run(host="127.0.0.1", port=0, background=True)
    yield srv, stub
    srv.shutdown()


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(encode_numpy(payload)).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, decode_numpy(json.loads(r.read()))
    except urllib.error.HTTPError as e:
        return e.code, decode_numpy(json.loads(e.read()))


def test_act_round_trip(server):
    srv, stub = server
    img = np.random.default_rng(0).integers(0, 256, (64, 64, 3), dtype=np.uint8)
    status, out = _post(srv.port, "/act", {"image": img, "instruction": "Pick Up The Cup",
                                           "unnorm_key": "bridge_orig"})
    assert status == 200
    np.testing.assert_allclose(out["action"], np.arange(7))
    call = stub.calls[-1]
    assert call["shape"] == (64, 64, 3)
    assert call["prompt"] == "In: What action should the robot take to pick up the cup?\nOut:"
    assert call["unnorm_key"] == "bridge_orig"


def test_numpy_json_round_trip():
    a = np.random.default_rng(1).normal(size=(3, 4)).astype(np.float32)
    b = decode_numpy(json.loads(json.dumps(encode_numpy({"x": a, "y": [1, 2]}))))
    np.testing.assert_array_equal(b["x"], a)
    assert b["y"] == [1, 2]


def test_missing_keys_is_400(server):
    srv, _ = server
    status, out = _post(srv.port, "/act", {"instruction": "x"})
    assert status == 400
    assert "image" in out["error"]


def test_unknown_path_is_404(server):
    srv, _ = server
    status, _ = _post(srv.port, "/nope", {})
    assert status == 404


def test_health(server):
    srv, _ = server
    with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/health") as r:
        assert json.loads(r.read())["status"] == "ok"


def test_v01_prompt():
    assert get_openvla_prompt("Do X", "prism-qwen25-v01").startswith("USER:")


class BatchStubModel:
    """Stub exposing predict_action_batch — counts batch sizes."""

    def __init__(self):
        self.batch_sizes = []

    def predict_action_batch(self, images, prompts, unnorm_keys=None):
        self.batch_sizes.append(len(prompts))
        return [{"actions": np.full(7, float(len(p)), np.float32)} for p in prompts]


def test_server_dynamic_batching_round_trip():
    import threading

    stub = BatchStubModel()
    srv = OpenVLAServer(stub, dynamic_batching=True, max_batch=8, max_wait_ms=50.0)
    assert srv.batcher is not None
    srv.run(host="127.0.0.1", port=0, background=True)
    try:
        img = np.zeros((32, 32, 3), np.uint8)
        outs = [None] * 4
        prompts = ["a" * (i + 1) for i in range(4)]

        def call(i):
            outs[i] = _post(srv.port, "/act", {"image": img, "instruction": prompts[i]})

        ts = [threading.Thread(target=call, args=(i,)) for i in range(4)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=60)
        for i in range(4):
            status, out = outs[i]
            assert status == 200
            # each request got ITS OWN result (value encodes the prompt length)
            want = len(get_openvla_prompt(prompts[i]))
            np.testing.assert_allclose(out["action"], np.full(7, want))
        assert max(stub.batch_sizes) >= 2  # requests actually batched
    finally:
        srv.shutdown()
        srv.batcher.shutdown()


def test_stats_endpoint():
    import urllib.request

    stub = BatchStubModel()
    srv = OpenVLAServer(stub, dynamic_batching=True, max_batch=4, max_wait_ms=5.0)
    srv.run(host="127.0.0.1", port=0, background=True)
    try:
        _post(srv.port, "/act", {"image": np.zeros((16, 16, 3), np.uint8),
                                 "instruction": "go"})
        with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/stats") as r:
            stats = json.loads(r.read())
        assert stats["dynamic_batching"] is True
        assert stats["requests"] >= 1 and stats["batches"] >= 1
        assert stats["max_batch"] == 4
        # client-observed latency percentiles ride the ring buffer
        lat = stats["latency_ms"]
        assert lat["count"] >= 1 and lat["p50"] <= lat["p95"] <= lat["p99"]
    finally:
        srv.shutdown()
        srv.batcher.shutdown()


class SpecStubModel:
    """Turbo-tier stub recording the draft_tokens the server passes."""

    class _Cfg:
        tier = "turbo"

    cfg = _Cfg()

    def __init__(self):
        self.drafts = []

    def predict_action(self, image, prompt, unnorm_key=None, draft_tokens=None):
        self.drafts.append(None if draft_tokens is None
                           else np.asarray(draft_tokens).copy())
        return {"actions": np.arange(7, dtype=np.float32),
                "action_tokens": np.arange(7) + 31000}


def test_speculative_stream_drafts():
    """A robot stream (stable stream_id) gets its previous step's tokens as
    verified-speculation drafts; streams are isolated; no stream_id => no
    draft. The bs=1 latency lever (66 vs 82 ms, PERF_r03.md) over plain HTTP."""
    stub = SpecStubModel()
    srv = OpenVLAServer(stub)
    assert srv._spec_streams
    srv.run(host="127.0.0.1", port=0, background=True)
    try:
        img = np.zeros((32, 32, 3), np.uint8)
        p = {"image": img, "instruction": "go", "stream_id": "robot-a"}
        _post(srv.port, "/act", p)
        assert stub.drafts[-1] is None                    # first step: no draft
        _post(srv.port, "/act", p)
        np.testing.assert_array_equal(stub.drafts[-1], np.arange(7) + 31000)
        _post(srv.port, "/act", {"image": img, "instruction": "go",
                                 "stream_id": "robot-b"})
        assert stub.drafts[-1] is None                    # new stream: no draft
        _post(srv.port, "/act", {"image": img, "instruction": "go"})
        assert stub.drafts[-1] is None                    # anonymous: no draft
        # /stats reports the stream table
        with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/stats") as r:
            stats = json.loads(r.read())
        assert stats["speculative_streams"] is True
        assert stats["active_streams"] == 2
    finally:
        srv.shutdown()


def test_parity_tier_never_drafts():
    """A parity-tier model must not receive drafts (its contract rejects
    them); the server detects the tier and disables stream speculation."""
    class ParityStub(SpecStubModel):
        class _Cfg:
            tier = "parity"
        cfg = _Cfg()

    stub = ParityStub()
    srv = OpenVLAServer(stub)
    assert not srv._spec_streams
    srv.run(host="127.0.0.1", port=0, background=True)
    try:
        img = np.zeros((32, 32, 3), np.uint8)
        p = {"image": img, "instruction": "go", "stream_id": "robot-a"}
        _post(srv.port, "/act", p)
        _post(srv.port, "/act", p)
        assert all(d is None for d in stub.drafts)
    finally:
        srv.shutdown()


def test_spec_acceptance_telemetry():
    """VERDICT r4 #6: drafted requests report accepted-token histogram +
    rolling acceptance rate on GET /stats, so an int4-speculative deployment
    degrading toward the sequential floor (thin trained-weight margins) is
    observable without a profiler."""
    class AcceptStub(SpecStubModel):
        accept_seq = [7, 7, 3]          # per-drafted-call n_accepted

        def predict_action(self, image, prompt, unnorm_key=None,
                           draft_tokens=None):
            out = super().predict_action(image, prompt, unnorm_key,
                                         draft_tokens)
            if draft_tokens is not None:
                out["n_accepted"] = np.asarray(
                    [self.accept_seq[sum(d is not None
                                         for d in self.drafts) - 1]])
            return out

    stub = AcceptStub()
    srv = OpenVLAServer(stub)
    srv.run(host="127.0.0.1", port=0, background=True)
    try:
        img = np.zeros((16, 16, 3), np.uint8)
        p = {"image": img, "instruction": "go", "stream_id": "r"}
        for _ in range(4):              # 1 undrafted + 3 drafted
            _post(srv.port, "/act", p)
        with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/stats") as r:
            stats = json.loads(r.read())
        spec = stats["speculative"]
        assert spec["drafted_requests"] == 3
        assert spec["accept_histogram"] == {"7": 2, "3": 1}
        assert spec["rolling_window"] == 3
        assert spec["rolling_accept_rate"] == round(17 / 21, 4)
        assert spec["rolling_full_accept_rate"] == round(2 / 3, 4)
    finally:
        srv.shutdown()


def test_stream_table_eviction():
    stub = SpecStubModel()
    srv = OpenVLAServer(stub, max_streams=2)
    srv.run(host="127.0.0.1", port=0, background=True)
    try:
        img = np.zeros((16, 16, 3), np.uint8)
        for sid in ("a", "b", "c"):
            _post(srv.port, "/act", {"image": img, "instruction": "go",
                                     "stream_id": sid})
        assert len(srv._stream_drafts) == 2
        assert "a" not in srv._stream_drafts      # oldest evicted
        # evicted stream re-registers draft-free
        _post(srv.port, "/act", {"image": img, "instruction": "go",
                                 "stream_id": "a"})
        assert stub.drafts[-1] is None
    finally:
        srv.shutdown()
