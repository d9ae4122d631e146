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
    finally:
        srv.shutdown()
        srv.batcher.shutdown()
