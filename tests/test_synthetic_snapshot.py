"""Synthetic hub-snapshot fixture generator (scripts/make_synthetic_snapshot).

The full-scale dress rehearsal (VERDICT r3 #6) depends on this layout being
EXACTLY what huggingface_hub's offline snapshot resolution and our loaders
expect. Pinned at tiny scale: generate -> load_vla("openvla/openvla-7b")
with OVLA_HUB_OFFLINE=1 resolves the fixture, builds a servable OpenVLA with
norm stats and a working tokenizer.
"""

import json

import pytest


@pytest.fixture(scope="module")
def tiny_snapshot(tmp_path_factory):
    from scripts import make_synthetic_snapshot as mss

    out = tmp_path_factory.mktemp("hub")
    mss.main(mss.SnapshotConfig(out=str(out), scale="tiny"))
    return out


def test_layout_is_hub_cache_exact(tiny_snapshot):
    repo = tiny_snapshot / "models--openvla--openvla-7b"
    sha = (repo / "refs" / "main").read_text()
    snap = repo / "snapshots" / sha
    for name in ("config.json", "model.safetensors", "dataset_statistics.json",
                 "preprocessor_config.json", "processor_config.json",
                 "tokenizer.json", "tokenizer_config.json"):
        assert (snap / name).exists(), name
    cfg = json.loads((snap / "config.json").read_text())
    assert cfg["model_type"] == "openvla"
    assert "norm_stats" in cfg and "bridge_orig" in cfg["norm_stats"]


def test_load_vla_hub_id_offline(tiny_snapshot, monkeypatch):
    monkeypatch.setenv("OVLA_HUB_OFFLINE", "1")
    from openvla_probe_tpu.models.load import load_vla

    model = load_vla("openvla/openvla-7b", cache_dir=str(tiny_snapshot))
    assert "bridge_orig" in model.norm_stats
    ids = model.tokenizer.encode("put spoon on towel")
    assert ids[0] == 1 and all(i < model.cfg.vlm.llm.vocab_size for i in ids)
