"""The unified parity ledger (VERDICT r4 #8): PARITY_LEDGER.jsonl must stay
schema-valid, and the collector must reproduce it from the per-round
narrative files (append-only provenance)."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from scripts import parity_ledger as pl  # noqa: E402


def test_shipped_ledger_validates():
    n = pl.validate()
    assert n >= 15


def test_every_narrative_line_is_in_ledger():
    ledger = [json.loads(l) for l in pl.LEDGER.read_text().splitlines()]
    for src in ("PARITY_r02.md", "PARITY_r03.md", "PARITY_r04.md"):
        n_src = sum(1 for l in (REPO / src).read_text().splitlines()
                    if l.startswith("{"))
        n_led = sum(1 for d in ledger if d.get("source") == src)
        assert n_led == n_src, (src, n_led, n_src)


def test_schema_rejects_bad_lines():
    with pytest.raises(ValueError, match="missing keys"):
        pl.validate_line({"kind": "trained_weight_certificate",
                          "backend": "tpu"})
    with pytest.raises(ValueError, match="unclassifiable"):
        pl.classify({"foo": 1})
    with pytest.raises(ValueError, match="rates"):
        pl.validate_line({"kind": "random_weight_check", "backend": "tpu",
                          "n_images": 1, "per_dim_agreement": [1.5],
                          "overall_agreement": 1.0, "max_bin_drift": 0})


def test_append_is_validated(tmp_path, monkeypatch):
    monkeypatch.setattr(pl, "LEDGER", tmp_path / "ledger.jsonl")
    good = {"kind": "multilora_certificate", "backend": "cpu",
            "n_adapters": 2, "positions_checked": 14,
            "mixed_vs_single_mismatches": 0}
    pl.append(json.dumps(good))
    assert json.loads(pl.LEDGER.read_text())["n_adapters"] == 2
    with pytest.raises(ValueError):
        pl.append(json.dumps({"kind": "multilora_certificate"}))


def test_cli_validate():
    r = subprocess.run([sys.executable,
                        str(REPO / "scripts" / "parity_ledger.py"),
                        "validate"], capture_output=True, text=True,
                       cwd=str(REPO))
    assert r.returncode == 0, r.stderr
    assert json.loads(r.stdout)["valid"] >= 15
