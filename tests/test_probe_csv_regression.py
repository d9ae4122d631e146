"""Regression of the probe CSV artifacts against the reference's PUBLISHED files.

Fixtures under tests/fixtures/probe_csvs/ are verbatim (or row-sampled, for
the two 14k-row files) copies of the reference fork's published artifacts:
experiment_images/{probe_metrics_clean,probe_metrics_dual_head_final,
probe_metrics_3class_direct,label_stats,per_label_metrics}.csv and
analysis/{family_auprc,per_label_metrics}.csv. They pin (a) the exact column
schemas our writers must emit, and (b) the metric identities our analysis
stack shares with the reference's (f1 = 2PR/(P+R), lift = auprc/prior,
count/fraction consistency).
"""

import csv
import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

from openvla_probe_tpu.probe.analysis import (
    REFERENCE_CSV_SCHEMAS,
    family_auprc,
    per_label_metrics,
    write_reference_csv,
)

FIXDIR = Path(__file__).parent / "fixtures" / "probe_csvs"


def _load_regress():
    spec = importlib.util.spec_from_file_location(
        "regress_probe_csvs", Path(__file__).parents[1] / "scripts" / "regress_probe_csvs.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


regress = _load_regress()


def _header(path: Path):
    with open(path, newline="") as f:
        return next(csv.reader(f))


# ---- published fixtures validate clean under our invariants -----------------

@pytest.mark.parametrize("name", sorted(p.name for p in FIXDIR.glob("*.csv")))
def test_published_fixture_validates(name):
    problems = regress.validate_file(FIXDIR / name)
    assert problems == []


def test_detect_kind_both_per_label_variants():
    k_img = regress.detect_kind(
        Path("per_label_metrics.csv"), _header(FIXDIR / "per_label_metrics_sample.csv")
    )
    k_ana = regress.detect_kind(
        Path("per_label_metrics.csv"), _header(FIXDIR / "per_label_metrics_analysis_sample.csv")
    )
    assert (k_img, k_ana) == ("per_label", "per_label_auprc")


# ---- our writers emit byte-identical headers to the published artifacts -----

@pytest.mark.parametrize(
    "kind,fixture",
    [
        ("binary", "probe_metrics_clean.csv"),
        ("dual", "probe_metrics_dual_head_final.csv"),
        ("3class", "probe_metrics_3class_direct.csv"),
        ("per_label", "per_label_metrics_sample.csv"),
        ("per_label_auprc", "per_label_metrics_analysis_sample.csv"),
        ("family_auprc", "family_auprc.csv"),
        ("label_stats", "label_stats_sample.csv"),
    ],
)
def test_writer_header_matches_published(kind, fixture, tmp_path):
    out = write_reference_csv(kind, [], tmp_path / "out.csv")
    assert _header(out) == _header(FIXDIR / fixture)
    assert _header(out) == REFERENCE_CSV_SCHEMAS[kind]


# ---- the published family table satisfies OUR lift formula ------------------

def test_published_family_lift_matches_our_formula():
    with open(FIXDIR / "family_auprc.csv", newline="") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 8  # the 8 predicate families of the LIBERO-object probe set
    for r in rows:
        ours = float(r["auprc"]) / float(r["prior"])
        assert abs(ours - float(r["lift"])) <= 1e-5 * max(1.0, ours)


# ---- end-to-end: our pipeline's CSVs pass the same validator ----------------

def _synthetic_collected(seed=0, layers=(0, 1), n=400, k=6):
    rng = np.random.default_rng(seed)
    names = [f"behind obj_{i} region_{i}" if i % 2 else f"inside obj_{i} region_{i}" for i in range(k)]
    out = {}
    targets = rng.choice([-1, 0, 1], size=(n, k), p=[0.2, 0.4, 0.4]).astype(np.int32)
    for L in layers:
        # logits correlated with targets so metrics are non-degenerate
        logits = 2.0 * (targets == 1) - 1.0 + rng.normal(0, 1.0, size=(n, k))
        out[L] = {"logits": logits.astype(np.float32), "targets": targets}
    return out, names


def test_our_pipeline_csvs_pass_validator(tmp_path):
    collected, names = _synthetic_collected()
    rows = per_label_metrics(collected, label_names=names)
    fam = family_auprc(collected, label_names=names)
    p1 = write_reference_csv("per_label_auprc", rows, tmp_path / "per_label_metrics.csv")
    p2 = write_reference_csv("family_auprc", fam, tmp_path / "family_auprc.csv")
    assert regress.validate_file(p1) == []
    assert regress.validate_file(p2) == []


def test_label_stats_rows_pass_validator(tmp_path):
    from openvla_probe_tpu.probe.plots import label_stats_rows

    rng = np.random.default_rng(1)
    names = [f"behind obj_{i} r_{i}" for i in range(5)]
    eps = [
        {
            "symbolic_state_object_relations": rng.choice([-1, 0, 1], size=(50, 3)),
            "symbolic_state_action_subgoals": rng.choice([-1, 0, 1], size=(50, 2)),
        }
        for _ in range(3)
    ]
    rows = label_stats_rows(eps, names)
    assert len(rows) == 5
    out = write_reference_csv("label_stats", rows, tmp_path / "label_stats.csv")
    assert regress.validate_file(out) == []
    assert _header(out) == _header(FIXDIR / "label_stats_sample.csv")


# ---- compare mode: identical passes, perturbed fails -------------------------

def test_compare_identical_and_perturbed(tmp_path):
    pub = FIXDIR / "family_auprc.csv"
    same = tmp_path / "family_auprc.csv"
    same.write_text(pub.read_text())
    probs, maxdiff = regress.compare_files(same, pub, rtol=0.0, atol=0.0)
    assert probs == []
    assert all(d == 0.0 for d in maxdiff.values())

    with open(pub, newline="") as f:
        rows = list(csv.DictReader(f))
    rows[0]["auprc"] = str(float(rows[0]["auprc"]) + 0.1)
    pert = tmp_path / "pert" / "family_auprc.csv"
    pert.parent.mkdir()
    with open(pert, "w", newline="") as f:
        wr = csv.DictWriter(f, fieldnames=REFERENCE_CSV_SCHEMAS["family_auprc"])
        wr.writeheader()
        wr.writerows(rows)
    probs, _ = regress.compare_files(pert, pub, rtol=0.02, atol=0.02)
    assert len(probs) == 1 and "auprc" in probs[0]


def test_compare_detects_missing_rows(tmp_path):
    pub = FIXDIR / "family_auprc.csv"
    with open(pub, newline="") as f:
        rows = list(csv.DictReader(f))
    short = tmp_path / "family_auprc.csv"
    with open(short, "w", newline="") as f:
        wr = csv.DictWriter(f, fieldnames=REFERENCE_CSV_SCHEMAS["family_auprc"])
        wr.writeheader()
        wr.writerows(rows[:-2])
    probs, _ = regress.compare_files(short, pub, rtol=1.0, atol=1.0)
    assert any("absent" in p for p in probs)


def test_cli_validate_exit_codes(tmp_path):
    assert regress.main(["validate", str(FIXDIR)]) == 0
    bad = tmp_path / "family_auprc.csv"
    bad.write_text("family,prior,auprc,lift\ninside,0.5,0.9,7.0\n")  # lift != auprc/prior
    assert regress.main(["validate", str(tmp_path)]) == 1
