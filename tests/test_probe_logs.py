"""Log parsing, summaries, sanity census tests."""

import numpy as np

from openvla_probe_tpu.probe import logs


LOG = """\
[libero_object] task 0 ep 0: success=True (1/1 = 1.000)
Episode 0 success: True
[libero_object] task 0 ep 1: success=False (1/2 = 0.500)
Episode 1 success: False
[libero_object] task 1 ep 0: success=True (2/3 = 0.667)
Episode 2 success: True
"""


def test_parse_and_indices():
    recs = logs.parse_eval_log(LOG)
    assert len(recs) == 3
    assert logs.success_indices(recs) == [0, 2]
    assert logs.failure_indices(recs) == [1]
    assert recs[2]["task"] == 1


def test_per_task_summary():
    rows = logs.per_task_summary(logs.parse_eval_log(LOG))
    by_task = {r["task"]: r for r in rows}
    assert by_task[0]["success_rate"] == 0.5
    assert by_task[1]["success_rate"] == 1.0
    assert by_task["TOTAL"]["episodes"] == 3


def test_label_count_sanity(rng):
    eps = [{
        "symbolic_state_object_relations": rng.integers(-1, 2, (10, 4)).astype(np.int8),
        "symbolic_state_action_subgoals": np.ones((10, 2), np.int8),
    } for _ in range(2)]
    s = logs.label_count_sanity(eps)
    assert s["n_frames"] == 20 and s["n_labels"] == 6
    assert s["always_positive"] >= 2


def test_atom_census():
    names = ["(inside a b)", "(inside c d)", "(grasped x)", "(on-floor y)"]
    census = logs.atom_census(names)
    assert census == {"inside": 2, "grasped": 1, "on-floor": 1}


def test_single_label_f1(rng):
    targets = rng.integers(0, 2, (50, 3)).astype(np.int8)
    logits = np.where(targets == 1, 3.0, -3.0) + rng.normal(scale=0.1, size=(50, 3))
    collected = {5: {"logits": logits, "targets": targets}}
    assert logs.single_label_f1(collected, 1, 5) == 1.0


def test_reference_csv_schemas(tmp_path):
    """Emitted CSVs match the reference artifacts' exact column layouts
    (experiment_images/*.csv, analysis/family_auprc.csv) for drop-in
    downstream-tooling compatibility."""
    import csv as _csv

    from openvla_probe_tpu.probe.analysis import (
        REFERENCE_CSV_SCHEMAS,
        write_reference_csv,
    )

    rows_binary = [{"layer": 0, "val_acc": 0.5, "val_f1": 0.4, "val_ap": 0.3}]
    rows_dual = [{"layer": 1, "presence_acc": 0.9, "truth_acc": 0.8,
                  "presence_f1": 0.7, "truth_f1": 0.6}]
    rows_lab = [{"layer": 2, "label_idx": 3, "label": "behind a b", "family": "behind",
                 "precision": 1.0, "recall": 0.5, "f1": 0.66, "mcc": 0.1,
                 "balanced_acc": 0.7, "auprc": 0.9, "support": 4}]
    rows_fam = [{"family": "inside", "prior": 0.02, "auprc": 0.74, "lift": 29.9,
                 "n": 100, "n_pos": 2}]

    for kind, rows, want_header in [
        ("binary", rows_binary, "layer,val_acc,val_f1"),
        ("dual", rows_dual, "layer,pres_acc_va,truth_acc_va,pres_f1_va,truth_f1_va,status"),
        ("3class", rows_binary, "layer,val_acc,val_f1,status"),
        ("per_label", rows_lab, "layer,label_idx,label,family,prec,recall,f1,mcc,bal_acc"),
        ("family_auprc", rows_fam, "family,prior,auprc,lift"),
    ]:
        p = write_reference_csv(kind, rows, tmp_path / f"{kind}.csv")
        lines = p.read_text().strip().split("\n")
        assert lines[0] == want_header, (kind, lines[0])
        parsed = list(_csv.DictReader(open(p)))
        assert len(parsed) == len(rows)
        assert list(parsed[0].keys()) == REFERENCE_CSV_SCHEMAS[kind]
    # dual/3class rows carry the reference's status column
    assert "completed" in (tmp_path / "dual.csv").read_text()
