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
