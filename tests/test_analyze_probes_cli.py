"""End-to-end drive of scripts/analyze_probes.py: episodes on disk -> bank ->
analyzer CLI -> every published-schema artifact validates under the regression
harness (scripts/regress_probe_csvs.py). This is the in-environment stand-in
for the LIBERO artifact regression: same producers, same schemas, planted data.
"""

import importlib.util
from pathlib import Path

import numpy as np
import pytest

from openvla_probe_tpu.probe.episodes import EpisodeWriter
from openvla_probe_tpu.probe.train_probes import ProbeTrainConfig, train_probes

K_REL, K_ACT = 461, 20  # object-suite label vocabulary sizes (robot/label_keys)


def _load(name, rel):
    import sys

    spec = importlib.util.spec_from_file_location(name, Path(__file__).parents[1] / rel)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod  # dataclass annotation resolution needs the registry
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def analyzer_outputs(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("analyze")
    log_dir, out_dir = tmp / "logs", tmp / "out"
    rng = np.random.default_rng(0)
    n_layers, D, T = 3, 16, 24

    # a handful of label columns carry linear signal; the rest are sparse noise
    wr = EpisodeWriter(log_dir)
    for ep in range(8):
        rel = np.full((T, K_REL), -1, np.int8)
        act = np.full((T, K_ACT), -1, np.int8)
        rel[:, :6] = rng.choice([0, 1], size=(T, 6))
        act[:, :3] = rng.choice([0, 1], size=(T, 3))
        hid = rng.normal(0, 1, size=(n_layers + 1, T, D)).astype(np.float16)
        hid[2, :, 0] = rel[:, 0] * 4.0 - 2.0  # plant signal at layer 2
        for t in range(T):
            wr.append(hid[:, t], symbolic_state_object_relations=rel[t],
                      symbolic_state_action_subgoals=act[t])
        wr.flush(ep, success=bool(ep % 2))

    out = train_probes(str(log_dir), ProbeTrainConfig(epochs=3, batch_size=256))
    bank_path = tmp / "bank.npz"
    out["bank"].save(bank_path)

    analyze = _load("analyze_probes", "scripts/analyze_probes.py")
    cfg = analyze.AnalyzeConfig(bank=str(bank_path), log_dir=str(log_dir),
                                out_dir=str(out_dir), suite="object")
    analyze.main(cfg)
    return out_dir


@pytest.mark.parametrize("artifact", [
    "per_label_metrics_reference_schema.csv",          # analysis/ variant (+auprc)
    "per_label_metrics_experiment_images_schema.csv",  # experiment_images variant
    "family_auprc_reference_schema.csv",
    "label_stats.csv",
])
def test_published_schema_artifacts_validate(analyzer_outputs, artifact):
    regress = _load("regress_probe_csvs", "scripts/regress_probe_csvs.py")
    path = analyzer_outputs / artifact
    assert path.exists()
    assert regress.validate_file(path) == []


def test_heatmaps_written(analyzer_outputs):
    assert (analyzer_outputs / "heatmap_f1_object.png").exists()
    assert (analyzer_outputs / "heatmap_recall_object.png").exists()
