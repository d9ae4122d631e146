#!/usr/bin/env python
"""Probe analysis: collected logits -> per-label metrics, family AUPRC, figures.

Unified equivalent of analysis/01_collect_logits.py + 02_per_label_metrics.py
+ 03_global_histograms.py + 05_family_auprc.py and the plot_heatmap scripts.
"""

from __future__ import annotations

import ast
import csv
import sys
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from openvla_probe_tpu.utils.platform import apply_platform_env

apply_platform_env()
from openvla_probe_tpu.conf.registry import parse_config
from openvla_probe_tpu.overwatch import initialize_overwatch

overwatch = initialize_overwatch(__name__)
LABEL_KEY_DIR = REPO_ROOT / "openvla_probe_tpu" / "robot" / "label_keys"


@dataclass(frozen=True)
class AnalyzeConfig:
    bank: str = "probe-results/probe_bank_object_binary.npz"
    log_dir: str = "experiments/logs"
    out_dir: str = "probe-results"
    suite: str = "object"
    success_only: bool = False              # restrict to successful episodes
    failures_only: bool = False             # eval_object_probe_on_failure mode
    eval_log: str = ""                      # log file for success filtering


def main(cfg: AnalyzeConfig) -> None:
    import numpy as np

    from openvla_probe_tpu.probe import analysis, logs, plots
    from openvla_probe_tpu.probe.train_probes import ProbeBank

    bank = ProbeBank.load(cfg.bank)
    rel = ast.literal_eval((LABEL_KEY_DIR / f"{cfg.suite}_object_relations_keys.txt").read_text())
    act = ast.literal_eval((LABEL_KEY_DIR / f"{cfg.suite}_action_states_keys.txt").read_text())
    names = list(rel) + list(act)
    kept_names = [names[i] for i in bank.keep]

    include = None
    if (cfg.success_only or cfg.failures_only) and cfg.eval_log:
        records = logs.parse_eval_log(Path(cfg.eval_log).read_text())
        include = (logs.success_indices(records) if cfg.success_only
                   else logs.failure_indices(records))
        overwatch.info(f"Filtering to {len(include)} episodes")

    collected = analysis.collect_logits(bank, cfg.log_dir, include=include)
    rows = analysis.per_label_metrics(collected, kept_names)
    fams = analysis.family_auprc(collected, kept_names)

    out = Path(cfg.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    from openvla_probe_tpu.probe.analysis import write_reference_csv

    # analysis/02_per_label_metrics.py emits the auprc column; the
    # experiment_images variant drops it — write both published schemas.
    write_reference_csv("per_label_auprc", rows, out / "per_label_metrics_reference_schema.csv")
    write_reference_csv("per_label", rows, out / "per_label_metrics_experiment_images_schema.csv")
    with open(out / "per_label_metrics.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    write_reference_csv("family_auprc", fams, out / "family_auprc_reference_schema.csv")
    with open(out / "family_auprc.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(fams[0].keys()))
        w.writeheader()
        w.writerows(fams)
    # published label_stats.csv (visualize_data_distribution equivalent)
    from openvla_probe_tpu.probe.episodes import iter_episodes

    episodes = list(iter_episodes(cfg.log_dir, include=include))
    stats_rows = plots.label_stats_rows(episodes, names)
    write_reference_csv("label_stats", stats_rows, out / "label_stats.csv")

    plots.plot_family_heatmap(rows, out / f"heatmap_f1_{cfg.suite}.png", metric="f1")
    plots.plot_family_heatmap(rows, out / f"heatmap_recall_{cfg.suite}.png", metric="recall")
    plots.plot_family_heatmap(rows, out / f"heatmap_f1_weighted_{cfg.suite}.png",
                              metric="f1", weight_by_support=True)
    hist = analysis.metric_histogram(rows, "f1")
    overwatch.info(f"global mean f1: {hist['mean']:.4f}")
    for r in fams:
        overwatch.info(f"  family {r['family']}: AUPRC={r['auprc']:.3f} lift={r['lift']:.1f}x")
    overwatch.info(f"wrote CSVs + heatmaps to {out}")


if __name__ == "__main__":
    main(parse_config(AnalyzeConfig))
