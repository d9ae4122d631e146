#!/usr/bin/env python
"""Unified parity-certificate ledger (VERDICT r4 #8).

Rounds 2-4 scattered their certificate JSON lines across PARITY_r02/03/04.md
with evolving schemas. This tool maintains ONE machine-readable ledger,
`PARITY_LEDGER.jsonl`, with a schema check over every line (the
regress_probe_csvs.py treatment applied to our own artifacts):

    python scripts/parity_ledger.py collect    # rebuild from PARITY_r*.md
    python scripts/parity_ledger.py validate   # schema-check the ledger
    python scripts/parity_ledger.py append --line '<json>'   # validated add

Line kinds (the `kind` field; legacy kind-less lines are classified):
  random_weight_check        check_parity output: bf16 vs a quantized tier
                             on random/synthetic weights (margin-limited —
                             agreement there is a FLOOR, not a verdict)
  trained_weight_certificate scripts/trained_parity.py full protocol:
                             agreement + margins + spec equality + fleet
  multilora_certificate      scripts/multilora_parity.py mixed-batch check
Every line carries `source` + `round` provenance after collection.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
LEDGER = REPO / "PARITY_LEDGER.jsonl"
SOURCES = ["PARITY_r02.md", "PARITY_r03.md", "PARITY_r04.md",
           "PARITY_r05.md", "PARITY.md"]

# required keys per kind — the minimal invariant core each harness emits;
# extra keys are allowed (schemas grew round over round and may keep growing)
SCHEMAS = {
    "random_weight_check": {
        "backend", "n_images", "per_dim_agreement", "overall_agreement",
        "max_bin_drift",
    },
    "trained_weight_certificate": {
        "backend", "train_steps",
        "bf16_spec_token_mismatches", "bf16_spec_positions_checked",
        "int8_spec_token_mismatches", "int8_spec_positions_checked",
    },
    "multilora_certificate": {
        "backend", "n_adapters", "positions_checked",
        "mixed_vs_single_mismatches",
    },
}


def classify(d: dict) -> str:
    if d.get("kind"):
        return d["kind"]
    if "overall_agreement" in d and "per_dim_agreement" in d:
        return "random_weight_check"
    raise ValueError(f"unclassifiable ledger line: {sorted(d)[:8]}")


def validate_line(d: dict) -> str:
    kind = classify(d)
    if kind not in SCHEMAS:
        raise ValueError(f"unknown certificate kind {kind!r}")
    missing = SCHEMAS[kind] - set(d)
    if missing:
        raise ValueError(f"{kind} line missing keys {sorted(missing)}")
    if "per_dim_agreement" in d:
        pda = d["per_dim_agreement"]
        if not (isinstance(pda, list) and
                all(isinstance(v, (int, float)) and 0 <= v <= 1 for v in pda)):
            raise ValueError("per_dim_agreement must be rates in [0, 1]")
    if "splits" in d:
        for name, sp in d["splits"].items():
            if not 0 <= sp.get("overall_agreement", -1) <= 1:
                raise ValueError(f"split {name}: bad overall_agreement")
    return kind


def collect() -> int:
    rows = []
    for src in SOURCES:
        p = REPO / src
        if not p.exists():
            continue
        rnd = src.replace("PARITY_r", "r").replace(".md", "")
        for ln in p.read_text().splitlines():
            if not ln.startswith("{"):
                continue
            d = json.loads(ln)
            d.setdefault("kind", classify(d))
            if d["kind"] == "trained_weight_certificate":
                # pre-r3.9 lines predate the tier field; those runs were all
                # the int8 "turbo" tier (PARITY_r03.md narrative)
                d.setdefault("tier", "turbo")
            d.setdefault("source", src)
            d.setdefault("round", rnd if rnd != "PARITY" else "ledger")
            validate_line(d)
            rows.append(d)
    with open(LEDGER, "w") as f:
        for d in rows:
            f.write(json.dumps(d) + "\n")
    return len(rows)


def validate() -> int:
    n = 0
    for i, ln in enumerate(LEDGER.read_text().splitlines()):
        d = json.loads(ln)
        try:
            validate_line(d)
        except ValueError as e:
            raise SystemExit(f"PARITY_LEDGER.jsonl line {i + 1}: {e}")
        n += 1
    return n


def append(line: str) -> None:
    d = json.loads(line)
    d.setdefault("kind", classify(d))
    validate_line(d)
    with open(LEDGER, "a") as f:
        f.write(json.dumps(d) + "\n")


def main(argv) -> None:
    cmd = argv[1] if len(argv) > 1 else "validate"
    if cmd == "collect":
        n = collect()
        print(json.dumps({"collected": n, "ledger": str(LEDGER)}))
    elif cmd == "validate":
        n = validate()
        print(json.dumps({"valid": n}))
    elif cmd == "append":
        append(argv[argv.index("--line") + 1])
        print(json.dumps({"appended": 1}))
    else:
        raise SystemExit(f"unknown command {cmd}; use collect|validate|append")


if __name__ == "__main__":
    main(sys.argv)
