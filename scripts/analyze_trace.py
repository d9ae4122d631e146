#!/usr/bin/env python
"""Aggregate a jax.profiler Chrome trace into a per-HLO device-time table.

Companion to scripts/profile.py / `BENCH_PROFILE=<dir> python bench.py`
(round-3's per-fusion accounting in PERF_r03.md was produced by doing this by
hand). Pure stdlib: reads the newest `*.trace.json.gz` under the given
directory, keeps device-side "XLA Ops" complete events (ph == "X"), buckets
them by a normalized op name, and prints total device ms, call counts, and
share. The reference has no profiling machinery at all (SURVEY.md §5).

Usage:
  python scripts/analyze_trace.py profiles/r3_gelu [--top 40] [--by raw|class]
  --by class groups fusions into coarse classes (matmul/attention/copy/...)
    via the long_name/HLO text when present, else the name prefix.
"""

from __future__ import annotations

import argparse
import collections
import gzip
import json
import re
import sys
from pathlib import Path


def find_trace(root: Path) -> Path:
    cands = sorted(root.rglob("*.trace.json.gz"), key=lambda p: p.stat().st_mtime)
    if not cands:
        sys.exit(f"no *.trace.json.gz under {root}")
    return cands[-1]


def load_events(path: Path):
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    ev = data.get("traceEvents", [])
    # device pid: process_name metadata containing "TPU" (fallback: the pid
    # with the most X events)
    dev_pids = {e.get("pid") for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    # thread names: keep compute lanes ("XLA Ops", "TC Overlay"), drop the
    # module-level envelopes ("XLA Modules") that double-count their children
    op_tids = {(e.get("pid"), e.get("tid")) for e in ev
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and str(e.get("args", {}).get("name", "")) in ("XLA Ops", "TC Overlay")}
    xs = [e for e in ev if e.get("ph") == "X"
          and (not dev_pids or e.get("pid") in dev_pids)
          and (not op_tids or (e.get("pid"), e.get("tid")) in op_tids)]
    return xs


_NUM = re.compile(r"\.\d+")


def norm_name(name: str) -> str:
    """fusion.1234 / dynamic-update-slice.7 -> fusion / dynamic-update-slice."""
    return _NUM.sub("", name)


def classify(e) -> str:
    """Authoritative grouping: the profiler's own hlo_category ('convolution
    fusion' = MXU matmul fusions, 'while' = loop envelope overhead, ...)."""
    cat = e.get("args", {}).get("hlo_category")
    if cat:
        return str(cat)
    name = e.get("name", "")
    return norm_name(name) if name else "?"


def by_source(e) -> str:
    """repo file:line that emitted the op (XLA source metadata) — attributes
    device time straight back to model code."""
    src = str(e.get("args", {}).get("source", "")) or "<no source>"
    return src.replace("/root/repo/", "")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir", type=Path)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--by", choices=("raw", "class", "source"), default="class")
    ap.add_argument("--contains", default=None,
                    help="only ops whose name/long_name matches this regex")
    args = ap.parse_args()

    path = find_trace(args.trace_dir)
    xs = load_events(path)
    if args.contains:
        rx = re.compile(args.contains, re.I)
        xs = [e for e in xs if rx.search(
            e.get("name", "") + str(e.get("args", {}).get("long_name", "")))]

    # SELF time: an enclosing event (a `while` loop envelope) must not
    # double-count the ops nested inside it on the same lane — subtract each
    # event's children via a per-lane nesting stack (Chrome trace semantics:
    # same-lane events nest by [ts, ts+dur) containment)
    lanes = collections.defaultdict(list)
    for e in xs:
        lanes[(e.get("pid"), e.get("tid"))].append(e)
    self_us = {}
    for lane in lanes.values():
        lane.sort(key=lambda e: (e.get("ts", 0.0), -e.get("dur", 0.0)))
        stack = []  # (end_ts, event_id)
        for e in lane:
            ts, dur_ = e.get("ts", 0.0), e.get("dur", 0.0)
            while stack and stack[-1][0] <= ts + 1e-9:
                stack.pop()
            self_us[id(e)] = dur_
            if stack:
                self_us[stack[-1][1]] -= dur_
            stack.append((ts + dur_, id(e)))

    key = {"class": classify, "source": by_source,
           "raw": lambda e: norm_name(e.get("name", "?"))}[args.by]
    dur = collections.Counter()
    cnt = collections.Counter()
    for e in xs:
        k = key(e)
        dur[k] += max(self_us[id(e)], 0.0)  # microseconds
        cnt[k] += 1
    total = sum(dur.values())
    print(f"trace: {path}")
    print(f"device op events: {len(xs)}   total device time: {total/1000:.2f} ms")
    print(f"{'ms':>10} {'share':>7} {'calls':>7}  name")
    for k, us in dur.most_common(args.top):
        print(f"{us/1000:10.2f} {us/total*100 if total else 0:6.1f}% {cnt[k]:7d}  {k[:110]}")


if __name__ == "__main__":
    main()
