#!/usr/bin/env python3
"""Combine N exclusive graft.Bench records into the round's combined
artifact: per-query MEDIAN of the runs' medians (the r13/r14 headline,
kept for continuity) plus per-query MIN across the runs' mins — the
r16 PRIMARY comparison statistic (see tools/bench_compare.py).

Usage: python3 tools/bench_combine.py OUT.json RUN1.json RUN2.json ...
"""
import json
import sys
from statistics import median


def main():
    out, paths = sys.argv[1], sys.argv[2:]
    runs = []
    for p in paths:
        with open(p) as f:
            runs.append(json.load(f))
    names = set(runs[0]["queries"])
    for r in runs[1:]:
        names &= set(r["queries"])
    qmed = {q: median(r["queries"][q] for r in runs) for q in sorted(names)}
    qmin = {q: min(r.get("queries_min", r["queries"])[q] for r in runs)
            for q in sorted(names)}
    rec = {
        "metric": "total",
        "value": sum(qmed.values()),
        "unit": "sec",
        "stat": f"median_across_{len(runs)}_exclusive_runs_of_median_of_3",
        "totals_of_runs": [r["value"] for r in runs],
        "min_totals_of_runs": [r.get("min_total") for r in runs],
        "queries": qmed,
        "queries_min": qmin,
        "min_total": sum(qmin.values()),
        "sf": runs[0].get("sf", ""),
    }
    with open(out, "w") as f:
        json.dump(rec, f)
    print(f"combined {len(runs)} runs, {len(names)} queries -> {out}")
    print(f"  median-of-medians total: {rec['value']:.1f}s")
    print(f"  min-of-mins total      : {rec['min_total']:.1f}s")
    print(f"  run totals             : "
          + ", ".join(f"{v:.1f}" for v in rec["totals_of_runs"]))


if __name__ == "__main__":
    main()
