#!/usr/bin/env python3
"""Cross-run bench comparison — the STANDING adjudication rule (r13/r14).

Host noise on this box is a GLOBAL per-run window factor: whole-run
totals swing +/-20-25% between same-code runs while per-query RATIOS
stay uniform (judge-confirmed on the r13 raw artifacts). Totals are
therefore not comparable across runs; the robust statistics are

  1. the MEDIAN PAIRWISE RATIO of per-query times (new/old) — the
     window factor cancels in the median, so a value near 1.0 means
     "same code speed", <1 means faster, regardless of which window
     each run landed in; and
  2. WINDOW-NORMALIZED AGREEMENT — divide every new/old ratio by the
     median ratio (removing the global window), then report the
     fraction of queries within 1.15x; residual disagreement is
     genuinely per-query (a regression or a win), not host weather.

Usage:
  python3 tools/bench_compare.py OLD.json NEW.json [--threshold 1.15] [--top 8]

Consumes the one-line JSON records graft.Bench emits ({"queries":
{name: sec, ...}, "stat": ..., "value": ...}). The 'stat' field is
printed for both sides: comparisons are only like-for-like when the
stats match (r13 switched the headline from a single-pass total to a
sum of per-query medians over interleaved reps — see ADVICE r13).
Exit code 0 always; this is a reporting tool, the judge reads the
table.
"""
import json
import sys
from statistics import median


def load(path):
    """Accept either graft.Bench's own one-line record or the driver's
    BENCH_rN.json wrapper (whose 'parsed' holds the record, or whose
    'tail' holds the truncated raw line — recover the queries map from
    the '"name":sec' pairs in that case)."""
    with open(path) as f:
        d = json.load(f)
    if not d.get("queries") and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    if not d.get("queries") and isinstance(d.get("tail"), str):
        import re
        pairs = re.findall(r'"(q[\w]+|entry)":\s*([0-9.]+)', d["tail"])
        if pairs:
            d = dict(d, queries={k: float(v) for k, v in pairs})
    q = d.get("queries") or {}
    if not q:
        sys.exit(f"{path}: no 'queries' map")
    return d, {k: float(v) for k, v in q.items() if float(v) > 0}


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {a.split("=")[0].lstrip("-"): (a.split("=", 1)[1] if "=" in a else True)
            for a in sys.argv[1:] if a.startswith("--")}
    if len(args) != 2:
        sys.exit(__doc__)
    thr = float(opts.get("threshold", 1.15))
    top = int(opts.get("top", 8))
    (dold, qold), (dnew, qnew) = load(args[0]), load(args[1])

    shared = sorted(set(qold) & set(qnew))
    only_old = sorted(set(qold) - set(qnew))
    only_new = sorted(set(qnew) - set(qold))
    if not shared:
        sys.exit("no shared queries between the two records")

    ratios = {q: qnew[q] / qold[q] for q in shared}
    med = median(ratios.values())
    normalized = {q: r / med for q, r in ratios.items()}
    agree = sum(1 for r in normalized.values() if 1 / thr <= r <= thr)

    print(f"old: {args[0]}  stat={dold.get('stat', 'single_pass')}  "
          f"value={dold.get('value', 0):.1f}s  n={len(qold)}")
    print(f"new: {args[1]}  stat={dnew.get('stat', 'single_pass')}  "
          f"value={dnew.get('value', 0):.1f}s  n={len(qnew)}")
    if dold.get("stat") != dnew.get("stat"):
        print("WARNING: stat fields differ — headline values are NOT "
              "like-for-like; trust only the per-query ratios below")
    print()
    print(f"shared queries          : {len(shared)}"
          + (f"  (+{len(only_new)} new, -{len(only_old)} removed)"
             if only_new or only_old else ""))
    # between two SINGLE runs the median ratio still carries the two
    # runs' common window shift (same-code runs land anywhere in
    # 0.8-1.25); only between median-across-runs records does it read
    # as code speed. The normalized agreement below is window-free
    # either way.
    print(f"median pairwise ratio   : {med:.3f}  "
          "(window factor x code speed; ~code speed when both sides are "
          "median-across-runs records)")
    print(f"window-normalized agree : {agree}/{len(shared)} "
          f"({100.0 * agree / len(shared):.0f}%) within {thr}x")
    sum_old = sum(qold[q] for q in shared)
    sum_new = sum(qnew[q] for q in shared)
    print(f"raw shared totals       : {sum_old:.1f}s -> {sum_new:.1f}s "
          f"(x{sum_new / sum_old:.2f} — includes the window factor; "
          "NOT the comparison stat)")

    outliers = sorted(normalized.items(), key=lambda kv: kv[1])
    wins = [(q, r) for q, r in outliers if r < 1 / thr][:top]
    regs = [(q, r) for q, r in reversed(outliers) if r > thr][:top]
    if wins:
        print(f"\nper-query wins beyond the window (normalized < {1/thr:.2f}x):")
        for q, r in wins:
            print(f"  {q:<28} x{r:.2f}  ({qold[q]:.2f}s -> {qnew[q]:.2f}s raw)")
    if regs:
        print(f"\nper-query regressions beyond the window (normalized > {thr}x):")
        for q, r in regs:
            print(f"  {q:<28} x{r:.2f}  ({qold[q]:.2f}s -> {qnew[q]:.2f}s raw)")
    if only_new:
        print(f"\nnew-only queries: {', '.join(only_new)}")
    if only_old:
        print(f"removed queries : {', '.join(only_old)}")


if __name__ == "__main__":
    main()
