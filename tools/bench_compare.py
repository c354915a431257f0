#!/usr/bin/env python3
"""Cross-run bench comparison — the STANDING adjudication rule
(r13/r14, r16: min-statistic primary).

Host noise on this box is a GLOBAL per-run window factor: whole-run
totals swing +/-20-25% between same-code runs while per-query RATIOS
stay uniform (judge-confirmed on the r13 raw artifacts). The r15
verdict additionally showed the median-of-medians itself is
window-dominated at a 1.49x same-code swing, while the PER-QUERY MIN
across exclusive runs is window-resistant (every r15 flagged
"regression" collapsed to parity at the min). The standing rule is
therefore:

  1. PRIMARY — MIN-vs-MIN: when both records carry `queries_min`
     (per-query min across that round's exclusive runs), compare
     those directly and flag only min-vs-min regressions. The min is
     the best observed code speed; a min that got slower is a real
     regression, not weather.
  2. SECONDARY — the r13/r14 median statistics (median pairwise
     ratio + window-normalized agreement over `queries`), kept for
     records that predate `queries_min` and as a cross-check.

Window-parity calibration (r17, widened per the r16 verdict): the
residual cross-round window factor that survives even the min
statistic is estimated from the BYTE-UNCHANGED queries — pass
`--touched=q_a,q_b,...` (the queries whose code the new round
modified, computable from the round's git diff); the parity factor is
then the MEDIAN min-ratio over the remaining shared queries with
old-min ≥ 1 s (sub-second mins are scheduler-jitter-dominated). This
replaces the single hand-picked `q_changelog` row the r15/r16
adjudications leaned on, which itself drifted 1.39→1.59 s across two
byte-identical rounds. With no `--touched`, every ≥ 1 s shared query
calibrates (a lower bound on code improvements: if the new round made
untouched-adjacent queries faster, the factor absorbs it).

Usage:
  python3 tools/bench_compare.py OLD.json NEW.json [--threshold 1.15]
      [--top 8] [--touched=q_a,q_b,...]

Consumes the one-line JSON records graft.Bench emits / the driver's
BENCH_rN.json wrappers. Exit code 0 always; this is a reporting tool,
the judge reads the table.
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
    qmin = d.get("queries_min") or None
    if qmin:
        qmin = {k: float(v) for k, v in qmin.items() if float(v) > 0}
    return d, {k: float(v) for k, v in q.items() if float(v) > 0}, qmin


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {a.split("=")[0].lstrip("-"): (a.split("=", 1)[1] if "=" in a else True)
            for a in sys.argv[1:] if a.startswith("--")}
    if len(args) != 2:
        sys.exit(__doc__)
    thr = float(opts.get("threshold", 1.15))
    top = int(opts.get("top", 8))
    (dold, qold, mold), (dnew, qnew, mnew) = load(args[0]), load(args[1])

    print(f"old: {args[0]}  stat={dold.get('stat', 'single_pass')}  "
          f"value={dold.get('value', 0):.1f}s  n={len(qold)}")
    print(f"new: {args[1]}  stat={dnew.get('stat', 'single_pass')}  "
          f"value={dnew.get('value', 0):.1f}s  n={len(qnew)}")
    if dold.get("stat") != dnew.get("stat"):
        print("WARNING: stat fields differ — headline values are NOT "
              "like-for-like; trust only the per-query comparisons below")
    print()

    touched = set(filter(None,
        str(opts.get("touched", "")).split(","))) if opts.get("touched") else set()

    # ── PRIMARY: min-vs-min (r16 standing rule) ──────────────────────
    if mold and mnew:
        ms = sorted(set(mold) & set(mnew))
        mr = {q: mnew[q] / mold[q] for q in ms}
        mmed = median(mr.values())
        # ── window parity (r17 rule): calibrate on the BYTE-UNCHANGED
        # queries with old-min >= 1 s (sub-second mins are jitter-
        # dominated), not a single hand-picked row ──────────────────
        calib = [q for q in ms if q not in touched and mold[q] >= 1.0]
        parity = median(mnew[q] / mold[q] for q in calib) if calib else None
        regs = sorted(((q, r) for q, r in mr.items() if r > thr),
                      key=lambda kv: -kv[1])[:top]
        wins = sorted(((q, r) for q, r in mr.items() if r < 1 / thr),
                      key=lambda kv: kv[1])[:top]
        agree = sum(1 for r in mr.values() if 1 / thr <= r <= thr)
        print("PRIMARY (min-vs-min, window-resistant):")
        print(f"  shared queries        : {len(ms)}")
        print(f"  median min ratio      : {mmed:.3f}")
        if parity is not None:
            src = (f"{len(calib)} unchanged >=1s queries"
                   if touched else f"all {len(calib)} >=1s shared queries "
                   "(no --touched given — a LOWER bound on improvement)")
            print(f"  window parity (r17)   : {parity:.3f}  [median "
                  f"min-ratio over {src}]")
            tot_old = sum(mold[q] for q in ms)
            tot_new = sum(mnew[q] for q in ms)
            print(f"  parity-normalized     : {tot_old:.1f}s -> "
                  f"{tot_new / parity:.1f}s combined min "
                  f"(raw {tot_new:.1f}s / parity {parity:.3f})")
            if touched:
                for q in sorted(touched & set(ms)):
                    print(f"    touched {q:<22} x{mr[q] / parity:.2f} "
                          f"at parity  ({mold[q]:.2f}s -> {mnew[q]:.2f}s raw)")
        print(f"  agree within {thr}x    : {agree}/{len(ms)} "
              f"({100.0 * agree / len(ms):.0f}%)")
        if regs:
            print(f"  min-vs-min REGRESSIONS (> {thr}x — these are real):")
            for q, r in regs:
                print(f"    {q:<28} x{r:.2f}  "
                      f"({mold[q]:.2f}s -> {mnew[q]:.2f}s min)")
        else:
            print(f"  min-vs-min regressions: none > {thr}x")
        if wins:
            print(f"  min-vs-min wins (< {1/thr:.2f}x):")
            for q, r in wins:
                print(f"    {q:<28} x{r:.2f}  "
                      f"({mold[q]:.2f}s -> {mnew[q]:.2f}s min)")
        print()
    else:
        missing = [p for p, m in ((args[0], mold), (args[1], mnew)) if not m]
        print("PRIMARY (min-vs-min): unavailable — no `queries_min` in "
              + ", ".join(missing) + "; falling back to the median "
              "statistics below (pre-r15 record)")
        print()

    # ── SECONDARY: median-based r13/r14 statistics ───────────────────
    shared = sorted(set(qold) & set(qnew))
    only_old = sorted(set(qold) - set(qnew))
    only_new = sorted(set(qnew) - set(qold))
    if not shared:
        sys.exit("no shared queries between the two records")

    ratios = {q: qnew[q] / qold[q] for q in shared}
    med = median(ratios.values())
    normalized = {q: r / med for q, r in ratios.items()}
    agree = sum(1 for r in normalized.values() if 1 / thr <= r <= thr)

    print("SECONDARY (median-based, window-sensitive):")
    print(f"  shared queries          : {len(shared)}"
          + (f"  (+{len(only_new)} new, -{len(only_old)} removed)"
             if only_new or only_old else ""))
    print(f"  median pairwise ratio   : {med:.3f}  "
          "(window factor x code speed)")
    print(f"  window-normalized agree : {agree}/{len(shared)} "
          f"({100.0 * agree / len(shared):.0f}%) within {thr}x")
    sum_old = sum(qold[q] for q in shared)
    sum_new = sum(qnew[q] for q in shared)
    print(f"  raw shared totals       : {sum_old:.1f}s -> {sum_new:.1f}s "
          f"(x{sum_new / sum_old:.2f} — includes the window factor; "
          "NOT the comparison stat)")

    outliers = sorted(normalized.items(), key=lambda kv: kv[1])
    wins = [(q, r) for q, r in outliers if r < 1 / thr][:top]
    regs = [(q, r) for q, r in reversed(outliers) if r > thr][:top]
    if wins:
        print(f"\n  normalized-median wins (< {1/thr:.2f}x — advisory; "
              "confirm at the min):")
        for q, r in wins:
            print(f"    {q:<28} x{r:.2f}  ({qold[q]:.2f}s -> {qnew[q]:.2f}s raw)")
    if regs:
        print(f"\n  normalized-median outliers (> {thr}x — advisory; a "
              "real regression must ALSO show min-vs-min above):")
        for q, r in regs:
            print(f"    {q:<28} x{r:.2f}  ({qold[q]:.2f}s -> {qnew[q]:.2f}s raw)")
    if only_new:
        print(f"\nnew-only queries: {', '.join(only_new)}")
    if only_old:
        print(f"removed queries : {', '.join(only_old)}")


if __name__ == "__main__":
    main()
