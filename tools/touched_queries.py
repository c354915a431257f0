#!/usr/bin/env python3
"""Derive bench_compare's `--touched=` list from a round's git diff
(r18, verdict #4 — the r17 adjudication assembled this set by hand,
which left the widened window-parity rule arguable).

  python3 tools/touched_queries.py BASE [HEAD]

BASE/HEAD are git refs (HEAD defaults to HEAD); the tool prints the
comma-joined touched-query list on stdout (ready to paste after
`--touched=`) and a derivation summary on stderr.

Derivation, conservative by construction (over-marking a query only
SHRINKS the parity calibration set — it can never hide a regression,
because every shared query is still compared; "touched" just means
"this round's code plausibly explains a move"):

  1. Directly edited queries: diff hunks inside SparkEntry.scala are
     mapped to the `queries`/`oracleSql` entry spans they fall in
     (spans parsed from the HEAD version).
  2. Engine-file edits propagate through a textual reverse-dependency
     closure over `src/main/scala`: file A depends on file B when
     A's text references B's object stem (`Snapshot.`, `ZOrder.` …).
     A query is touched when its SparkEntry body/oracle references
     any stem in the closure of the changed files.
  3. BROAD files sit under every query's read/compile path without
     appearing by name in the bodies (the `read()` helper, the DSL
     compiler, the spec types). If one changed, EVERY query is
     touched and the parity factor falls back to the all-shared-query
     lower bound — printed as `*`.

Changes outside SparkEntry's entry spans (its shared helpers) are
treated like a BROAD change for the same reason.
"""
import re
import subprocess
import sys

SPARK_ENTRY = "src/main/scala/graft/SparkEntry.scala"
SRC_GLOB = "src/main/scala"
# under every query's path without being named in bodies
BROAD = {"Resolver", "QueryCompiler", "Spec", "SparkEntry"}


def sh(*args):
    return subprocess.run(args, capture_output=True, text=True,
                          check=True).stdout


def changed_files(base, head):
    out = sh("git", "diff", "--name-only", f"{base}..{head}",
             "--", SRC_GLOB)
    return [f for f in out.splitlines() if f.endswith(".scala")]


def changed_lines(base, head, path):
    """New-side line numbers changed in `path` (unified=0 hunks)."""
    out = sh("git", "diff", "-U0", f"{base}..{head}", "--", path)
    lines = []
    for m in re.finditer(r"^@@ [^+]*\+(\d+)(?:,(\d+))? @@", out, re.M):
        start = int(m.group(1))
        n = int(m.group(2)) if m.group(2) is not None else 1
        lines.extend(range(start, start + max(n, 1)))
    return lines


def entry_spans(head):
    """[(query, start, end)] spans of `queries`/`oracleSql` entries in
    SparkEntry at HEAD; end = next entry start (half-open)."""
    text = sh("git", "show", f"{head}:{SPARK_ENTRY}")
    starts = [(m.start(), m.group(1))
              for m in re.finditer(r'^\s{4}"(q\w+|entry)" ->', text, re.M)]
    # byte offset -> line number
    line_of = []
    ln = 1
    for ch in text:
        if ch == "\n":
            ln += 1
        line_of.append(ln)
    spans = []
    for i, (off, name) in enumerate(starts):
        start_ln = line_of[off]
        end_ln = line_of[starts[i + 1][0]] if i + 1 < len(starts) \
            else len(line_of) and line_of[-1] + 1
        spans.append((name, start_ln, end_ln))
    return text, spans


def main():
    if len(sys.argv) < 2:
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    base = sys.argv[1]
    head = sys.argv[2] if len(sys.argv) > 2 else "HEAD"
    changed = changed_files(base, head)
    if not changed:
        print("", end="")
        print("no src/main changes — nothing touched", file=sys.stderr)
        return
    entry_text, spans = entry_spans(head)

    touched = set()
    broad_reason = None

    # 1. direct SparkEntry edits -> entry spans
    if SPARK_ENTRY in changed:
        for ln in changed_lines(base, head, SPARK_ENTRY):
            hit = [n for (n, s, e) in spans if s <= ln < e]
            if hit:
                touched.update(hit)
            elif ln < spans[0][1] or all(not (s <= ln < e)
                                         for (_, s, e) in spans):
                # a shared-helper edit: every query runs through it
                broad_reason = f"SparkEntry helper line {ln} changed"

    # 2. reverse-dependency closure over object stems
    all_files = [f for f in sh("git", "ls-tree", "-r", "--name-only",
                               head, SRC_GLOB).splitlines()
                 if f.endswith(".scala")]
    texts = {f: sh("git", "show", f"{head}:{f}") for f in all_files}
    stem = {f: re.sub(r"\.scala$", "", f.split("/")[-1]) for f in all_files}
    affected = {f for f in changed if f != SPARK_ENTRY}
    grew = True
    while grew:
        grew = False
        for f in all_files:
            if f in affected or f == SPARK_ENTRY:
                continue
            if any(stem[a] + "." in texts[f] for a in affected):
                affected.add(f)
                grew = True
    # BROAD applies to DIRECTLY-changed files only: a closure-affected
    # BROAD file (e.g. Resolver referencing a changed Snapshot) still
    # propagates through body stem references below — queries that
    # never touch the changed subsystem stay calibration-eligible.
    for f in changed:
        if stem.get(f) in BROAD and f != SPARK_ENTRY:
            broad_reason = f"{stem[f]} changed (every query reads or " \
                "compiles through it)"
    if broad_reason is None:
        for (name, s, e) in spans:
            body = "\n".join(entry_text.splitlines()[s - 1:e - 1])
            if any(stem[a] + "." in body for a in affected):
                touched.add(name)

    if broad_reason:
        print("*")
        print(f"BROAD: {broad_reason} -> all queries touched; "
              "parity falls back to the all-shared lower bound",
              file=sys.stderr)
        return
    print(",".join(sorted(touched)))
    print(f"changed files: {len(changed)}; affected after closure: "
          f"{sorted(stem[a] for a in affected)}; touched queries: "
          f"{len(touched)}", file=sys.stderr)


if __name__ == "__main__":
    main()
