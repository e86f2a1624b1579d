#!/usr/bin/env python3
"""Mechanical cross-capture regression read over two BENCH_PERF.jsonl
files (r12 verdict #4): every perf line since r12 carries a 12-hex
fingerprint of the post-AQE executed plan, so "did this query actually
change" is a field compare, not a plan-text read. This tool joins two
captures on query name and prints one row per query sorted by seconds
delta (worst first):

    name  sec_a  sec_b  ratio  plan   flag

`plan` is `same` / `CHANGED` / `?` (fingerprint missing on either
side — pre-r12 capture). `flag` marks REGRESSED rows by the house
convention (>1.5x with >0.5 s excess, b vs a) — the same thresholds
the round verdicts scan with. Per-name seconds are the MIN across all
of a query's lines (retries and median reps included — the
Bench.parseTwins convention), and the fingerprint rides that min-sec
line.

Usage:
    python3 tools/plan_diff.py <a.jsonl> <b.jsonl> [--all]

    git show HEAD~1:BENCH_PERF.jsonl > /tmp/prev.jsonl
    python3 tools/plan_diff.py /tmp/prev.jsonl BENCH_PERF.jsonl

By default prints rows with >=0.2 s absolute delta or a changed plan
(--all prints everything). Exit 0 always — this is a reading aid, not
a gate.
"""
import json
import sys


def load(path):
    """name -> (min sec, plan fingerprint of the min-sec line).

    sf-gated like Bench.parseTwins (r13 review): a BENCH_PERF file can
    contain appended dev runs at another scale factor whose ctx line
    switches sf_dir mid-file — folding those in would print 10x "same
    plan" deltas that are pure scale artifacts. Only lines captured
    under the file's FIRST ctx sf_dir count; returns (rows, sf_dir).
    """
    best = {}
    file_sf = None
    current_sf = None
    with open(path) as f:
        for raw in f:
            try:
                d = json.loads(raw)
            except json.JSONDecodeError:
                continue
            if d.get("ctx") == "start":
                current_sf = d.get("sf_dir")
                if file_sf is None:
                    file_sf = current_sf
                continue
            if "name" not in d or "sec" not in d:
                continue
            if current_sf != file_sf:
                continue
            cur = best.get(d["name"])
            if cur is None or d["sec"] < cur[0]:
                best[d["name"]] = (d["sec"], d.get("plan", ""))
    return best, file_sf


def main(argv):
    show_all = "--all" in argv
    paths = [a for a in argv if not a.startswith("--")]
    if len(paths) != 2:
        print(__doc__)
        return 2
    (a, sf_a), (b, sf_b) = load(paths[0]), load(paths[1])
    if sf_a != sf_b:
        print(f"WARNING: captures are at different scale factors "
              f"({sf_a} vs {sf_b}) — seconds are not comparable.\n")
    rows = []
    for name in sorted(set(a) | set(b)):
        sa, pa = a.get(name, (None, ""))
        sb, pb = b.get(name, (None, ""))
        if sa is None or sb is None:
            rows.append((float("inf"), name, sa, sb, "only-one-side", ""))
            continue
        plan = "?" if not pa or not pb else ("same" if pa == pb else "CHANGED")
        regressed = sb > 1.5 * sa and sb - sa > 0.5
        rows.append((abs(sb - sa), name, sa, sb, plan,
                     "REGRESSED" if regressed else ""))
    rows.sort(key=lambda r: -r[0])
    shown = 0
    tot_a = sum(s for s, _ in a.values())
    tot_b = sum(s for s, _ in b.values())
    print(f"{'query':42s} {'sec_a':>7s} {'sec_b':>7s} {'ratio':>6s} "
          f"{'plan':>8s} flag")
    for delta, name, sa, sb, plan, flag in rows:
        if not show_all and delta != float("inf") and delta < 0.2 \
                and plan != "CHANGED":
            continue
        if sa is None or sb is None:
            print(f"{name:42s} {'-' if sa is None else f'{sa:7.2f}':>7s} "
                  f"{'-' if sb is None else f'{sb:7.2f}':>7s} "
                  f"{'':>6s} {plan:>8s}")
        else:
            print(f"{name:42s} {sa:7.2f} {sb:7.2f} {sb / max(sa, 1e-9):6.2f} "
                  f"{plan:>8s} {flag}")
        shown += 1
    print(f"\n{shown} rows shown ({len(rows)} joined); "
          f"min-sec totals: a={tot_a:.1f}s b={tot_b:.1f}s")
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main(sys.argv[1:]))
    except BrokenPipeError:  # | head is a normal way to read this
        sys.exit(0)
