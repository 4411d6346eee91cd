#!/usr/bin/env python3
"""Two-close agreement gate (round-16 verdict #3).

Round 16's headline ratio depended on which same-day close you read —
0.99x vs 1.11x on common rows, a uniform ~+15% after ~6 h of continuous
session load. The official close is now TWO consecutive full bench runs
(each `sbt runMain graft.Bench` is already a fresh forked JVM), and this
script gates them: common-query totals must agree within 5% or the close
is declared unstable and must be re-run in a quieter window.

Usage: python3 tools/close_agree.py <detailA.json> <detailB.json> [pct]

Prints per-file totals over COMMON queries, the ratio, the largest
per-query drifts, and exits nonzero when the totals disagree by more
than pct (default 5).
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.loads(f.readline())
    qs = {k: v for k, v in d.get("queries", {}).items()
          if isinstance(v, (int, float))}
    return d, qs


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    pa, pb = sys.argv[1], sys.argv[2]
    pct = float(sys.argv[3]) if len(sys.argv) > 3 else 5.0
    da, qa = load(pa)
    db, qb = load(pb)
    if da.get("sf") != db.get("sf") or da.get("lane") != db.get("lane"):
        print(f"[close-agree] WARNING: lanes differ "
              f"({da.get('sf')}/{da.get('lane')} vs {db.get('sf')}/{db.get('lane')}) "
              "— totals are not envelope-comparable")
    common = sorted(set(qa) & set(qb))
    if not common:
        sys.exit("[close-agree] no common queries — nothing to gate on")
    ta = sum(qa[q] for q in common)
    tb = sum(qb[q] for q in common)
    ratio = tb / ta if ta else float("inf")
    drifts = sorted(((qb[q] - qa[q], q) for q in common), key=lambda x: -abs(x[0]))
    print(f"[close-agree] common={len(common)} totalA={ta:.1f}s totalB={tb:.1f}s "
          f"ratio={ratio:.3f}")
    for d, q in drifts[:5]:
        print(f"[close-agree]   drift {q}: {qa[q]:.2f} -> {qb[q]:.2f} ({d:+.2f}s)")
    if abs(ratio - 1.0) * 100 > pct:
        sys.exit(f"[close-agree] UNSTABLE: totals disagree by "
                 f"{abs(ratio - 1.0) * 100:.1f}% (> {pct}%) — rerun the close "
                 "in a quieter window before archiving")
    print(f"[close-agree] STABLE within {pct}% — archive either run")


if __name__ == "__main__":
    main()
