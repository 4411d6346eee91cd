#!/usr/bin/env python3
"""Per-query bench regression canary.

Compares two BENCH_DETAIL.json files (graft.Bench's per-query detail
output) and flags per-query regressions, noise-envelope aware:

    python3 tools/bench_diff.py BENCH_DETAIL_r10.json BENCH_DETAIL.json

A query is flagged when BOTH hold:
  * cur >= RATIO * prev      (default 1.5x — real slowdowns, not jitter)
  * cur - prev >= ABS_FLOOR  (default 0.5 s — sub-second queries swing
                              tens of percent run-to-run on a busy box;
                              a 0.2 -> 0.35 s "2x" is noise, a
                              4 -> 7 s 1.75x is a regression)

Both detail files must come from the SAME lane (same cores, same sf dir
— see PERF.md's lane discipline); the tool refuses to compare different
sf dirs unless --force is given.

Exit code 1 when any regression is flagged (usable as a round-close
gate), 0 otherwise. Improvements and added/removed queries are reported
informationally.
"""

import argparse
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    if "queries" not in d:
        sys.exit(f"{path}: not a bench detail file (no 'queries' key)")
    return d


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("prev")
    ap.add_argument("cur")
    ap.add_argument("--ratio", type=float, default=1.5,
                    help="flag when cur >= ratio * prev (default 1.5)")
    ap.add_argument("--abs-floor", type=float, default=0.5,
                    help="and cur - prev >= this many seconds (default 0.5)")
    ap.add_argument("--force", action="store_true",
                    help="compare even when the sf dirs differ")
    args = ap.parse_args()

    prev, cur = load(args.prev), load(args.cur)
    if prev.get("sf") != cur.get("sf") and not args.force:
        sys.exit(f"lane mismatch: {prev.get('sf')} vs {cur.get('sf')} "
                 "(different data scales are not comparable; --force to override)")

    pq, cq = prev["queries"], cur["queries"]
    common = sorted(set(pq) & set(cq))
    added = sorted(set(cq) - set(pq))
    removed = sorted(set(pq) - set(cq))

    regressions, improvements, zero_base = [], [], []
    for q in common:
        p, c = pq[q], cq[q]
        if p == 0:
            # crashed or sub-ms baseline: the ratio is meaningless (and
            # would divide by zero below) — report, don't flag
            if c >= args.abs_floor:
                zero_base.append((q, p, c))
            continue
        if c >= args.ratio * p and c - p >= args.abs_floor:
            regressions.append((q, p, c))
        elif p >= args.ratio * c and p - c >= args.abs_floor:
            improvements.append((q, p, c))

    tp, tc = sum(pq[q] for q in common), sum(cq[q] for q in common)
    print(f"common queries: {len(common)}  total {tp:.1f}s -> {tc:.1f}s "
          f"(x{tc / tp:.2f})" if tp else "no common queries")
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    for name, rows in (("IMPROVED", improvements), ("REGRESSED", regressions)):
        for q, p, c in sorted(rows, key=lambda r: r[1] - r[2]):
            print(f"{name}  {q}: {p:.2f}s -> {c:.2f}s (x{c / p:.2f})")
    for q, p, c in zero_base:
        print(f"ZERO-BASELINE  {q}: {p:.2f}s -> {c:.2f}s "
              "(prev crashed or sub-ms; no ratio)")

    # Executor-metric canary (round 12): shuffle bytes and spill are plan
    # properties, so a blowup is a scale-killer even when wall-time noise
    # hides it. Flags when BOTH ratio and absolute-delta trip (same
    # philosophy as the time envelope). Older detail files have no
    # "metrics" key -> silently skipped.
    pm, cm = prev.get("metrics", {}), cur.get("metrics", {})
    metric_regs = []
    for q in sorted(set(pm) & set(cm)):
        ps = pm[q].get("shuffle_read", 0) + pm[q].get("shuffle_write", 0)
        cs = cm[q].get("shuffle_read", 0) + cm[q].get("shuffle_write", 0)
        if cs >= 1.5 * ps and cs - ps >= 8 * 1024 * 1024:
            metric_regs.append((q, f"shuffle {ps >> 20}MiB -> {cs >> 20}MiB"))
        pd = pm[q].get("spill_disk", 0) + pm[q].get("spill_mem", 0)
        cd = cm[q].get("spill_disk", 0) + cm[q].get("spill_mem", 0)
        if pd < 1 << 20 <= cd:
            metric_regs.append((q, f"NEW SPILL {cd >> 20}MiB (prev {pd >> 20}MiB)"))
    for q, msg in metric_regs:
        print(f"METRIC-REGRESSED  {q}: {msg}")
    if cur.get("failed"):
        print(f"FAILED in current run: {cur['failed']}")
    if not regressions:
        print("no per-query regressions "
              f"(>={args.ratio}x and >={args.abs_floor}s)")
    return 1 if regressions or metric_regs or cur.get("failed") else 0


if __name__ == "__main__":
    sys.exit(main())
