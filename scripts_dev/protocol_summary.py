#!/usr/bin/env python
"""Summarizes the 1/5/30-minute protocol measurements into one table.

Reads the 60 s full-benchmark results (full_bench_r4_60s.jsonl), the
300 s arms (protocol300_ours/ref.jsonl — first row per puzzle wins; a
round-boundary restart duplicated one reference instance), and the
optional 1800 s arm (protocol1800_*.jsonl).  Prints a markdown table of
ours-vs-reference solved counts at each budget plus the per-instance
detail for STATUS.
"""
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def first_rows(path):
    rows = {}
    if not os.path.exists(path):
        return rows
    with open(path) as f:
        for line in f:
            try:
                r = json.loads(line)
            except ValueError:
                continue
            rows.setdefault(r["puzzle"], r)  # first row per puzzle wins
    return rows


def main():
    misses = [
        l.strip() for l in open(os.path.join(HERE, "misses_r4.txt")) if l.strip()
    ]
    ours300 = first_rows(os.path.join(HERE, "protocol300_ours.jsonl"))
    ref300 = first_rows(os.path.join(HERE, "protocol300_ref.jsonl"))
    ours1800 = first_rows(os.path.join(HERE, "protocol1800_ours.jsonl"))
    ref1800 = first_rows(os.path.join(HERE, "protocol1800_ref.jsonl"))

    print(f"miss set: {len(misses)} instances (round-4 60 s misses)")
    print(f"300s rows: ours {len(ours300)}, ref {len(ref300)}")
    o_solved = [k for k in misses if ours300.get(k, {}).get("solved")]
    r_solved = [k for k in misses if ref300.get(k, {}).get("solved")]
    print(f"300s solved: ours {len(o_solved)} {o_solved}")
    print(f"300s solved: ref  {len(r_solved)} {r_solved}")
    both_miss = [
        k
        for k in misses
        if k in ours300
        and k in ref300
        and not ours300[k]["solved"]
        and not ref300[k]["solved"]
    ]
    print(f"both miss at 300s: {len(both_miss)}")
    for k in both_miss:
        print(f"  {k}")
    if ours1800 or ref1800:
        o18 = [k for k, r in ours1800.items() if r.get("solved")]
        r18 = [k for k, r in ref1800.items() if r.get("solved")]
        print(
            f"1800s rows: ours {len(ours1800)} (solved {len(o18)} {o18}), "
            f"ref {len(ref1800)} (solved {len(r18)} {r18})"
        )

    # Protocol table (60 s numbers from the round-4/5 full-bench runs are
    # supplied by the caller/STATUS; this prints the miss-set view).
    n = len(misses)
    print("\n| budget | ours (of round-4 60s miss set) | reference |")
    print("|---|---|---|")
    print(f"| 300 s | {len(o_solved)}/{n} | {len(r_solved)}/{n} |")
    if ours1800 or ref1800:
        print(f"| 1800 s (subset) | {len(o18)}/{len(ours1800)} | {len(r18)}/{len(ref1800)} |")


if __name__ == "__main__":
    main()
