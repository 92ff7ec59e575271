#!/usr/bin/env python
"""Schedule designer: merges the full-bench stage attribution with config
sweeps and reports, per instance, the fastest known (config, time) — the
data the STAGES_DEFAULT slices are fit to.

Inputs (jsonl):
  full_bench_r3b_60s.jsonl   — cumulative-schedule times of the 175 wins
  prefeps_sweep_12s.jsonl    — solo times of new configs on the 49 misses
  slowwin_sweep_12s.jsonl    — solo times of new configs on slow winners
  style_sweep_12s.jsonl      — round-3 solo times (lazy etc.) on misses
"""
import json
import os
from collections import defaultdict

HERE = os.path.dirname(os.path.abspath(__file__))


def rows(name):
    p = os.path.join(HERE, name)
    if not os.path.exists(p):
        return
    with open(p) as f:
        for line in f:
            line = line.strip()
            if line:
                try:
                    yield json.loads(line)
                except ValueError:
                    pass


best = defaultdict(list)  # puzzle -> [(time, config)]
for name in (
    "prefeps_sweep_12s.jsonl",
    "slowwin_sweep_12s.jsonl",
    "style_sweep_12s.jsonl",
    "stage_sweep_10s_misses.jsonl",
):
    for r in rows(name):
        if r.get("solved"):
            cfg = f"{r['mode']}:{r['queue']}:{r['seed']}"
            best[r["puzzle"]].append((r["time"], cfg))

print("== fastest solo config per instance (sweeps) ==")
for p in sorted(best):
    top = sorted(best[p])[:3]
    print(f"  {p:45s} " + "  ".join(f"{c}@{t:.2f}s" for t, c in top))

print()
print("== config coverage (instances it solves fastest / within 2x fastest) ==")
cov_first = defaultdict(list)
cov_near = defaultdict(list)
for p, lst in best.items():
    lst = sorted(lst)
    t0 = lst[0][0]
    cov_first[lst[0][1]].append((p, t0))
    for t, c in lst:
        if t <= max(2 * t0, t0 + 0.5):
            cov_near[c].append((p, t))
for c in sorted(cov_near, key=lambda c: -len(cov_near[c])):
    firsts = len(cov_first.get(c, []))
    tmax = max(t for _, t in cov_near[c])
    print(f"  {c:28s} near-best on {len(cov_near[c]):2d} (best on {firsts:2d}),"
          f" slowest needed {tmax:6.2f}s")
