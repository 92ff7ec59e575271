#!/usr/bin/env python
"""Round-5 schedule refit check: validates candidate per-tier staged
schedules against (a) every sweep solo time on record and (b) the
round-4 full-bench wins (each win's cumulative time is mapped into the
round-4 tier schedule to recover that stage config's solo time).

Reports covered/GAINED/LOST vs the round-4 wins per tier.
Usage: python schedule_check_r5.py [budget_s]
"""
import json
import os
import sys
from collections import defaultdict

HERE = os.path.dirname(os.path.abspath(__file__))
BUDGET = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
SAFETY = 1.25

# Round-4 shipped schedules (native/bridge.py @ round-4).
R4_DEFAULT = [
    ("N+RGD", "lifo", 0, 0.12),
    ("N+RGD", "fifo+pref", 0, 0.07),
    ("N+RGD", "lifo+pref", 0, 0.10),
    ("N+RGD", "lifo+eps", 0, 0.09),
    ("RGD", "lifo+pref", 0, 0.06),
    ("N+RGD", "fifo", 3, 0.11),
    ("N+RGD", "lifo", 2, 0.12),
    ("N+RGD", "lifo+lazy", 0, 0.04),
    ("RGD", "lifo", 0, 0.12),
    ("N+RGD", "lifo+pref+eps", 0, 0.17),
]
R4_EASY = [
    ("N+RGD", "lifo", 0, 0.13),
    ("N+RGD", "fifo+pref", 0, 0.07),
    ("N+RGD", "lifo+pref+eps", 0, 0.04),
    ("N+RGD", "lifo+pref+eps", 1, 0.04),
    ("N+RGD", "lifo+pref", 0, 0.06),
    ("N+RGD", "lifo+eps", 0, 0.09),
    ("N+RGD", "lifo", 3, 0.02),
    ("N+RGD", "lifo+eps", 1, 0.55),
]

# --- CANDIDATES (edit to iterate) --------------------------------------
# Hard tier: round-4 DEFAULT with the four new-mechanism stages inserted
# early (cheap covers measured in mech_sweep_12s.jsonl).  The absorber
# keeps "all remaining wall" semantics (last stage).
CAND_DEFAULT = [
    ("N+RGD", "lifo", 0, 0.11),
    ("N+RGD", "lifo+pref+la+eps", 1, 0.01),
    ("N+RGD", "lifo+la", 2, 0.02),
    ("N+RGD", "lifo+pref+eps+gnov", 0, 0.04),
    ("N+RGD", "lifo+gnov", 0, 0.04),
    ("N+RGD", "fifo+pref", 0, 0.07),
    ("N+RGD", "lifo+pref", 0, 0.10),
    ("N+RGD", "lifo+eps", 0, 0.09),
    ("RGD", "lifo+pref", 0, 0.06),
    ("N+RGD", "fifo", 3, 0.06),
    ("N+RGD", "lifo", 1, 0.08),
    ("N+RGD", "lifo", 2, 0.08),
    ("N+RGD", "lifo+lazy", 0, 0.04),
    ("RGD", "lifo", 0, 0.06),
    ("N+RGD", "lifo+pref+eps", 0, 0.14),
]
CAND_EASY = [
    ("N+RGD", "lifo", 0, 0.13),
    ("N+RGD", "lifo+eps", 2, 0.01),
    ("N+RGD", "fifo+pref", 0, 0.07),
    ("N+RGD", "lifo+pref+eps", 0, 0.04),
    ("N+RGD", "lifo+pref+eps", 1, 0.04),
    ("N+RGD", "lifo+pref", 0, 0.06),
    ("N+RGD", "lifo+eps", 0, 0.09),
    ("N+RGD", "lifo", 3, 0.02),
    ("N+RGD", "lifo+eps", 1, 0.54),
]

SWEEP_FILES = [
    "prefeps_sweep_12s.jsonl",
    "slowwin_sweep_12s.jsonl",
    "style_sweep_12s.jsonl",
    "stage_sweep_10s_misses.jsonl",
    "mech_sweep_12s.jsonl",
    "lost_sweep_12s.jsonl",
    "lost2_sweep_12s.jsonl",
    "lost3_sweep_12s.jsonl",
]


def tier(puzzle):
    return "easy" if puzzle.split("/")[0] in ("level1", "level2") else "hard"


solo = defaultdict(dict)
for name in SWEEP_FILES:
    path = os.path.join(HERE, name)
    if not os.path.exists(path):
        continue
    for line in open(path):
        try:
            r = json.loads(line)
        except ValueError:
            continue
        if r.get("solved") and r["time"] <= 12.0:
            key = (r["mode"], r["queue"], r["seed"])
            cur = solo[r["puzzle"]].get(key)
            if cur is None or r["time"] < cur:
                solo[r["puzzle"]][key] = r["time"]

# Round-4 wins -> stage solo times under the r4 tier schedules.
r4_wins = {}
for line in open(os.path.join(HERE, "full_bench_r4_60s.jsonl")):
    r = json.loads(line)
    if r["solved"]:
        r4_wins[r["puzzle"]] = r["time"]
for p, t in r4_wins.items():
    sched = R4_EASY if tier(p) == "easy" else R4_DEFAULT
    start = 0.0
    for i, (mode, queue, seed, frac) in enumerate(sched):
        end = start + frac * 60.0
        last = i == len(sched) - 1
        if t <= end or last:
            in_stage = max(t - start, 0.001)
            key = (mode, queue, seed)
            cur = solo[p].get(key)
            if cur is None or in_stage < cur:
                solo[p][key] = in_stage
            break
        start = end


def simulate(p, sched):
    cum = 0.0
    for i, (mode, queue, seed, frac) in enumerate(sched):
        last = i == len(sched) - 1
        slice_s = (BUDGET - cum) if last else frac * BUDGET
        if slice_s <= 0:
            break
        t = solo.get(p, {}).get((mode, queue, seed))
        if t is not None and t * SAFETY <= slice_s:
            return (mode, queue, seed, cum + t)
        cum += slice_s
    return None


for name, cand in (("DEFAULT", CAND_DEFAULT), ("EASY", CAND_EASY)):
    print(f"\n== {name}: {len(cand)} stages, frac sum "
          f"{sum(f for *_, f in cand):.2f}")
    gained, lost, kept = [], [], []
    for p in sorted(solo):
        if (tier(p) == "easy") != (name == "EASY"):
            continue
        hit = simulate(p, cand)
        if hit and p not in r4_wins:
            gained.append((p, hit))
        elif hit:
            kept.append(p)
        elif p in r4_wins:
            lost.append(p)
    print(f"kept r4 wins (of those with inferred solo): {len(kept)}")
    print(f"GAINED vs r4: {len(gained)}")
    for p, h in gained:
        print(f"  + {p:45s} via {h[0]}:{h[1]}:{h[2]} at ~{h[3]:.1f}s")
    print(f"LOST vs r4: {len(lost)}")
    for p in lost:
        t = r4_wins[p]
        alts = sorted((v, k) for k, v in solo.get(p, {}).items())
        print(f"  - {p:45s} r4_cum={t:5.1f}s  alts: " +
              ("  ".join(f"{m}:{q}:{s}@{v:.2f}" for v, (m, q, s) in alts[:3])
               or "none"))
