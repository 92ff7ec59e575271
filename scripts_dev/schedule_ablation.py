#!/usr/bin/env python
"""Staged-portfolio schedule ablation from stage_sweep data.

Reads the (puzzle, mode, queue, seed) -> solve-time table produced by
stage_sweep.py, then:

1. prints the per-config solve counts and the union,
2. greedily builds a restart schedule: repeatedly pick the config whose
   (not-yet-covered solves) per unit of allotted time is best, where a
   config covers a puzzle if its solve time <= the slice it would get,
3. simulates candidate schedules over the measured times (a puzzle is
   solved by the first stage whose slice >= its solve time under that
   config) and prints solved counts.

The sweep only covers instances the CURRENT schedule misses at 60 s, so
any covered instance is a strict improvement (the easy instances solve in
stage 1 of every schedule considered: every candidate keeps N+RGD lifo
seed 0 first).
"""
import collections
import glob
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

times = {}  # (puzzle, cfg) -> solve seconds (or None)
puzzles = set()
for path in glob.glob(os.path.join(HERE, "stage_sweep_*s_*.jsonl")):
    for line in open(path):
        r = json.loads(line)
        cfg = (r["mode"], r["queue"], r["seed"])
        puzzles.add(r["puzzle"])
        times[(r["puzzle"], cfg)] = r["time"] if r["solved"] else None

configs = sorted({cfg for (_, cfg) in times})
print(f"{len(puzzles)} puzzles, {len(configs)} configs")

by_cfg = collections.defaultdict(dict)
for (pz, cfg), t in times.items():
    if t is not None:
        by_cfg[cfg][pz] = t

union = set()
for cfg in configs:
    union |= set(by_cfg[cfg])
print(f"union solved by ANY config within the sweep budget: {len(union)}")
for cfg in sorted(configs, key=lambda c: -len(by_cfg[c])):
    solved = by_cfg[cfg]
    if solved:
        print(f"  {cfg}: {len(solved)}  {sorted(solved)[:4]}{'...' if len(solved) > 4 else ''}")


def simulate(schedule, total=60.0):
    """schedule: list of (cfg, fraction). Returns set of covered puzzles."""
    covered = set()
    for pz in puzzles:
        t_used = 0.0
        for i, (cfg, frac) in enumerate(schedule):
            slice_s = (total - t_used) if i == len(schedule) - 1 else total * frac
            slice_s = min(slice_s, total - t_used)
            if slice_s <= 0:
                break
            t = times.get((pz, cfg))
            if t is not None and t <= slice_s:
                covered.add(pz)
                break
            t_used += slice_s if t is None else slice_s
        # note: unsolved stages consume their full slice
    return covered


def greedy(total=60.0, max_stages=6, min_frac=0.08):
    remaining = set(union)
    schedule = []
    budget_left = 1.0
    while remaining and len(schedule) < max_stages and budget_left > 0:
        best = None
        for cfg in configs:
            # time needed to cover each remaining puzzle with this config
            ts = sorted(
                t for pz, t in by_cfg[cfg].items() if pz in remaining
            )
            if not ts:
                continue
            # best value = max over prefix of (count / time)
            for k in range(len(ts), 0, -1):
                frac = max(min_frac, ts[k - 1] / total)
                if frac > budget_left:
                    continue
                value = k / frac
                if best is None or value > best[0]:
                    best = (value, cfg, frac, k)
                break  # taking the largest affordable prefix is enough
        if best is None:
            break
        _, cfg, frac, k = best
        schedule.append((cfg, round(frac, 3)))
        covered = {
            pz for pz, t in by_cfg[cfg].items()
            if pz in remaining and t <= frac * total
        }
        remaining -= covered
        budget_left -= frac
    return schedule, remaining


if __name__ == "__main__":
    total = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
    schedule, rem = greedy(total=total)
    print("\ngreedy schedule (on top of the default first stage):")
    for cfg, frac in schedule:
        print(f"  {cfg}  frac={frac}")
    print(f"covers {len(union) - len(rem)}/{len(union)} of the union; uncovered: {sorted(rem)[:10]}")
    cov = simulate(schedule, total=total)
    print(f"simulated coverage at {total:.0f}s: {len(cov)}")
