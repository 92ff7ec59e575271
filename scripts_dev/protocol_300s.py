#!/usr/bin/env python
"""5-minute-budget protocol run on a miss set: ours (staged native
portfolio) OR the reference planner, selected by PW_PLANNER.

The reference claims SOTA at 1/5/30-minute budgets (reference:
README.md:12-16); this measures the 300 s point on the instances our
60 s run misses (VERDICT r3 #7).  One JSON line per instance.

Env:
  PW_PLANNER  "ours" | "ref"   (required)
  PW_ONLY     file of "level/name" keys (required)
  PW_BUDGET   seconds (default 300)
  PW_OUT      output jsonl (required)
  PW_SHARD    "i/n" (default 0/1)
"""
import json
import os
import resource
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pushworld_tpu import config
from pushworld_tpu.core.puzzle import Puzzle
from pushworld_tpu.utils.filesystem import get_puzzle_file_paths

PLANNER = os.environ["PW_PLANNER"]
BUDGET = float(os.environ.get("PW_BUDGET", "300"))
OUT = os.environ["PW_OUT"]
SHARD_I, SHARD_N = [int(x) for x in os.environ.get("PW_SHARD", "0/1").split("/")]
REF_BIN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ref_planner")
ACTION = {"L": 0, "R": 1, "U": 2, "D": 3}

with open(os.environ["PW_ONLY"]) as f:
    keys = [line.strip() for line in f if line.strip()]
keys = [k for i, k in enumerate(keys) if i % SHARD_N == SHARD_I]

done = set()
if os.path.exists(OUT):
    with open(OUT) as f:
        for line in f:
            try:
                done.add(json.loads(line)["puzzle"])
            except Exception:
                pass


def solve_ref(path, puzzle):
    def limits():
        resource.setrlimit(resource.RLIMIT_CPU, (int(BUDGET), int(BUDGET) + 5))
        resource.setrlimit(resource.RLIMIT_AS, (30 * 1024**3,) * 2)

    try:
        proc = subprocess.run(
            [REF_BIN, "N+RGD", path], capture_output=True, text=True,
            preexec_fn=limits, timeout=BUDGET + 60,
        )
        out = proc.stdout.strip()
    except subprocess.TimeoutExpired:
        out = ""
    if out and all(c in ACTION for c in out):
        plan = [ACTION[c] for c in out]
        if puzzle.is_valid_plan(plan):
            return plan
    return None


def solve_ours(puzzle, key):
    from pushworld_tpu.native.bridge import solve_native_staged, stages_for

    try:
        plan = solve_native_staged(puzzle, time_limit=BUDGET, stages=stages_for(key))
    except (TimeoutError, MemoryError):
        return None
    if plan is not None and (plan == [] or puzzle.is_valid_plan(plan)):
        return plan
    return None


with open(OUT, "a") as out:
    for key in keys:
        if key in done:
            continue
        lvl, name = key.split("/", 1)
        path = get_puzzle_file_paths(
            os.path.join(config.BENCHMARK_PUZZLES_PATH, lvl)
        )[name]
        p = Puzzle.from_file(path)
        t0 = time.monotonic()
        plan = solve_ref(path, p) if PLANNER == "ref" else solve_ours(p, key)
        row = {
            "puzzle": key,
            "planner": PLANNER,
            "budget_s": BUDGET,
            "solved": plan is not None,
            "time": round(time.monotonic() - t0, 2),
            "plan_len": len(plan) if plan else 0,
        }
        print(json.dumps(row), flush=True)
        out.write(json.dumps(row) + "\n")
        out.flush()
