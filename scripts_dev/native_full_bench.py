#!/usr/bin/env python
"""Full-benchmark native serial planner run (CPU only; no TPU usage).

Writes one JSON line per puzzle to scripts_dev/native_full_bench.jsonl.
"""
import faulthandler
import json
import os
import sys
import time

faulthandler.dump_traceback_later(3600, exit=True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pushworld_tpu import config
from pushworld_tpu.core.puzzle import Puzzle
from pushworld_tpu.native import is_available, solve_native
from pushworld_tpu.utils.filesystem import get_puzzle_file_paths

BUDGET = float(os.environ.get("PW_BUDGET", "60"))
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native_full_bench.jsonl")

assert is_available()

done = set()
if os.path.exists(OUT):
    with open(OUT) as f:
        for line in f:
            try:
                done.add(json.loads(line)["puzzle"])
            except Exception:
                pass

with open(OUT, "a") as out:
    for level in ("level1", "level2", "level3", "level4"):
        paths = get_puzzle_file_paths(os.path.join(config.BENCHMARK_PUZZLES_PATH, level))
        for name in sorted(paths):
            key = f"{level}/{name}"
            if key in done:
                continue
            p = Puzzle.from_file(paths[name])
            t0 = time.monotonic()
            try:
                plan = solve_native(p, mode="N+RGD", time_limit=BUDGET)
                dt = time.monotonic() - t0
                ok = plan is not None and (plan == [] or p.is_valid_plan(plan))
                rec = {"puzzle": key, "solved": bool(ok), "time": round(dt, 3),
                       "plan_len": len(plan) if plan else 0,
                       "reason": None if ok else "no solution"}
            except TimeoutError:
                rec = {"puzzle": key, "solved": False,
                       "time": round(time.monotonic() - t0, 3),
                       "plan_len": 0, "reason": "time limit"}
            except Exception as e:  # noqa: BLE001
                rec = {"puzzle": key, "solved": False,
                       "time": round(time.monotonic() - t0, 3),
                       "plan_len": 0, "reason": f"error: {e}"}
            out.write(json.dumps(rec) + "\n")
            out.flush()
            print(rec, flush=True)
print("DONE", flush=True)
