#!/usr/bin/env python
"""Round-2 full-benchmark run of the production host solver (CPU only).

Runs the staged native portfolio (the fleet's host path,
pushworld_tpu.native.bridge.solve_native_staged) over all 223 benchmark
puzzles under the reference protocol's per-puzzle budget
(reference: python3/src/pushworld/benchmark_rgd.py:31-33) and writes one
JSON line per puzzle.

Env:
  PW_BUDGET   per-puzzle seconds (default 60)
  PW_OUT      output jsonl (default scripts_dev/full_bench_r2_<budget>s.jsonl)
  PW_LEVELS   comma list (default level1,level2,level3,level4)
  PW_ONLY     optional file of "level/name" keys to restrict to (one per line)
"""
import faulthandler
import json
import os
import sys
import time

faulthandler.dump_traceback_later(4 * 3600, exit=True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pushworld_tpu import config
from pushworld_tpu.core.puzzle import Puzzle
from pushworld_tpu.native.bridge import is_available, solve_native_staged, stages_for
from pushworld_tpu.utils.filesystem import get_puzzle_file_paths

BUDGET = float(os.environ.get("PW_BUDGET", "60"))
OUT = os.environ.get("PW_OUT") or os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    f"full_bench_r2_{int(BUDGET)}s.jsonl",
)
LEVELS = os.environ.get("PW_LEVELS", "level1,level2,level3,level4").split(",")

only = None
if os.environ.get("PW_ONLY"):
    with open(os.environ["PW_ONLY"]) as f:
        only = {line.strip() for line in f if line.strip()}

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
    for level in LEVELS:
        paths = get_puzzle_file_paths(os.path.join(config.BENCHMARK_PUZZLES_PATH, level))
        for name in sorted(paths):
            key = f"{level}/{name}"
            if key in done or (only is not None and key not in only):
                continue
            p = Puzzle.from_file(paths[name])
            t0 = time.monotonic()
            try:
                plan = solve_native_staged(p, mode="N+RGD", time_limit=BUDGET, stages=stages_for(key))
                dt = time.monotonic() - t0
                ok = plan is not None and (plan == [] or p.is_valid_plan(plan))
                rec = {"puzzle": key, "solved": bool(ok), "time": round(dt, 3),
                       "plan_len": len(plan) if plan else 0,
                       "reason": None if ok else "no solution"}
            except TimeoutError:
                rec = {"puzzle": key, "solved": False,
                       "time": round(time.monotonic() - t0, 3),
                       "plan_len": 0, "reason": "time limit"}
            except MemoryError:
                rec = {"puzzle": key, "solved": False,
                       "time": round(time.monotonic() - t0, 3),
                       "plan_len": 0, "reason": "memory error"}
            except Exception as e:  # noqa: BLE001
                rec = {"puzzle": key, "solved": False,
                       "time": round(time.monotonic() - t0, 3),
                       "plan_len": 0, "reason": f"error: {e}"}
            out.write(json.dumps(rec) + "\n")
            out.flush()
            print(rec, flush=True)
print("DONE", flush=True)
