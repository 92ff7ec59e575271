#!/usr/bin/env python
"""Fleet device-on/off ablation (VERDICT r2 #3): same stratified set, same
budgets, fleet with and without the device worker; one JSON line each.

Env: PW_SET (bench-style spec), PW_BUDGET (default 20).
"""
import json
import os
import sys
import time
import faulthandler

faulthandler.dump_traceback_later(
    int(os.environ.get("PW_HANG_DUMP_S", "3200")), exit=True
)
HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(HERE), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from pushworld_tpu import config
from pushworld_tpu.core.puzzle import Puzzle
from pushworld_tpu.search.planner import warm_transfers_async
from pushworld_tpu.utils.filesystem import get_puzzle_file_paths

warm_transfers_async()

SPEC = os.environ.get("PW_SET", "level1:12,level2:18,level3:18,level4:6")
BUDGET = float(os.environ.get("PW_BUDGET", "20"))
REPS = int(os.environ.get("PW_REPS", "1"))

named = []
for part in SPEC.split(","):
    level, _, count = part.partition(":")
    paths = get_puzzle_file_paths(os.path.join(config.BENCHMARK_PUZZLES_PATH, level))
    names = sorted(paths)[: int(count)] if count else sorted(paths)
    for n in names:
        named.append((f"{level}/{n}", Puzzle.from_file(paths[n])))

from pushworld_tpu.search import fleet as F

for rep in range(REPS):
    for device_worker in (True, False):
        F._reset_device_stats()
        t0 = time.monotonic()
        results = F.plan_puzzles_fleet(
            list(named), time_limit=BUDGET, group_size=8, device_worker=device_worker
        )
        wall = time.monotonic() - t0
        solved = sum(1 for r in results.values() if r.failure_reason is None)
        by_solver = {}
        for r in results.values():
            if r.failure_reason is None:
                by_solver[r.solver] = by_solver.get(r.solver, 0) + 1
        print(
            json.dumps(
                {
                    "rep": rep,
                    "device_worker": device_worker,
                    "solved": solved,
                    "count": len(named),
                    "wall_s": round(wall, 1),
                    "by_solver": by_solver,
                    "device_phases": dict(F._device_stats),
                }
            ),
            flush=True,
        )
print("DONE", flush=True)
