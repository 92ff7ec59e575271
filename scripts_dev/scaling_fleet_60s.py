#!/usr/bin/env python
"""Host-worker scaling at the reference protocol's 60 s budget
(VERDICT r3 #6): plan_puzzles_fleet with 1 vs 2 native workers, device
off, on a fixed level2 subset.  Prints one JSON line per arm.

The 5 s round-3 measurement maximized tail distortion (a single
full-budget miss is 1/7 of the whole wall); at 60 s the tail amortizes
over the much longer solved-instance stream.

Env: PW_COUNT (default 36), PW_BUDGET (default 60), PW_WORKERS ("1,2").
"""
import json
import os
import sys
import time
import faulthandler

faulthandler.dump_traceback_later(4 * 3600, exit=True)
HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

from pushworld_tpu import config
from pushworld_tpu.core.puzzle import Puzzle
from pushworld_tpu.search.fleet import plan_puzzles_fleet
from pushworld_tpu.utils.filesystem import get_puzzle_file_paths

COUNT = int(os.environ.get("PW_COUNT", "36"))
BUDGET = float(os.environ.get("PW_BUDGET", "60"))
WORKERS = [int(x) for x in os.environ.get("PW_WORKERS", "1,2").split(",")]

paths = get_puzzle_file_paths(os.path.join(config.BENCHMARK_PUZZLES_PATH, "level2"))
names = sorted(paths)[:COUNT]
named = [(f"level2/{n}", Puzzle.from_file(paths[n])) for n in names]

base_rate = None
for w in WORKERS:
    t0 = time.monotonic()
    results = plan_puzzles_fleet(
        list(named), time_limit=BUDGET, native_workers=w, device_worker=False
    )
    wall = time.monotonic() - t0
    solved = sum(1 for r in results.values() if r.failure_reason is None)
    rate = solved / wall if wall else 0.0
    row = {
        "workers": w,
        "solved": solved,
        "count": len(named),
        "wall_s": round(wall, 1),
        "puzzles_per_s": round(rate, 4),
    }
    if base_rate is None:
        base_rate = rate
    else:
        row["efficiency_vs_1w"] = round(rate / (base_rate * w), 3)
    print(json.dumps(row), flush=True)
