#!/usr/bin/env python
"""Runs the cross-chip frontier-sharded search on REAL TPU hardware for
level4-scale benchmark instances (single-chip mesh today — the 1-device
mesh exercises the identical shard_map program the n-chip path runs).

Records one JSON line per instance: compile/solve wall, outcome, plan
length.  This is the hardware qualification for wiring
solve_frontier_sharded into the fleet as the level4 path (VERDICT r3 #5).

Env:
  PW_ONLY    file of "level/name" keys (default: all level4)
  PW_BUDGET  per-instance seconds (default 120)
  PW_EXPAND  per-shard expand (default 256)
  PW_OUT     output jsonl
"""
import faulthandler
import json
import os
import sys
import time

faulthandler.dump_traceback_later(3 * 3600, exit=True)
HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.join(os.path.dirname(HERE), ".jax_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from pushworld_tpu import config
from pushworld_tpu.core.puzzle import Puzzle
from pushworld_tpu.parallel.frontier_sharded import solve_frontier_sharded
from pushworld_tpu.parallel.mesh import make_mesh
from pushworld_tpu.search.planner import warm_transfers_async
from pushworld_tpu.utils.filesystem import get_puzzle_file_paths

warm_transfers_async()

BUDGET = float(os.environ.get("PW_BUDGET", "120"))
EXPAND = int(os.environ.get("PW_EXPAND", "256"))
VISITED_BITS = int(os.environ.get("PW_VISITED_BITS", "23"))
HISTORY = int(os.environ.get("PW_HISTORY", str(1 << 22)))
OUT = os.environ.get("PW_OUT") or os.path.join(HERE, "sharded_level4_probe.jsonl")

only = None
if os.environ.get("PW_ONLY"):
    with open(os.environ["PW_ONLY"]) as f:
        only = [line.strip() for line in f if line.strip()]

paths = get_puzzle_file_paths(os.path.join(config.BENCHMARK_PUZZLES_PATH, "level4"))
keys = only if only is not None else [f"level4/{n}" for n in sorted(paths)]

mesh = make_mesh()
print(f"# mesh: {mesh.shape}, devices: {jax.device_count()}", flush=True)

with open(OUT, "a") as out:
    for key in keys:
        level, name = key.split("/", 1)
        p = Puzzle.from_file(
            get_puzzle_file_paths(
                os.path.join(config.BENCHMARK_PUZZLES_PATH, level)
            )[name]
        )
        t0 = time.monotonic()
        stats: dict = {}
        row = {"puzzle": key, "expand": EXPAND, "budget_s": BUDGET,
               "n_shards": mesh.size, "visited_bits": VISITED_BITS,
               "history_capacity": HISTORY}
        try:
            plan = solve_frontier_sharded(
                p, mesh=mesh, time_limit=BUDGET, expand=EXPAND,
                frontier_capacity=1 << 15, visited_bits=VISITED_BITS,
                history_capacity=HISTORY, stats_out=stats,
            )
            row["wall_s"] = round(time.monotonic() - t0, 2)
            if plan is None:
                row["outcome"] = "no solution"
            else:
                row["outcome"] = "solved"
                row["plan_len"] = len(plan)
                row["valid"] = p.is_valid_plan(plan)
        except TimeoutError as e:
            row["wall_s"] = round(time.monotonic() - t0, 2)
            row["outcome"] = f"timeout: {e}"
        except Exception as e:  # pragma: no cover
            row["wall_s"] = round(time.monotonic() - t0, 2)
            row["outcome"] = f"error: {type(e).__name__}: {e}"
        row.update(stats)
        print(json.dumps(row), flush=True)
        out.write(json.dumps(row) + "\n")
        out.flush()
