#!/usr/bin/env python
"""Pure-device attack on the host planner's missed instances: runs the
fleet's device multiplexer alone (no host workers) over a list of puzzles
on the real chip, and records per-puzzle outcomes.

Env:
  PW_ONLY     file of "level/name" keys (default scripts_dev/misses_60s.txt)
  PW_BUDGET   per-puzzle seconds (default 120)
  PW_OUT      output jsonl
  PW_EXPAND   states expanded per iteration (default 256)
"""
import faulthandler
import json
import os
import sys
import time

faulthandler.dump_traceback_later(4 * 3600, exit=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from pushworld_tpu import config
from pushworld_tpu.core.puzzle import Puzzle
from pushworld_tpu.search.fleet import _device_multiplex
from pushworld_tpu.search.planner import warm_transfers_async
from pushworld_tpu.utils.filesystem import get_puzzle_file_paths

BUDGET = float(os.environ.get("PW_BUDGET", "120"))
ONLY = os.environ.get("PW_ONLY") or os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "misses_60s.txt"
)
OUT = os.environ.get("PW_OUT") or os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    f"device_misses_{int(BUDGET)}s.jsonl",
)
EXPAND = int(os.environ.get("PW_EXPAND", "256"))

warm_transfers_async()

with open(ONLY) as f:
    keys = [line.strip() for line in f if line.strip()]

done = set()
if os.path.exists(OUT):
    with open(OUT) as f:
        for line in f:
            try:
                done.add(json.loads(line)["puzzle"])
            except Exception:
                pass
keys = [k for k in keys if k not in done]

named = []
paths_by_level = {}
for key in keys:
    lvl, name = key.split("/", 1)
    if lvl not in paths_by_level:
        paths_by_level[lvl] = get_puzzle_file_paths(
            os.path.join(config.BENCHMARK_PUZZLES_PATH, lvl)
        )
    named.append((key, Puzzle.from_file(paths_by_level[lvl][name])))

t_start = time.monotonic()
with open(OUT, "a") as out:
    for key, r in _device_multiplex(
        named, time_limit=BUDGET, expand=EXPAND
    ):
        rec = {
            "puzzle": key,
            "solved": r.failure_reason is None,
            "time": round(r.planning_time, 3),
            "plan_len": len(r.plan) if r.plan else 0,
            "reason": r.failure_reason,
        }
        out.write(json.dumps(rec) + "\n")
        out.flush()
        print(rec, flush=True)
print(f"DONE in {time.monotonic() - t_start:.0f}s", flush=True)
