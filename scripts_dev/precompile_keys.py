#!/usr/bin/env python
"""Warms the persistent compile cache for every device-search program the
fleet can dispatch on the full benchmark (one representative instance per
coarse bucket key).  Run once after any kernel change; afterwards every
bench run hits only cached programs.

Env: PW_LEVELS (default all), PW_BUDGET per-key smoke seconds (default 2).
"""
import json
import os
import sys
import time
import faulthandler

faulthandler.dump_traceback_later(3000, exit=True)
HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(HERE), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np

from pushworld_tpu import config
from pushworld_tpu.core.compiled import compile_puzzle, compute_delta
from pushworld_tpu.core.puzzle import Puzzle
from pushworld_tpu.ops.rgd import build_rgd_tables, dflat_required
from pushworld_tpu.search.batched import BatchedPlanner, required_depth, run_chunk, search_status
from pushworld_tpu.search.planner import (
    _CMAX_AGENT_LADDER, _CMAX_LADDER, _DFLAT_LADDER, _GOALS_LADDER,
    _pad, _profile_for, warm_transfers_async,
)
from pushworld_tpu.utils.filesystem import get_puzzle_file_paths

warm_transfers_async()

LEVELS = os.environ.get("PW_LEVELS", "level1,level2,level3,level4").split(",")

reps = {}
for lvl in LEVELS:
    paths = get_puzzle_file_paths(os.path.join(config.BENCHMARK_PUZZLES_PATH, lvl))
    for n in sorted(paths):
        p = Puzzle.from_file(paths[n])
        prof = _profile_for(p.num_movables, max(p.height, p.width), compute_delta(p))
        cp = compile_puzzle(p, prof[0], prof[1], prof[1], prof[2])
        depth = required_depth(p)
        dflat = _pad(_DFLAT_LADDER, dflat_required(p, cp, depth))
        if depth > 0 or dflat > (1 << 20):
            continue  # the fleet's device path declines these groups
        counts = np.asarray(cp.push).reshape(4, prof[0], prof[0], -1).sum(-1)
        cagent = _pad(_CMAX_AGENT_LADDER, max(1, int(counts[:, 0, :].max())))
        cmax = _pad(_CMAX_LADDER, max(1, int(counts.max())))
        goals = _pad(_GOALS_LADDER, p.num_goals)
        key = (prof, depth, dflat, cagent, cmax, goals)
        reps.setdefault(key, (f"{lvl}/{n}", p, cp))

print(f"# {len(reps)} distinct device keys", flush=True)
for key, (name, p, cp) in reps.items():
    prof, depth, dflat, cagent, cmax, goals = key
    t0 = time.monotonic()
    tables = build_rgd_tables(
        p, cp, cmax_pad=cmax, max_goals=goals, max_depth=depth,
        dflat_cap=dflat, cmax_agent_pad=cagent,
    )
    pl = BatchedPlanner(
        p, cp=cp, tables=tables, expand=256, frontier_capacity=1 << 15,
        visited_bits=21, history_capacity=1 << 21, max_depth=depth,
        lazy=os.environ.get("PW_LAZY", "1") == "1",  # match fleet device path
    )
    # BOTH chunk sizes the fleet dispatches: 1 (group warm-up) and the
    # production CHUNK — each static chunk value is its own program.
    from pushworld_tpu.search.planner import CHUNK

    s = run_chunk(pl.cp, pl.tables, pl.config, pl.init_state(), 1)
    np.asarray(search_status(s))
    s = run_chunk(pl.cp, pl.tables, pl.config, s, CHUNK)
    np.asarray(search_status(s))
    print(json.dumps({"key": [list(prof), depth, dflat, cagent, cmax, goals],
                      "rep": name, "compile_s": round(time.monotonic() - t0, 1)}),
          flush=True)
print("DONE", flush=True)
