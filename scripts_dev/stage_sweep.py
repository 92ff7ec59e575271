#!/usr/bin/env python
"""Config sweep of the native planner over a set of puzzles: every
(mode, queue, seed) gets an independent fixed budget; one JSON line per
(puzzle, config).  Data source for the staged-portfolio schedule ablation.

Env:
  PW_BUDGET   per-config seconds (default 10)
  PW_ONLY     file of "level/name" keys (required)
  PW_OUT      output jsonl
  PW_SHARD    "i/n"
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pushworld_tpu import config
from pushworld_tpu.core.compiled import compile_puzzle
from pushworld_tpu.core.puzzle import Puzzle
from pushworld_tpu.native.bridge import solve_native
from pushworld_tpu.utils.filesystem import get_puzzle_file_paths

BUDGET = float(os.environ.get("PW_BUDGET", "10"))
SHARD_I, SHARD_N = [int(x) for x in os.environ.get("PW_SHARD", "0/1").split("/")]
OUT = os.environ.get("PW_OUT") or os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    f"stage_sweep_{int(BUDGET)}s_{SHARD_I}of{SHARD_N}.jsonl",
)

with open(os.environ["PW_ONLY"]) as f:
    keys = [line.strip() for line in f if line.strip()]

if os.environ.get("PW_CONFIGS"):
    # "mode:queue:seed,mode:queue:seed,..." — queue may carry +lazy/+prune.
    CONFIGS = [
        (m, q, int(s))
        for m, q, s in (c.split(":") for c in os.environ["PW_CONFIGS"].split(","))
    ]
else:
    CONFIGS = [
        (mode, queue, seed)
        for mode in ("N+RGD", "RGD")
        for queue in ("lifo", "fifo")
        for seed in range(4)
    ]

done = set()
if os.path.exists(OUT):
    with open(OUT) as f:
        for line in f:
            try:
                r = json.loads(line)
                done.add((r["puzzle"], r["mode"], r["queue"], r["seed"]))
            except Exception:
                pass

paths_by_level = {}
with open(OUT, "a") as out:
    for i, key in enumerate(keys):
        if i % SHARD_N != SHARD_I:
            continue
        lvl, name = key.split("/", 1)
        if lvl not in paths_by_level:
            paths_by_level[lvl] = get_puzzle_file_paths(
                os.path.join(config.BENCHMARK_PUZZLES_PATH, lvl)
            )
        p = Puzzle.from_file(paths_by_level[lvl][name])
        cp = compile_puzzle(p)
        for mode, queue, seed in CONFIGS:
            if (key, mode, queue, seed) in done:
                continue
            t0 = time.monotonic()
            try:
                plan = solve_native(
                    p, compiled=cp, mode=mode, time_limit=BUDGET,
                    seed=seed, queue=queue,
                )
                dt = time.monotonic() - t0
                ok = plan is not None and (plan == [] or p.is_valid_plan(plan))
                rec = dict(puzzle=key, mode=mode, queue=queue, seed=seed,
                           solved=bool(ok), time=round(dt, 3),
                           plan_len=len(plan) if plan else 0)
            except TimeoutError:
                rec = dict(puzzle=key, mode=mode, queue=queue, seed=seed,
                           solved=False, time=BUDGET, plan_len=0)
            except MemoryError:
                rec = dict(puzzle=key, mode=mode, queue=queue, seed=seed,
                           solved=False, time=round(time.monotonic() - t0, 3),
                           plan_len=0, reason="memory")
            out.write(json.dumps(rec) + "\n")
            out.flush()
        print(f"done {key}", flush=True)
print("DONE", flush=True)
