#!/usr/bin/env python
"""Race the actual reference C++ planner (built unmodified via
scripts_dev/boost_shim) over benchmark puzzles under the reference's own
protocol: per-puzzle CPU-time rlimit, 30 GB address-space rlimit, stdout
classification (reference: python3/src/pushworld/benchmark_rgd.py:31-117,
utils/process.py:61-84).

Env:
  PW_BUDGET   per-puzzle CPU seconds (default 60)
  PW_OUT      output jsonl
  PW_SHARD    "i/n" — run puzzles with index % n == i (for multi-worker)
  PW_LEVELS   comma list (default all four)
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

BUDGET = float(os.environ.get("PW_BUDGET", "60"))
SHARD_I, SHARD_N = (
    [int(x) for x in os.environ.get("PW_SHARD", "0/1").split("/")]
)
OUT = os.environ.get("PW_OUT") or os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    f"ref_race_{int(BUDGET)}s_{SHARD_I}of{SHARD_N}.jsonl",
)
LEVELS = os.environ.get("PW_LEVELS", "level1,level2,level3,level4").split(",")
PLANNER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ref_planner")
MEM_LIMIT = 30 * 1024**3
ACTION = {"L": 0, "R": 1, "U": 2, "D": 3}


def set_limits():
    resource.setrlimit(resource.RLIMIT_CPU, (int(BUDGET), int(BUDGET) + 5))
    resource.setrlimit(resource.RLIMIT_AS, (MEM_LIMIT, MEM_LIMIT))


done = set()
if os.path.exists(OUT):
    with open(OUT) as f:
        for line in f:
            try:
                done.add(json.loads(line)["puzzle"])
            except Exception:
                pass

tasks = []
for level in LEVELS:
    paths = get_puzzle_file_paths(os.path.join(config.BENCHMARK_PUZZLES_PATH, level))
    for name in sorted(paths):
        tasks.append((f"{level}/{name}", paths[name]))

with open(OUT, "a") as out:
    for idx, (key, path) in enumerate(tasks):
        if idx % SHARD_N != SHARD_I or key in done:
            continue
        cpu0 = resource.getrusage(resource.RUSAGE_CHILDREN)
        t0 = time.monotonic()
        try:
            proc = subprocess.run(
                [PLANNER, "N+RGD", path],
                capture_output=True,
                text=True,
                preexec_fn=set_limits,
                timeout=BUDGET + 30,
            )
            stdout = proc.stdout.strip()
        except subprocess.TimeoutExpired:
            stdout = ""
        cpu1 = resource.getrusage(resource.RUSAGE_CHILDREN)
        cpu = (cpu1.ru_utime + cpu1.ru_stime) - (cpu0.ru_utime + cpu0.ru_stime)
        wall = time.monotonic() - t0

        if stdout == "NO SOLUTION":
            rec = {"puzzle": key, "solved": False, "cpu": round(cpu, 3),
                   "plan_len": 0, "reason": "no solution"}
        elif stdout and all(c in ACTION for c in stdout):
            plan = [ACTION[c] for c in stdout]
            ok = Puzzle.from_file(path).is_valid_plan(plan)
            rec = {"puzzle": key, "solved": bool(ok), "cpu": round(cpu, 3),
                   "plan_len": len(plan),
                   "reason": None if ok else "invalid plan"}
        elif "bad_alloc" in stdout or "bad_alloc" in (proc.stderr or ""):
            rec = {"puzzle": key, "solved": False, "cpu": round(cpu, 3),
                   "plan_len": 0, "reason": "memory error"}
        else:
            rec = {"puzzle": key, "solved": False, "cpu": round(min(cpu, BUDGET), 3),
                   "plan_len": 0, "reason": "time limit"}
        rec["wall"] = round(wall, 3)
        out.write(json.dumps(rec) + "\n")
        out.flush()
        print(rec, flush=True)
print("DONE", flush=True)
