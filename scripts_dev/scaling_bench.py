#!/usr/bin/env python
"""Scaling-efficiency measurement: puzzles/s at 1 vs N processes.

Runs the multi-process benchmark CLI (scripts/benchmark_distributed.py)
over a fixed puzzle set with ONE host planner thread per process, on the
CPU backend, and reports throughput + efficiency vs the 1-process run.
Prints one JSON line per configuration and a final summary line.

Env:
  PW_LEVEL     puzzle subdir (default level1)
  PW_BUDGET    per-puzzle seconds (default 10)
  PW_NPROCS    comma list of process counts (default "1,2")
"""
import json
import os
import socket
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

from pushworld_tpu import config  # noqa: E402

LEVEL = os.environ.get("PW_LEVEL", "level1")
BUDGET = os.environ.get("PW_BUDGET", "10")
NPROCS = [int(x) for x in os.environ.get("PW_NPROCS", "1,2").split(",")]
PUZZLES = os.path.join(config.BENCHMARK_PUZZLES_PATH, LEVEL)


def free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_config(nproc: int):
    port = free_port()
    procs = []
    for pid in range(nproc):
        env = dict(
            os.environ,
            PW_COORDINATOR=f"127.0.0.1:{port}",
            PW_NUM_PROCESSES=str(nproc),
            PW_PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, "-m",
                    "pushworld_tpu.scripts.benchmark_distributed",
                    PUZZLES,
                    "--time-limit", BUDGET,
                    "--native-workers", "1",
                    "--platform", "cpu",
                ],
                env=env, cwd=ROOT,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    outs = [p.communicate(timeout=3600) for p in procs]
    for p, (o, e) in zip(procs, outs):
        if p.returncode != 0:
            raise RuntimeError(f"process failed rc={p.returncode}\n{e[-2000:]}")
    docs = []
    for o, _ in outs:
        line = [l for l in o.strip().splitlines() if l.startswith("{")][-1]
        docs.append(json.loads(line))
    # Every process reports the COMPLETE merged results: same solved/count.
    solved = docs[0]["solved"]
    count = docs[0]["count"]
    assert all(d["solved"] == solved and d["count"] == count for d in docs)
    wall = max(d["wall_s"] for d in docs)
    return {
        "n_processes": nproc,
        "solved": solved,
        "count": count,
        "wall_s": wall,
        "puzzles_per_s": round(solved / wall, 3),
    }


results = []
for n in NPROCS:
    r = run_config(n)
    results.append(r)
    print(json.dumps(r), flush=True)

base = results[0]
summary = {
    "set": f"{LEVEL} ({base['count']} puzzles)",
    "budget_s": float(BUDGET),
    "throughput": {str(r["n_processes"]): r["puzzles_per_s"] for r in results},
    "efficiency_vs_1proc": {
        str(r["n_processes"]): round(
            r["puzzles_per_s"]
            / (base["puzzles_per_s"] * r["n_processes"] / base["n_processes"]),
            3,
        )
        for r in results
    },
}
print(json.dumps(summary), flush=True)
