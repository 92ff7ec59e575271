#!/usr/bin/env python
"""Headline benchmark for pushworld-tpu.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline: benchmark puzzles solved per second by the batched device planner
(N+RGD) under a per-puzzle 60 s budget, on a level-1 subset.  ``vs_baseline``
compares against this framework's native C++ serial planner alone (the
stand-in for the reference C++ RGD planner — same algorithm class: greedy
best-first, novelty + fewest-tools RGD, reference: cpp/src/run_planner.cc:
37-61) on the same puzzles and budget.  The headline planner is the
heterogeneous portfolio (batched TPU search racing the native planner).

Environment overrides:
  PUSHWORLD_BENCH_COUNT   number of puzzles (default 16)
  PUSHWORLD_BENCH_LEVEL   benchmark level directory (default level1)
  PUSHWORLD_BENCH_BUDGET  per-puzzle seconds (default 60)
"""

import json
import os
import time


def main():
    count = int(os.environ.get("PUSHWORLD_BENCH_COUNT", "16"))
    level = os.environ.get("PUSHWORLD_BENCH_LEVEL", "level1")
    budget = float(os.environ.get("PUSHWORLD_BENCH_BUDGET", "60"))

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from pushworld_tpu import config
    from pushworld_tpu.core.puzzle import Puzzle
    from pushworld_tpu.native import is_available, solve_native
    from pushworld_tpu.search.host_planner import solve_host
    from pushworld_tpu.search.planner import plan_puzzles, warm_transfers_async
    from pushworld_tpu.utils.filesystem import get_puzzle_file_paths

    # The axon platform's one-time D2H setup (tens of seconds) overlaps the
    # load/parse/warm-up phase below.
    warm_transfers_async()

    paths = get_puzzle_file_paths(os.path.join(config.BENCHMARK_PUZZLES_PATH, level))
    names = sorted(paths)[:count]
    named = [(n, Puzzle.from_file(paths[n])) for n in names]

    # Warm-up: compile/cache the bucket kernels and transfer paths on the
    # first two puzzles (not timed — the headline measures steady-state
    # planning throughput, matching the reference protocol's per-puzzle
    # budgets which exclude planner build time).
    plan_puzzles(named[:2], time_limit=min(10.0, budget), progress=False)

    # --- device planner (the headline).
    t0 = time.monotonic()
    results = plan_puzzles(named, time_limit=budget, progress=False)
    device_wall = time.monotonic() - t0
    device_solved = sum(
        1 for n in names if results[n].failure_reason is None
    )

    # --- native serial baseline on the same protocol.
    t0 = time.monotonic()
    host_solved = 0
    use_native = is_available()
    for n, p in named:
        try:
            if use_native:
                plan = solve_native(p, mode="N+RGD", time_limit=budget)
            else:
                plan = solve_host(p, mode="N+RGD", time_limit=budget)
            if plan is not None and (plan == [] or p.is_valid_plan(plan)):
                host_solved += 1
        except TimeoutError:
            pass
    host_wall = time.monotonic() - t0

    value = device_solved / device_wall if device_wall > 0 else 0.0
    baseline = host_solved / host_wall if host_wall > 0 else 1e-9
    print(
        json.dumps(
            {
                "metric": f"{level}_puzzles_solved_per_s",
                "value": round(value, 4),
                "unit": "puzzles/s",
                "vs_baseline": round(value / baseline, 3),
                "detail": {
                    "device_solved": device_solved,
                    "host_solved": host_solved,
                    "count": count,
                    "device_wall_s": round(device_wall, 1),
                    "host_wall_s": round(host_wall, 1),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
