#!/usr/bin/env python
"""Headline benchmark for pushworld-tpu.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline: benchmark puzzles solved per second by the heterogeneous fleet
executor (host native workers + TPU group-vmapped batched search,
pushworld_tpu.search.fleet) under the reference benchmark protocol's
per-puzzle budget.  ``vs_baseline`` compares against the reference
protocol itself: one single-threaded serial N+RGD planner solving the same
puzzles sequentially (the native planner here is this framework's
re-architected equivalent of the reference C++ RGD planner — same algorithm
class: greedy best-first, novelty + fewest-tools RGD, reference:
cpp/src/run_planner.cc:37-61 — and at least as fast per instance, so the
baseline is conservative).

Environment overrides:
  PUSHWORLD_BENCH_SET     comma-separated level:count specs
                          (default "level1:68,level2:12")
  PUSHWORLD_BENCH_BUDGET  per-puzzle seconds (default 30)
"""

import json
import os
import time


def load_set(spec: str):
    from pushworld_tpu import config
    from pushworld_tpu.core.puzzle import Puzzle
    from pushworld_tpu.utils.filesystem import get_puzzle_file_paths

    named = []
    for part in spec.split(","):
        level, _, count = part.partition(":")
        paths = get_puzzle_file_paths(
            os.path.join(config.BENCHMARK_PUZZLES_PATH, level.strip())
        )
        names = sorted(paths)
        if count:
            names = names[: int(count)]
        named.extend(
            (f"{level}/{n}", Puzzle.from_file(paths[n])) for n in names
        )
    return named


def main():
    spec = os.environ.get("PUSHWORLD_BENCH_SET", "level1:68,level2:12")
    budget = float(os.environ.get("PUSHWORLD_BENCH_BUDGET", "30"))

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from pushworld_tpu.native import is_available, solve_native
    from pushworld_tpu.search.fleet import plan_puzzles_fleet
    from pushworld_tpu.search.host_planner import solve_host
    from pushworld_tpu.search.planner import warm_transfers_async

    # The axon platform's one-time D2H setup (tens of seconds) overlaps the
    # load/parse phase below.
    warm_transfers_async()

    named = load_set(spec)

    # --- fleet executor (the headline).
    t0 = time.monotonic()
    results = plan_puzzles_fleet(named, time_limit=budget, group_size=8)
    fleet_wall = time.monotonic() - t0
    fleet_solved = sum(1 for r in results.values() if r.failure_reason is None)
    by_solver = {}
    for r in results.values():
        if r.failure_reason is None:
            by_solver[r.solver] = by_solver.get(r.solver, 0) + 1

    # --- reference-protocol baseline: sequential single-threaded serial
    # planner, same puzzles, same per-puzzle budget.
    t0 = time.monotonic()
    base_solved = 0
    use_native = is_available()
    for n, p in named:
        try:
            if use_native:
                plan = solve_native(p, mode="N+RGD", time_limit=budget)
            else:
                plan = solve_host(p, mode="N+RGD", time_limit=budget)
            if plan is not None and (plan == [] or p.is_valid_plan(plan)):
                base_solved += 1
        except (TimeoutError, MemoryError):
            pass
    base_wall = time.monotonic() - t0

    value = fleet_solved / fleet_wall if fleet_wall > 0 else 0.0
    baseline = base_solved / base_wall if base_wall > 0 else 1e-9
    print(
        json.dumps(
            {
                "metric": "benchmark_puzzles_solved_per_s",
                "value": round(value, 4),
                "unit": "puzzles/s",
                "vs_baseline": round(value / baseline, 3),
                "detail": {
                    "set": spec,
                    "budget_s": budget,
                    "fleet_solved": fleet_solved,
                    "fleet_by_solver": by_solver,
                    "baseline_solved": base_solved,
                    "count": len(named),
                    "fleet_wall_s": round(fleet_wall, 1),
                    "baseline_wall_s": round(base_wall, 1),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
