#!/usr/bin/env python
"""Headline benchmark for pushworld-tpu.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline: benchmark puzzles solved per second by the heterogeneous fleet
executor (host native workers + TPU batched search,
pushworld_tpu.search.fleet) under the reference benchmark protocol's
per-puzzle budget.

``vs_baseline`` races the ACTUAL reference C++ planner (DeepMind's
run_planner, built unmodified from /root/reference/cpp with the std-based
Boost shims in scripts_dev/boost_shim) sequentially on the same puzzles
with the same per-puzzle CPU budget, rlimit-enforced exactly like the
reference harness (reference: python3/src/pushworld/benchmark_rgd.py:31-33,
utils/process.py:61-84).  When the reference binary cannot be built, the
baseline falls back to this framework's own serial native planner (a
strictly stronger baseline than the reference on the published benchmark:
at 60 s it solves 168/223 vs the reference's 150/223).

The default set is STRATIFIED across difficulty levels — it includes
level3/level4 instances the serial planners time out on, which is where
the TPU batched search earns solves.

Environment overrides:
  PUSHWORLD_BENCH_SET     comma-separated level:count specs
                          (default "level1:12,level2:18,level3:18,level4:6")
  PUSHWORLD_BENCH_BUDGET  per-puzzle seconds (default 20)
  PUSHWORLD_BENCH_BASELINE  "ref" | "native" | "skip" (default ref)
  PUSHWORLD_BENCH_PROTOCOL  "full60" = the protocol-grade run in one line:
                          all 223 benchmark puzzles, 60 s per-puzzle budget,
                          raced against the reference planner (expect ~2.5 h
                          wall: ours + the sequential reference baseline)
  PUSHWORLD_BENCH_ENV     "0" disables the vectorized-env throughput
                          measurement (steps/s/chip, reported in detail)
  PW_PROFILE_DIR          when set, capture a jax.profiler trace of the
                          fleet run into this directory
"""

import json
import os
import resource
import subprocess
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REF_CPP = "/root/reference/cpp"
REF_BIN = os.path.join(HERE, "scripts_dev", "ref_planner")
ACTION = {"L": 0, "R": 1, "U": 2, "D": 3}


def load_set(spec: str):
    from pushworld_tpu import config
    from pushworld_tpu.core.puzzle import Puzzle
    from pushworld_tpu.utils.filesystem import get_puzzle_file_paths

    named = []
    paths_by_name = {}
    for part in spec.split(","):
        level, _, count = part.partition(":")
        paths = get_puzzle_file_paths(
            os.path.join(config.BENCHMARK_PUZZLES_PATH, level.strip())
        )
        names = sorted(paths)
        if count:
            names = names[: int(count)]
        for n in names:
            named.append((f"{level}/{n}", Puzzle.from_file(paths[n])))
            paths_by_name[f"{level}/{n}"] = paths[n]
    return named, paths_by_name


def build_reference_planner() -> bool:
    """Builds the unmodified reference C++ planner with the Boost shims."""
    if os.path.exists(REF_BIN):
        return True
    srcs = [
        "src/pushworld_puzzle.cc",
        "src/run_planner.cc",
        "src/heuristics/domain_transition_graph.cc",
        "src/heuristics/novelty.cc",
        "src/heuristics/recursive_graph_distance.cc",
        "src/heuristics/weighted_sum.cc",
        "src/search/random_action_iterator.cc",
        "src/search/search.cc",
    ]
    if not all(os.path.exists(os.path.join(REF_CPP, s)) for s in srcs):
        return False
    cmd = [
        "g++", "-O3", "-std=c++17", "-march=native",
        "-include", "climits", "-include", "stdexcept",
        "-I", os.path.join(REF_CPP, "include"),
        "-I", os.path.join(HERE, "scripts_dev", "boost_shim"),
        *[os.path.join(REF_CPP, s) for s in srcs],
        "-o", REF_BIN,
    ]
    try:
        return subprocess.run(cmd, capture_output=True).returncode == 0
    except FileNotFoundError:
        return False


def run_reference_baseline(named, paths_by_name, budget: float):
    """Sequential reference-protocol run of the actual reference binary."""

    def set_limits():
        resource.setrlimit(
            resource.RLIMIT_CPU, (int(budget), int(budget) + 5)
        )
        resource.setrlimit(resource.RLIMIT_AS, (30 * 1024**3,) * 2)

    solved = 0
    t0 = time.monotonic()
    for name, puzzle in named:
        try:
            proc = subprocess.run(
                [REF_BIN, "N+RGD", paths_by_name[name]],
                capture_output=True, text=True,
                preexec_fn=set_limits, timeout=budget + 30,
            )
            out = proc.stdout.strip()
        except subprocess.TimeoutExpired:
            out = ""
        if out and all(c in ACTION for c in out):
            if puzzle.is_valid_plan([ACTION[c] for c in out]):
                solved += 1
    return solved, time.monotonic() - t0


def run_native_baseline(named, budget: float):
    from pushworld_tpu.native import is_available, solve_native
    from pushworld_tpu.search.host_planner import solve_host

    use_native = is_available()
    solved = 0
    t0 = time.monotonic()
    for n, p in named:
        try:
            if use_native:
                plan = solve_native(p, mode="N+RGD", time_limit=budget)
            else:
                plan = solve_host(p, mode="N+RGD", time_limit=budget)
            if plan is not None and (plan == [] or p.is_valid_plan(plan)):
                solved += 1
        except (TimeoutError, MemoryError):
            pass
    return solved, time.monotonic() - t0


def main():
    protocol = os.environ.get("PUSHWORLD_BENCH_PROTOCOL")
    if protocol == "full60":
        # The reference-protocol headline (STATUS.md): full benchmark,
        # 60 s/puzzle, raced against the actual reference planner.
        default_set = "level1,level2,level3,level4"
        default_budget = "60"
    else:
        default_set = "level1:12,level2:18,level3:18,level4:6"
        default_budget = "20"
    spec = os.environ.get("PUSHWORLD_BENCH_SET", default_set)
    budget = float(os.environ.get("PUSHWORLD_BENCH_BUDGET", default_budget))
    baseline_kind = os.environ.get("PUSHWORLD_BENCH_BASELINE", "ref")
    profile_dir = os.environ.get("PW_PROFILE_DIR")

    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from pushworld_tpu.search import fleet as fleet_mod
    from pushworld_tpu.search.fleet import plan_puzzles_fleet
    from pushworld_tpu.search.planner import warm_transfers_async

    # The axon platform's one-time D2H setup (tens of seconds) overlaps the
    # load/parse phase below.
    warm_transfers_async()

    named, paths_by_name = load_set(spec)

    # --- fleet executor (the headline).
    import contextlib

    trace_cm = (
        jax.profiler.trace(profile_dir)
        if profile_dir
        else contextlib.nullcontext()
    )
    t0 = time.monotonic()
    with trace_cm:
        results = plan_puzzles_fleet(named, time_limit=budget, group_size=8)
    fleet_wall = time.monotonic() - t0
    fleet_solved = sum(
        1 for r in results.values() if r.failure_reason is None
    )
    by_solver = {}
    for r in results.values():
        if r.failure_reason is None:
            by_solver[r.solver] = by_solver.get(r.solver, 0) + 1
    by_level = {}
    for n, r in results.items():
        lvl = n.split("/")[0]
        s, t = by_level.get(lvl, (0, 0))
        by_level[lvl] = (s + (r.failure_reason is None), t + 1)

    # --- reference-protocol baseline.
    detail = {
        "set": spec,
        "budget_s": budget,
        "fleet_solved": fleet_solved,
        "fleet_by_solver": by_solver,
        "fleet_by_level": {k: f"{s}/{t}" for k, (s, t) in sorted(by_level.items())},
        "count": len(named),
        "fleet_wall_s": round(fleet_wall, 1),
        "device_phases": getattr(fleet_mod, "_device_stats", None),
    }
    if profile_dir:
        detail["profile_dir"] = profile_dir

    # --- vectorized-env throughput (steps/s/chip; SURVEY §2e batched
    # rollouts).  Measured on the largest-grid puzzle of the set so the
    # roofline estimate is meaningful.
    if os.environ.get("PUSHWORLD_BENCH_ENV", "1") != "0":
        try:
            from pushworld_tpu.envs.throughput import measure_env_throughput

            env_puzzle = max(named, key=lambda np_: np_[1].height * np_[1].width)
            detail["env_throughput"] = dict(
                measure_env_throughput(
                    env_puzzle[1], batch_size=4096, horizon=128, reps=3
                ),
                puzzle=env_puzzle[0],
            )
        except Exception as e:  # pragma: no cover - measurement is best-effort
            detail["env_throughput"] = {"error": f"{type(e).__name__}: {e}"}

    if baseline_kind == "ref" and build_reference_planner():
        base_solved, base_wall = run_reference_baseline(
            named, paths_by_name, budget
        )
        detail["baseline"] = "reference C++ run_planner (shim build)"
    elif baseline_kind != "skip":
        base_solved, base_wall = run_native_baseline(named, budget)
        detail["baseline"] = "own native serial planner"
    else:
        base_solved, base_wall = 0, 0.0
        detail["baseline"] = "skipped"
    detail["baseline_solved"] = base_solved
    detail["baseline_wall_s"] = round(base_wall, 1)

    value = fleet_solved / fleet_wall if fleet_wall > 0 else 0.0
    baseline = base_solved / base_wall if base_wall > 0 else 1e-9
    print(
        json.dumps(
            {
                "metric": "benchmark_puzzles_solved_per_s",
                "value": round(value, 4),
                "unit": "puzzles/s",
                "vs_baseline": round(value / baseline, 3),
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    main()
