#!/usr/bin/env python
"""Headline benchmark for pushworld-tpu.

Prints ONE JSON line on stdout: {"metric", "value", "unit", "vs_baseline"}.
All progress/diagnostics go to stderr.

Headline: benchmark puzzles solved per second by the heterogeneous fleet
executor (host native workers + TPU batched search,
pushworld_tpu.search.fleet) under the reference benchmark protocol's
per-puzzle budget.

``vs_baseline`` races the ACTUAL reference C++ planner (DeepMind's
run_planner, built unmodified from /root/reference/cpp with the std-based
Boost shims in scripts_dev/boost_shim) sequentially on the same puzzles
with the same per-puzzle CPU budget, rlimit-enforced exactly like the
reference harness (reference: python3/src/pushworld/benchmark_rgd.py:31-33,
utils/process.py:61-84).  The baseline is deterministic (fixed binary,
fixed rlimits, fixed set), so its result is CACHED in
scripts_dev/baseline_cache.json keyed by (set spec, budget, binary hash)
and only re-raced on a cache miss — re-measuring it inside every capture
is what blew the round-3 driver budget (BENCH_r03: rc=124).  On a miss
the baseline runs BEFORE JAX is imported (no fork-after-threads hazard).
When the reference binary cannot be built, the baseline falls back to
this framework's own serial native planner (a strictly stronger baseline
than the reference on the published benchmark: at 60 s it solves 175/223
vs the reference's 150/223).

The default set is STRATIFIED across difficulty levels — it includes
level3/level4 instances the serial planners time out on, which is where
the TPU batched search earns solves.

Reliability: a watchdog thread force-prints the best partial result and
exits 0 if the run exceeds PW_BENCH_WATCHDOG_S (default 780) so a driver
timeout can never erase the capture; faulthandler dumps all stacks to
stderr at the same deadline for diagnosis.

Environment overrides:
  PUSHWORLD_BENCH_SET     comma-separated level:count specs
                          (default "level1:12,level2:18,level3:18,level4:6")
  PUSHWORLD_BENCH_BUDGET  per-puzzle seconds (default 20)
  PUSHWORLD_BENCH_BASELINE  "ref" | "native" | "skip" (default ref)
  PUSHWORLD_BENCH_REFRESH_BASELINE  "1" ignores the baseline cache
  PUSHWORLD_BENCH_PROTOCOL  "full60" = the protocol-grade run in one line:
                          all 223 benchmark puzzles, 60 s per-puzzle budget,
                          raced against the reference planner (expect ~1.5 h
                          wall with a cached baseline)
  PUSHWORLD_BENCH_ENV     "0" disables the vectorized-env throughput
                          measurement (steps/s/chip, reported in detail)
  PW_BENCH_WATCHDOG_S     watchdog deadline seconds (default 780; <= 0
                          disables)
  PW_PROFILE_DIR          when set, capture a jax.profiler trace of the
                          fleet run into this directory
"""

import hashlib
import json
import os
import resource
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REF_CPP = "/root/reference/cpp"
REF_BIN = os.path.join(HERE, "scripts_dev", "ref_planner")
BASELINE_CACHE = os.path.join(HERE, "scripts_dev", "baseline_cache.json")
ACTION = {"L": 0, "R": 1, "U": 2, "D": 3}


def log(msg: str) -> None:
    print(f"[bench +{time.monotonic() - _T0:.0f}s] {msg}", file=sys.stderr, flush=True)


_T0 = time.monotonic()


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


def _baseline_key(spec: str, budget: float) -> str:
    with open(REF_BIN, "rb") as f:
        h = hashlib.sha256(f.read()).hexdigest()[:16]
    return f"{spec}|{budget:g}|{h}"


def baseline_cache_lookup(spec: str, budget: float):
    try:
        with open(BASELINE_CACHE) as f:
            cache = json.load(f)
        return cache.get(_baseline_key(spec, budget))
    except (OSError, ValueError):
        return None


def baseline_cache_store(spec: str, budget: float, solved: int, wall: float):
    try:
        with open(BASELINE_CACHE) as f:
            cache = json.load(f)
    except (OSError, ValueError):
        cache = {}
    entry = {
        "solved": solved,
        "wall_s": round(wall, 1),
        "spec": spec,
        "budget_s": budget,
        "recorded": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    cache[_baseline_key(spec, budget)] = entry
    with open(BASELINE_CACHE, "w") as f:
        json.dump(cache, f, indent=1, sort_keys=True)
    return entry


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
    watchdog_s = float(os.environ.get("PW_BENCH_WATCHDOG_S", "780"))

    # Stack dumps to stderr if anything wedges near the watchdog deadline.
    import faulthandler

    if watchdog_s > 0:
        faulthandler.dump_traceback_later(
            max(60.0, watchdog_s - 10.0), file=sys.stderr
        )

    detail = {"set": spec, "budget_s": budget}
    emitted = {"done": False}

    def emit(value: float, vs_baseline: float) -> None:
        if emitted["done"]:
            return
        emitted["done"] = True
        print(
            json.dumps(
                {
                    "metric": "benchmark_puzzles_solved_per_s",
                    "value": round(value, 4),
                    "unit": "puzzles/s",
                    "vs_baseline": round(vs_baseline, 3),
                    "detail": detail,
                }
            ),
            flush=True,
        )

    # --- reference-protocol baseline FIRST, before JAX exists in the
    # process: a cache miss fork/execs the reference binary dozens of
    # times, which must not happen after JAX spins up its thread pool.
    base_solved, base_wall = 0, 0.0
    if baseline_kind == "ref" and build_reference_planner():
        refresh = os.environ.get("PUSHWORLD_BENCH_REFRESH_BASELINE") == "1"
        cached = None if refresh else baseline_cache_lookup(spec, budget)
        if cached is not None:
            base_solved, base_wall = cached["solved"], cached["wall_s"]
            detail["baseline"] = "reference C++ run_planner (shim build, cached)"
            detail["baseline_recorded"] = cached.get("recorded")
            log(f"baseline cache hit: {base_solved} solved in {base_wall}s")
        else:
            log("baseline cache miss: racing reference planner (pre-JAX)")
            named0, paths0 = load_set(spec)
            base_solved, base_wall = run_reference_baseline(
                named0, paths0, budget
            )
            baseline_cache_store(spec, budget, base_solved, base_wall)
            detail["baseline"] = "reference C++ run_planner (shim build)"
            log(f"baseline raced: {base_solved} solved in {base_wall:.0f}s")
    elif baseline_kind != "skip":
        named0, _ = load_set(spec)
        base_solved, base_wall = run_native_baseline(named0, budget)
        detail["baseline"] = "own native serial planner"
    else:
        detail["baseline"] = "skipped"
    detail["baseline_solved"] = base_solved
    detail["baseline_wall_s"] = round(base_wall, 1)
    baseline_rate = base_solved / base_wall if base_wall > 0 else 1e-9

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
    detail["count"] = len(named)
    log(f"set loaded: {len(named)} puzzles")

    # Partial results shared with the watchdog: if the driver's budget is
    # about to end the process, print what the fleet has so far and exit 0
    # (a timeout must never erase the capture — round-3 lesson).
    partial_results = {}
    fleet_t0 = [None]

    def watchdog():
        time.sleep(watchdog_s)
        if emitted["done"]:
            return
        # Snapshot first: fleet worker threads insert into this dict
        # concurrently, and iterating a live dict can raise "dictionary
        # changed size during iteration" — killing the watchdog exactly in
        # the busy case it exists for.  list() is one atomic C call under
        # the GIL.
        solved = sum(
            1 for r in list(partial_results.values()) if r.failure_reason is None
        )
        wall = (
            time.monotonic() - fleet_t0[0]
            if fleet_t0[0] is not None
            else time.monotonic() - _T0
        )
        detail["partial"] = True
        detail["fleet_solved"] = solved
        detail["fleet_wall_s"] = round(wall, 1)
        value = solved / wall if wall > 0 else 0.0
        log(f"WATCHDOG fired at +{watchdog_s:.0f}s: emitting partial result")
        faulthandler.dump_traceback(file=sys.stderr)
        emit(value, value / baseline_rate)
        os._exit(0)

    if watchdog_s > 0:
        import threading

        threading.Thread(target=watchdog, daemon=True).start()

    # --- vectorized-env throughput (steps/s/chip; SURVEY §2e batched
    # rollouts) BEFORE the fleet phase so the headline JSON can be emitted
    # the moment the fleet finishes.  Measured on the largest-grid puzzle
    # of the set so the roofline estimate is meaningful.
    if os.environ.get("PUSHWORLD_BENCH_ENV", "1") != "0":
        try:
            from pushworld_tpu.envs.throughput import measure_env_throughput

            env_puzzle = max(named, key=lambda np_: np_[1].height * np_[1].width)
            log(f"env throughput on {env_puzzle[0]}")
            detail["env_throughput"] = dict(
                measure_env_throughput(
                    env_puzzle[1], batch_size=4096, horizon=128, reps=3
                ),
                puzzle=env_puzzle[0],
            )
            log(f"env throughput done: {detail['env_throughput'].get('steps_per_s')}")
        except Exception as e:  # pragma: no cover - measurement is best-effort
            detail["env_throughput"] = {"error": f"{type(e).__name__}: {e}"}

    # --- fleet executor (the headline).
    import contextlib

    trace_cm = (
        jax.profiler.trace(profile_dir)
        if profile_dir
        else contextlib.nullcontext()
    )
    log("fleet phase starting")
    fleet_t0[0] = time.monotonic()
    with trace_cm:
        results = plan_puzzles_fleet(
            named, time_limit=budget, group_size=8, results_out=partial_results
        )
    fleet_wall = time.monotonic() - fleet_t0[0]
    fleet_solved = sum(
        1 for r in results.values() if r.failure_reason is None
    )
    log(f"fleet done: {fleet_solved}/{len(named)} in {fleet_wall:.0f}s")
    by_solver = {}
    for r in results.values():
        if r.failure_reason is None:
            by_solver[r.solver] = by_solver.get(r.solver, 0) + 1
    by_level = {}
    for n, r in results.items():
        lvl = n.split("/")[0]
        s, t = by_level.get(lvl, (0, 0))
        by_level[lvl] = (s + (r.failure_reason is None), t + 1)

    detail.update(
        fleet_solved=fleet_solved,
        fleet_by_solver=by_solver,
        fleet_by_level={k: f"{s}/{t}" for k, (s, t) in sorted(by_level.items())},
        fleet_wall_s=round(fleet_wall, 1),
        device_phases=getattr(fleet_mod, "_device_stats", None),
    )
    if profile_dir:
        detail["profile_dir"] = profile_dir

    value = fleet_solved / fleet_wall if fleet_wall > 0 else 0.0
    emit(value, value / baseline_rate)


if __name__ == "__main__":
    main()
