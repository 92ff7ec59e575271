"""Native C++ planner tests: solves fixtures with validated plans, agrees
with the host oracle on no-solution, and respects budgets."""

import os

import pytest

from pushworld_tpu.core.puzzle import Puzzle

native = pytest.importorskip("pushworld_tpu.native")

pytestmark = pytest.mark.skipif(
    not native.is_available(), reason="native planner not buildable"
)


@pytest.mark.parametrize(
    "name",
    [
        "simple",
        "chain",
        "push_left",
        "multi_goal",
        "lshape",
        "heur/trivial",
        "heur/trivial_tool",
        "heur/trivial_tool2",
        "heur/transitive_pushing",
        "heur/necessary_transitive_pushing1",
        "heur/shortest_path_tool",
        "heur/two_tools",
    ],
)
@pytest.mark.parametrize("mode", ["RGD", "N+RGD"])
def test_native_solves_fixtures(puzzles_dir, name, mode):
    p = Puzzle.from_file(os.path.join(puzzles_dir, name + ".pwp"))
    plan = native.solve_native(p, mode=mode, max_expansions=500000)
    assert plan is not None
    assert p.is_valid_plan(plan) or (p.is_goal_state(p.initial_state) and plan == [])


def test_native_no_solution(puzzles_dir):
    p = Puzzle.from_file(os.path.join(puzzles_dir, "no_solution.pwp"))
    assert native.solve_native(p, max_expansions=500000) is None


def test_native_budget(puzzles_dir):
    p = Puzzle.from_file(os.path.join(puzzles_dir, "heur", "shortest_path_tool.pwp"))
    with pytest.raises(TimeoutError):
        native.solve_native(p, max_expansions=1)


def test_native_agrees_with_host_on_benchmark_sample():
    from pushworld_tpu import config
    from pushworld_tpu.utils.filesystem import get_puzzle_file_paths

    if not os.path.isdir(config.BENCHMARK_PUZZLES_PATH):
        pytest.skip("benchmark dataset not available")
    paths = get_puzzle_file_paths(os.path.join(config.BENCHMARK_PUZZLES_PATH, "level1"))
    for name in sorted(paths)[:8]:
        p = Puzzle.from_file(paths[name])
        plan = native.solve_native(p, time_limit=30)
        assert plan is not None and p.is_valid_plan(plan), name


def test_native_visited_growth_honors_budget():
    """Regression: a fixed-capacity visited table probed forever once full
    (the deadline check lives in the expansion loop, not inside insert).
    A hard instance driven past the initial table capacity must still
    return cleanly on its expansion budget."""
    from pushworld_tpu import config

    path = os.path.join(config.BENCHMARK_PUZZLES_PATH, "level2", "Boulders.pwp")
    if not os.path.isfile(path):
        pytest.skip("benchmark dataset not available")
    p = Puzzle.from_file(path)
    # 300k expansions insert far more than the 2^16 initial slots.
    with pytest.raises(TimeoutError):
        native.solve_native(p, mode="N+RGD", max_expansions=300_000)


def test_native_memory_limit():
    """An absurdly small memory cap classifies as a memory error, the
    in-process analog of the reference's RLIMIT_AS (utils/process.py:61-71)."""
    from pushworld_tpu import config

    path = os.path.join(config.BENCHMARK_PUZZLES_PATH, "level2", "Boulders.pwp")
    if not os.path.isfile(path):
        pytest.skip("benchmark dataset not available")
    p = Puzzle.from_file(path)
    with pytest.raises(MemoryError):
        native.solve_native(p, mode="N+RGD", time_limit=30, mem_limit_gb=0.001)


@pytest.mark.parametrize("seed", [0, 1, 2, 17])
def test_native_seed_streams_all_valid(puzzles_dir, seed):
    # Every action-order stream must yield a valid plan (restart diversity
    # changes the search order, never the semantics).
    p = Puzzle.from_file(os.path.join(puzzles_dir, "chain.pwp"))
    plan = native.solve_native(p, seed=seed, max_expansions=500000)
    assert plan is not None and p.is_valid_plan(plan)


def test_staged_solves_fixture(puzzles_dir):
    from pushworld_tpu.native.bridge import solve_native_staged

    p = Puzzle.from_file(os.path.join(puzzles_dir, "heur/two_tools.pwp"))
    plan = solve_native_staged(p, time_limit=30)
    assert plan is not None and p.is_valid_plan(plan)


def test_staged_no_solution_short_circuits(puzzles_dir):
    # Any stage proving exhaustively "no solution" ends the portfolio
    # immediately (the search is complete), well inside the total budget.
    import time

    from pushworld_tpu.native.bridge import solve_native_staged

    p = Puzzle.from_file(os.path.join(puzzles_dir, "no_solution.pwp"))
    t0 = time.monotonic()
    assert solve_native_staged(p, time_limit=60) is None
    assert time.monotonic() - t0 < 30


def test_staged_budget_exhaustion_raises(puzzles_dir):
    from pushworld_tpu.native.bridge import solve_native_staged

    p = Puzzle.from_file(os.path.join(puzzles_dir, "heur/two_tools.pwp"))
    with pytest.raises(TimeoutError):
        solve_native_staged(p, time_limit=1e-4)


@pytest.mark.parametrize(
    "queue",
    ["lifo", "fifo", "lifo+lazy", "lifo+pref", "lifo+eps", "lifo+pref+eps",
     "fifo+pref", "lifo+la", "lifo+gnov", "lifo+pref+la+eps", "fifo+la",
     "lifo+la+gnov", "lifo+eps+gnov"],
)
def test_native_queue_disciplines_valid_and_complete(puzzles_dir, queue):
    # Every (non-prune) discipline must emit VALID plans on solvable
    # fixtures and remain COMPLETE (an exhausted frontier proves no
    # solution) — pref only reorders via a dual queue, eps only perturbs
    # pop order, gnov only partitions the novelty tables, and la only
    # front-loads h-descents (every rollout node is queued for later
    # expansion); none of them prunes.
    for name in ["chain", "multi_goal", "heur/two_tools"]:
        p = Puzzle.from_file(os.path.join(puzzles_dir, name + ".pwp"))
        plan = native.solve_native(
            p, mode="N+RGD", max_expansions=500000, queue=queue
        )
        assert plan is not None, (name, queue)
        assert p.is_valid_plan(plan) or (
            p.is_goal_state(p.initial_state) and plan == []
        ), (name, queue)
    ns = Puzzle.from_file(os.path.join(puzzles_dir, "no_solution.pwp"))
    assert native.solve_native(ns, max_expansions=500000, queue=queue) is None


def test_native_dead_pruning_inconclusive_on_exhaustion(puzzles_dir):
    # "dead" hard-prunes INF-RGD states, so draining the frontier proves
    # nothing: exhaustion must classify as budget (TimeoutError), never as
    # "no solution" (None) — and solvable fixtures must still solve.
    for name in ["chain", "heur/two_tools"]:
        p = Puzzle.from_file(os.path.join(puzzles_dir, name + ".pwp"))
        plan = native.solve_native(
            p, mode="N+RGD", max_expansions=500000, queue="lifo+dead"
        )
        assert plan is not None and p.is_valid_plan(plan), name
    ns = Puzzle.from_file(os.path.join(puzzles_dir, "no_solution.pwp"))
    with pytest.raises(TimeoutError):
        native.solve_native(ns, max_expansions=500000, queue="lifo+dead")


def test_native_deadline_honored_during_rgd_explosion():
    # level2/Pinata reaches states whose fewest-tools estimate explodes
    # combinatorially (10 movables, unreachable-goal depth ladder); the
    # in-recursion budget guard must end the attempt near the deadline
    # (round-3 data shows 507 s spent against a 60 s budget before the
    # guard existed).
    import time as _time

    from pushworld_tpu import config
    from pushworld_tpu.utils.filesystem import get_puzzle_file_paths

    root = os.path.join(config.BENCHMARK_PUZZLES_PATH, "level2")
    if not os.path.isdir(root):
        pytest.skip("benchmark dataset unavailable")
    paths = get_puzzle_file_paths(root)
    if "Pinata" not in paths:
        pytest.skip("instance unavailable")
    p = Puzzle.from_file(paths["Pinata"])
    t0 = _time.monotonic()
    with pytest.raises(TimeoutError):
        native.solve_native(p, mode="N+RGD", time_limit=3.0)
    assert _time.monotonic() - t0 < 10.0
