"""Host best-first planner tests: fixtures + a sample of real benchmark
puzzles (plan validity, no-solution detection, budget enforcement)."""

import os

import pytest

from pushworld_tpu import config
from pushworld_tpu.core.puzzle import Puzzle
from pushworld_tpu.search.host_planner import solve_host
from pushworld_tpu.utils.filesystem import get_puzzle_file_paths


@pytest.mark.parametrize(
    "name",
    ["simple", "chain", "push_left", "multi_goal", "lshape", "agent_only"],
)
@pytest.mark.parametrize("mode", ["RGD", "N+RGD"])
def test_solves_fixtures(puzzles_dir, name, mode):
    p = Puzzle.from_file(os.path.join(puzzles_dir, name + ".pwp"))
    plan = solve_host(p, mode=mode, max_expansions=20000)
    assert plan is not None
    assert p.is_valid_plan(plan) or (p.is_goal_state(p.initial_state) and plan == [])


@pytest.mark.parametrize(
    "name", ["trivial", "trivial_tool", "trivial_tool2", "transitive_pushing",
             "necessary_transitive_pushing1", "blocked_transitive_pushing2",
             "shortest_path_tool", "multiple_goals", "easy_search"]
)
def test_solves_heuristic_fixtures(puzzles_dir, name):
    p = Puzzle.from_file(os.path.join(puzzles_dir, "heur", name + ".pwp"))
    plan = solve_host(p, mode="N+RGD", max_expansions=50000)
    assert plan is not None and p.is_valid_plan(plan)


def test_no_solution(puzzles_dir):
    p = Puzzle.from_file(os.path.join(puzzles_dir, "no_solution.pwp"))
    assert solve_host(p, mode="N+RGD") is None


def test_budget_enforcement(puzzles_dir):
    p = Puzzle.from_file(os.path.join(puzzles_dir, "heur", "shortest_path_tool.pwp"))
    with pytest.raises(TimeoutError):
        solve_host(p, mode="N+RGD", max_expansions=1)


@pytest.mark.skipif(
    not os.path.isdir(config.BENCHMARK_PUZZLES_PATH),
    reason="benchmark dataset not available",
)
def test_solves_benchmark_level1_sample():
    paths = get_puzzle_file_paths(
        os.path.join(config.BENCHMARK_PUZZLES_PATH, "level1")
    )
    for name in sorted(paths)[:5]:
        p = Puzzle.from_file(paths[name])
        plan = solve_host(p, mode="N+RGD", time_limit=60)
        assert plan is not None and p.is_valid_plan(plan), name
