"""Per-state-safe RGD depth: detection + escalation.

The compiled device depth is sampled at the initial state
(search.batched.required_depth); the fixture ``aw_tool_corridor.pwp`` is
built so that the initial state needs depth 0 while a state ON the solution
path needs depth 1 (the goal object crosses an agent-wall region where only
the tool can realize the push).  Reference semantics: the unbounded
``fewest_tools`` iteration re-derives the depth per state
(reference: cpp/src/heuristics/recursive_graph_distance.cc:101-112).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from pushworld_tpu.core.compiled import compile_puzzle
from pushworld_tpu.core.puzzle import Puzzle
from pushworld_tpu.ops.rgd import (
    FINITE_THRESHOLD,
    build_rgd_tables,
    rgd_heuristic,
    rgd_heuristic_with_flags,
)
from pushworld_tpu.search.batched import BatchedPlanner, required_depth
from pushworld_tpu.search.heuristics_host import RecursiveGraphDistance


@pytest.fixture(scope="module")
def fixture_puzzle(puzzles_dir):
    return Puzzle.from_file(
        os.path.join(puzzles_dir, "heur", "aw_tool_corridor.pwp")
    )


def _deep_state(puzzle):
    """The state after L,R? No: after two RIGHT pushes — the goal object is
    inside the agent-wall corridor, where only the tool can push it."""
    s = puzzle.initial_state
    s = puzzle.get_next_state(s, 1)  # RIGHT
    s = puzzle.get_next_state(s, 1)  # RIGHT: goal object enters aw region
    return s


def test_initial_depth_is_zero_but_search_needs_one(fixture_puzzle):
    p = fixture_puzzle
    assert required_depth(p) == 0
    rgd = RecursiveGraphDistance(p, fewest_tools=True)
    deep = _deep_state(p)
    assert rgd._goal_cost(deep, 1, p.goal_state[0], 0) == float("inf")
    assert rgd._goal_cost(deep, 1, p.goal_state[0], 1) < float("inf")


def test_flags_mark_depth_limited_states(fixture_puzzle):
    p = fixture_puzzle
    cp = compile_puzzle(p)
    deep = _deep_state(p)
    states = jnp.asarray(
        np.stack([np.array(p.initial_state), np.array(deep)]).astype(np.int32)
    )

    # Depth-0 tables (all rows so the same tables serve both depths).
    tables = build_rgd_tables(p, cp, max_depth=1)
    h0, flag0 = rgd_heuristic_with_flags(tables, states, max_depth=0)
    assert float(h0[0]) < FINITE_THRESHOLD  # initial state scores
    assert float(h0[1]) >= FINITE_THRESHOLD  # deep state INF at depth 0
    assert not bool(flag0[0])
    assert bool(flag0[1])  # flagged: deeper pushing could fix it

    # At depth 1 both score finite, matching the host oracle, and no flags.
    rgd_host = RecursiveGraphDistance(p, fewest_tools=True)
    h1, flag1 = rgd_heuristic_with_flags(tables, states, max_depth=1)
    assert not bool(flag1[0]) and not bool(flag1[1])
    for i, st in enumerate([p.initial_state, deep]):
        assert float(h1[i]) == pytest.approx(rgd_host.estimate(st))


def test_dead_end_state_not_flagged(puzzles_dir):
    # A state whose goal is graph-unreachable must NOT request escalation.
    p = Puzzle.from_file(os.path.join(puzzles_dir, "no_solution.pwp"))
    cp = compile_puzzle(p)
    tables = build_rgd_tables(p, cp, max_depth=1)
    states = jnp.asarray(np.array(p.initial_state, np.int32))[None]
    h, flag = rgd_heuristic_with_flags(tables, states, max_depth=0)
    assert float(h[0]) >= FINITE_THRESHOLD
    assert not bool(flag[0])


def test_solve_escalates_and_finds_plan(fixture_puzzle):
    p = fixture_puzzle
    # Tiny expand + chunk so the escalation trigger (best frontier entry
    # INF-scored) is observable before brute expansion reaches the goal.
    planner = BatchedPlanner(
        p, expand=1, frontier_capacity=64, visited_bits=10,
        history_capacity=1 << 12, max_depth=0, use_novelty=False,
    )
    plan = planner.solve(time_limit=120, chunk=1)
    assert plan is not None and p.is_valid_plan(plan)
    assert planner.max_depth >= 1  # escalation actually happened


def test_solve_without_escalation_still_solves(fixture_puzzle):
    # INF states are ordered last but never pruned: the search stays
    # complete at the compiled depth.
    p = fixture_puzzle
    planner = BatchedPlanner(
        p, expand=16, frontier_capacity=256, visited_bits=12,
        history_capacity=1 << 12, max_depth=0, use_novelty=True,
    )
    plan = planner.solve(time_limit=120, escalate_depth=False)
    assert plan is not None and p.is_valid_plan(plan)
