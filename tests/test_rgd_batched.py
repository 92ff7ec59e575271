"""Differential tests: batched device RGD vs the exact host oracle."""

import math
import os

import numpy as np
import pytest

from pushworld_tpu.core.compiled import compile_puzzle
from pushworld_tpu.core.puzzle import Puzzle
from pushworld_tpu.search.heuristics_host import RecursiveGraphDistance

FIXTURES = [
    "trivial",
    "multiple_goals",
    "transitive_pushing",
    "necessary_transitive_pushing1",
    "necessary_transitive_pushing2",
    "necessary_transitive_pushing3",
    "blocked_transitive_pushing1",
    "blocked_transitive_pushing2",
    "trivial_tool",
    "trivial_tool2",
    "shortest_path_tool",
    "two_tools",
]


def load(puzzles_dir, name):
    return Puzzle.from_file(os.path.join(puzzles_dir, "heur", name + ".pwp"))


def reachable_states(puzzle, count=48, seed=0):
    """Random-walk sample of reachable states (including the initial)."""
    rng = np.random.RandomState(seed)
    states = [puzzle.initial_state]
    s = puzzle.initial_state
    for _ in range(count - 1):
        for a in rng.randint(0, 4, size=rng.randint(1, 6)):
            s = puzzle.get_next_state(s, int(a))
        states.append(s)
    return states


@pytest.mark.parametrize("name", FIXTURES)
def test_rgd_batched_matches_host(puzzles_dir, name):
    import jax.numpy as jnp

    from pushworld_tpu.ops.rgd import build_rgd_tables, rgd_heuristic

    puzzle = load(puzzles_dir, name)
    cp = compile_puzzle(puzzle)
    tables = build_rgd_tables(puzzle, cp)
    host = RecursiveGraphDistance(puzzle, cp, fewest_tools=True)

    states = reachable_states(puzzle)
    batch = np.zeros((len(states), cp.n, 2), np.int32)
    for i, s in enumerate(states):
        batch[i, : puzzle.num_movables] = s

    out = np.asarray(rgd_heuristic(tables, jnp.asarray(batch), max_depth=2))
    for i, s in enumerate(states):
        expected = host.estimate(s)
        got = float(out[i])
        if math.isinf(expected):
            assert got >= 1e8, (name, i, s, got)
        else:
            assert got == pytest.approx(expected), (name, i, s, expected, got)


def test_rgd_batched_depth3_matches_host(puzzles_dir):
    """three_tools needs pushing depth exactly 3 at the initial state
    (host oracle: INF at depths 0-2, finite at 3) — the generalized
    memoized recursion must match the unbounded oracle, and the depth-2
    evaluation must INF-out (reference analog: fewest_tools iterates
    depth upward, recursive_graph_distance.cc:101-112)."""
    import jax.numpy as jnp

    from pushworld_tpu.ops.rgd import build_rgd_tables, rgd_heuristic

    puzzle = load(puzzles_dir, "three_tools")
    cp = compile_puzzle(puzzle)
    tables = build_rgd_tables(puzzle, cp)
    host = RecursiveGraphDistance(puzzle, cp, fewest_tools=True)

    states = reachable_states(puzzle)
    batch = np.zeros((len(states), cp.n, 2), np.int32)
    for i, s in enumerate(states):
        batch[i, : puzzle.num_movables] = s

    out3 = np.asarray(rgd_heuristic(tables, jnp.asarray(batch), max_depth=3))
    out2 = np.asarray(rgd_heuristic(tables, jnp.asarray(batch), max_depth=2))
    assert out2[0] >= 1e8  # depth <= 2 cannot see the three-tool chain
    for i, s in enumerate(states):
        expected = host.estimate(s)
        got = float(out3[i])
        if math.isinf(expected):
            assert got >= 1e8, (i, s, got)
        else:
            assert got == pytest.approx(expected), (i, s, expected, got)
