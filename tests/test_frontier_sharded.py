"""Cross-chip frontier sharding tests on the virtual 8-device CPU mesh.

Acceptance = valid plans (reference validates but never compares plans,
benchmark_rgd.py:107-113) + exact completeness semantics (an eviction-free
exhaustion is a no-solution proof; routing is drop-free by construction).
"""

import os

import numpy as np
import pytest

from pushworld_tpu.core.puzzle import Puzzle


def _mesh(n=8):
    import jax
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:n])
    return Mesh(devs, ("shard",))


FIXTURES = [
    "simple",
    "chain",
    "push_left",
    "multi_goal",
    "lshape",
    "heur/easy_search",
    "heur/transitive_pushing",
    "heur/trivial_tool",
]


@pytest.mark.parametrize("name", FIXTURES)
def test_frontier_sharded_solves_fixtures(puzzles_dir, name):
    from pushworld_tpu.parallel.frontier_sharded import solve_frontier_sharded

    puzzle = Puzzle.from_file(os.path.join(puzzles_dir, name + ".pwp"))
    plan = solve_frontier_sharded(
        puzzle,
        mesh=_mesh(),
        time_limit=120.0,
        expand=16,
        frontier_capacity=1 << 10,
        visited_bits=14,
        history_capacity=1 << 14,
        chunk=8,
    )
    assert plan is not None, name
    assert plan == [] or puzzle.is_valid_plan(plan), name


def test_frontier_sharded_no_solution_is_complete(puzzles_dir):
    """Exhaustion without evictions across ALL shards proves no solution."""
    from pushworld_tpu.parallel.frontier_sharded import solve_frontier_sharded

    puzzle = Puzzle.from_file(os.path.join(puzzles_dir, "no_solution.pwp"))
    plan = solve_frontier_sharded(
        puzzle,
        mesh=_mesh(),
        time_limit=120.0,
        expand=16,
        frontier_capacity=1 << 10,
        visited_bits=14,
        history_capacity=1 << 14,
        chunk=8,
    )
    assert plan is None


def test_frontier_sharded_history_spill_reconstructs_across_epochs(puzzles_dir):
    """A history capacity barely above the spill margin forces spill
    epochs; the plan must still reconstruct correctly across the host-side
    snapshot chain (round-5: capacity exhaustion no longer ends the
    attempt)."""
    from pushworld_tpu.parallel.frontier_sharded import solve_frontier_sharded

    puzzle = Puzzle.from_file(os.path.join(puzzles_dir, "spill_grid.pwp"))
    stats: dict = {}
    # margin = 8 * expand * D = 128; capacity 160 leaves only 32 usable
    # entries per shard per epoch, so the search spills repeatedly.
    plan = solve_frontier_sharded(
        puzzle,
        mesh=_mesh(4),
        time_limit=240.0,
        expand=4,
        frontier_capacity=1 << 13,
        visited_bits=14,
        history_capacity=160,
        chunk=4,
        stats_out=stats,
    )
    assert plan is not None
    assert puzzle.is_valid_plan(plan)
    assert stats["spill_epochs"] >= 1, stats


def test_frontier_sharded_spill_keeps_exhaustion_complete(puzzles_dir):
    """With an unreachable goal and a big reachable space, the search must
    spill repeatedly and STILL prove no-solution by eviction-free
    exhaustion (spilling never drops states; the frontier is sized to
    avoid evictions)."""
    from pushworld_tpu.parallel.frontier_sharded import solve_frontier_sharded

    puzzle = Puzzle.from_file(
        os.path.join(puzzles_dir, "spill_grid_unreachable.pwp")
    )
    stats: dict = {}
    plan = solve_frontier_sharded(
        puzzle,
        mesh=_mesh(4),
        time_limit=240.0,
        expand=8,
        frontier_capacity=1 << 13,
        visited_bits=14,
        history_capacity=1 << 9,
        chunk=8,
        stats_out=stats,
    )
    assert plan is None
    assert stats["spill_epochs"] >= 2, stats


def test_frontier_sharded_matches_host_plan_length_class(puzzles_dir):
    """The distributed search's plan must drive the puzzle to its goal
    through the host oracle's dynamics step by step (not only is_valid_plan:
    walk the whole trajectory)."""
    from pushworld_tpu.parallel.frontier_sharded import solve_frontier_sharded

    puzzle = Puzzle.from_file(os.path.join(puzzles_dir, "chain.pwp"))
    plan = solve_frontier_sharded(
        puzzle, mesh=_mesh(4), time_limit=120.0, expand=16,
        frontier_capacity=1 << 10, visited_bits=14, history_capacity=1 << 14,
        chunk=8,
    )
    assert plan
    s = puzzle.initial_state
    for a in plan:
        s = puzzle.get_next_state(s, a)
    assert puzzle.is_goal_state(s)
