"""Differential tests: device reachability/distance fixpoints vs host oracle."""

import math
import os

import numpy as np
import pytest

from pushworld_tpu.core.compiled import compile_puzzle
from pushworld_tpu.core.puzzle import Puzzle
from pushworld_tpu.search.heuristics_host import MovementGraphs, PathDistances

HEUR_FIXTURES = [
    "trivial",
    "trivial_tool",
    "trivial_tool2",
    "multiple_goals",
    "transitive_pushing",
    "necessary_transitive_pushing1",
    "necessary_transitive_pushing2",
    "blocked_transitive_pushing1",
    "blocked_transitive_pushing2",
    "shortest_path_tool",
]


def load(puzzles_dir, name):
    return Puzzle.from_file(os.path.join(puzzles_dir, "heur", name + ".pwp"))


def edges_to_tensors(puzzle, graphs, cp):
    """Host movement graphs -> (E, reached) dense tensors for comparison."""
    N, H, W = cp.n, cp.height, cp.width
    E = np.zeros((4, N, H, W), bool)
    reached = np.zeros((N, H, W), bool)
    disp = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    for o, edges in enumerate(graphs.edges):
        for p, succs in edges.items():
            reached[o, p[1], p[0]] = True
            for q in succs:
                d = (q[0] - p[0], q[1] - p[1])
                a = disp.index(d)
                E[a, o, p[1], p[0]] = True
    return E, reached


@pytest.mark.parametrize("name", HEUR_FIXTURES)
def test_reachability_matches_host(puzzles_dir, name):
    from pushworld_tpu.ops.graphs import build_reachability

    puzzle = load(puzzles_dir, name)
    cp = compile_puzzle(puzzle)
    E_dev, reached_dev = build_reachability(cp)
    E_host, reached_host = edges_to_tensors(puzzle, MovementGraphs(puzzle, cp), cp)
    np.testing.assert_array_equal(np.asarray(reached_dev), reached_host, err_msg=name)
    np.testing.assert_array_equal(np.asarray(E_dev), E_host, err_msg=name)


@pytest.mark.parametrize("name", ["trivial", "trivial_tool", "shortest_path_tool"])
def test_distance_fields_match_host(puzzles_dir, name):
    import jax.numpy as jnp

    from pushworld_tpu.ops.graphs import INF, all_pairs_distances, build_reachability, distance_to_targets

    puzzle = load(puzzles_dir, name)
    cp = compile_puzzle(puzzle)
    E_dev, reached_dev = build_reachability(cp)
    graphs = MovementGraphs(puzzle, cp)
    H, W = cp.height, cp.width

    for o in range(puzzle.num_movables):
        host_dist = PathDistances(graphs.edges[o])
        # Goal-style single-target field.
        if o - 1 < puzzle.num_goals and o >= 1:
            g = puzzle.goal_state[o - 1]
            targets = jnp.zeros((H, W), bool).at[g[1], g[0]].set(True)
            field = np.asarray(distance_to_targets(E_dev[:, o], targets))
            for p in graphs.edges[o]:
                expected = host_dist.get(p, g)
                got = field[p[1], p[0]]
                if math.isinf(expected):
                    assert got >= float(INF), (name, o, p)
                else:
                    assert got == expected, (name, o, p)

        # All-pairs distances on a sample of position pairs.
        D = np.asarray(all_pairs_distances(E_dev[:, o]))
        positions = sorted(graphs.edges[o])[:12]
        for s in positions:
            for t in positions:
                expected = host_dist.get(s, t)
                got = D[s[1] * W + s[0], t[1] * W + t[0]]
                if math.isinf(expected):
                    assert got >= float(INF), (name, o, s, t)
                else:
                    assert got == expected, (name, o, s, t)


@pytest.mark.parametrize("name", ["trivial", "trivial_tool", "shortest_path_tool"])
def test_host_distances_match_device(puzzles_dir, name):
    """The host scipy-BFS tables equal the device wavefront kernels."""
    import numpy as np

    from pushworld_tpu.ops.graphs import (
        build_reachability,
        all_pairs_distances,
        host_graph_distances,
        host_distance_to_targets,
        distance_to_targets,
    )
    import jax.numpy as jnp

    puzzle = load(puzzles_dir, name)
    cp = compile_puzzle(puzzle)
    E, _ = build_reachability(cp)
    E_np = np.asarray(E)
    W = cp.width
    for o in range(puzzle.num_movables):
        D_dev = np.asarray(all_pairs_distances(E[:, o]))
        D_host = host_graph_distances(E_np[:, o])
        np.testing.assert_array_equal(D_host, D_dev, err_msg=f"{name} obj {o}")
    for k in range(puzzle.num_goals):
        g = puzzle.goal_state[k]
        targets = jnp.zeros((cp.height, cp.width), bool).at[g[1], g[0]].set(True)
        F_dev = np.asarray(distance_to_targets(E[:, k + 1], targets))
        F_host = host_distance_to_targets(E_np[:, k + 1], g[1] * W + g[0])
        np.testing.assert_array_equal(F_host, F_dev, err_msg=f"{name} goal {k}")
