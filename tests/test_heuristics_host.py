"""Exact-value tests for the host heuristics oracle.

Expected values are the reference C++ planner's own test vectors
(reference: cpp/test/heuristics/test_domain_transition_graph.cc,
test_recursive_graph_distance.cc, test_novelty_heuristic.cc); the fixture
grids under tests/puzzles/heur/ reproduce the reference test geometries so
the numbers are directly comparable.
"""

import math
import os

import pytest

from pushworld_tpu.core.puzzle import Actions, Puzzle
from pushworld_tpu.search.heuristics_host import (
    MovementGraphs,
    NoveltyHeuristic,
    PathDistances,
    RecursiveGraphDistance,
)

INF = math.inf
L, R, U, D = range(4)


def load(puzzles_dir, name):
    return Puzzle.from_file(os.path.join(puzzles_dir, "heur", name + ".pwp"))


# ----------------------------------------------------- movement graphs / DTG


def test_movement_graphs_trivial(puzzles_dir):
    # reference: test_domain_transition_graph.cc:27-58
    p = load(puzzles_dir, "trivial")
    g = MovementGraphs(p)

    agent_graph = {
        (1, 2): {(2, 2)},
        (2, 1): {(2, 2), (3, 1)},
        (2, 2): {(1, 2), (3, 2), (2, 1), (2, 3)},
        (2, 3): {(2, 2), (3, 3)},
        (3, 1): {(2, 1), (3, 2)},
        (3, 2): {(3, 1), (3, 3), (2, 2)},
        (3, 3): {(2, 3), (3, 2)},
    }
    assert g.edges[0] == agent_graph

    m0_graph = {
        (1, 2): set(),
        (1, 3): set(),
        (2, 1): set(),
        (2, 2): {(1, 2), (3, 2), (2, 1), (2, 3)},
        (2, 3): {(1, 3)},
        (3, 1): set(),
        (3, 2): {(3, 1), (3, 3)},
        (3, 3): set(),
    }
    assert g.edges[1] == m0_graph


def test_movement_graphs_tool(puzzles_dir):
    # reference: test_domain_transition_graph.cc:60-71
    p = load(puzzles_dir, "trivial_tool")
    g = MovementGraphs(p)
    assert len(g.edges[0]) == 15
    target_graph = {
        (4, 1): set(),
        (4, 2): {(4, 1)},
        (4, 3): {(4, 2), (4, 4)},
        (4, 4): set(),
    }
    assert g.edges[1] == target_graph  # m0 (the goal object)
    assert len(g.edges[2]) == 12  # m1 (the tool)


def test_path_distances_trivial(puzzles_dir):
    # reference: test_domain_transition_graph.cc:74-152
    p = load(puzzles_dir, "trivial")
    g = MovementGraphs(p)
    agent = PathDistances(g.edges[0])
    obj = PathDistances(g.edges[1])

    for _ in range(2):  # repeat to check caching stability
        assert agent.get((1, 2), (1, 2)) == 0
        assert agent.get((1, 2), (2, 2)) == 1
        assert agent.get((1, 2), (3, 3)) == 3
        assert agent.get((1, 2), (3, 1)) == 3
        assert agent.get((2, 3), (3, 1)) == 3
        assert agent.get((2, 3), (2, 2)) == 1
        assert agent.get((2, 3), (2, 3)) == 0
        assert agent.get((1, 1), (2, 3)) == INF
        assert agent.get((2, 2), (1, 1)) == INF
        assert agent.get((3, 1), (1, 3)) == INF

        assert obj.get((2, 2), (3, 1)) == 2
        assert obj.get((2, 2), (1, 3)) == 2
        assert obj.get((2, 2), (3, 3)) == 2
        assert obj.get((2, 2), (2, 3)) == 1
        assert obj.get((3, 2), (3, 1)) == 1
        assert obj.get((3, 1), (3, 1)) == 0
        assert obj.get((2, 1), (3, 1)) == INF
        assert obj.get((1, 2), (1, 3)) == INF
        assert obj.get((3, 1), (2, 2)) == INF


# ----------------------------------------------------------------------- RGD


def test_rgd_trivial(puzzles_dir):
    # reference: test_recursive_graph_distance.cc:28-46
    p = load(puzzles_dir, "trivial")
    rgd = RecursiveGraphDistance(p)
    s = p.initial_state
    assert rgd.estimate(s) == 2
    assert rgd.estimate(s) == 2  # cache stability
    s = p.get_next_state(s, R)
    assert rgd.estimate(s) == 3
    assert rgd.estimate(s) == 3
    s = p.get_next_state(s, U)
    assert rgd.estimate(s) == 4
    assert rgd.estimate(s) == 4


def test_rgd_multiple_goals(puzzles_dir):
    # reference: test_recursive_graph_distance.cc:49-69
    p = load(puzzles_dir, "multiple_goals")
    rgd = RecursiveGraphDistance(p)
    s0 = p.initial_state
    assert rgd.estimate(s0) == 4
    assert rgd.estimate(p.get_next_state(s0, L)) == 4
    assert rgd.estimate(p.get_next_state(s0, R)) == 4
    assert rgd.estimate(p.get_next_state(s0, U)) == 6
    assert rgd.estimate(p.get_next_state(s0, D)) == 6


@pytest.mark.parametrize(
    "name,fewest_tools,expected",
    [
        ("transitive_pushing", False, 3),
        ("transitive_pushing", True, 4),
        ("necessary_transitive_pushing1", True, 9),
        ("necessary_transitive_pushing2", True, 2),
        ("necessary_transitive_pushing3", True, 4),
        ("blocked_transitive_pushing1", True, 2),
        ("blocked_transitive_pushing2", True, 3),
        ("trivial_tool2", True, 4),
        ("shortest_path_tool", True, 13),
        ("shortest_path_tool", False, 6),
    ],
)
def test_rgd_transitive_pushing(puzzles_dir, name, fewest_tools, expected):
    # reference: test_recursive_graph_distance.cc:72-141
    p = load(puzzles_dir, name)
    rgd = RecursiveGraphDistance(p, fewest_tools=fewest_tools)
    assert rgd.estimate(p.initial_state) == expected
    assert rgd.estimate(p.initial_state) == expected  # cache stability


# ------------------------------------------------------------------- novelty


def test_novelty_semantics(puzzles_dir):
    # reference semantics: novelty.cc:30-77
    p = load(puzzles_dir, "multiple_goals")
    n = p.num_movables
    h = NoveltyHeuristic(n)
    s0 = p.initial_state
    # First sight of everything: novelty 1.
    assert h.estimate(s0, list(range(n))) == 1.0
    # Same state again, nothing moved: no object iterated -> novelty 3.
    assert h.estimate(s0, []) == 3.0
    # Agent moves to a new position: novelty 1.
    s1 = p.get_next_state(s0, U)
    assert h.estimate(s1, [0]) == 1.0
    # Agent returns to its old position: position seen, but the pairs with
    # the *other* objects at their (unchanged) positions were already seen
    # from s0 -> novelty 3.
    assert h.estimate(s0, [0]) == 3.0
    # Push m1 left: new positions for agent and m1 -> novelty 1; then
    # revisiting the same state yields 3.
    s2 = p.get_next_state(s0, L)
    moved = [i for i in range(n) if s2[i] != s0[i]]
    assert h.estimate(s2, moved) == 1.0
    assert h.estimate(s2, moved) == 3.0


def test_novelty_pair_detection():
    h = NoveltyHeuristic(3)
    sA = ((1, 1), (5, 5), (9, 9))
    assert h.estimate(sA, [0, 1, 2]) == 1.0
    # Move object 0 to a fresh position: novelty 1.
    sB = ((2, 1), (5, 5), (9, 9))
    assert h.estimate(sB, [0]) == 1.0
    # Now a state combining seen positions in an unseen pairing:
    # object 1 at (6,5) is new -> 1 first...
    sC = ((2, 1), (6, 5), (9, 9))
    assert h.estimate(sC, [1]) == 1.0
    # ...then object 0 back at (1,1) (seen) but pair (0@\(1,1\), 1@(6,5))
    # unseen -> novelty 2.
    sD = ((1, 1), (6, 5), (9, 9))
    assert h.estimate(sD, [0]) == 2.0
