"""Host puzzle core tests: parsing, exact dynamics, goals, plans, rendering.

Fixture style mirrors the reference test strategy (reference:
python3/test/test_puzzle.py): tiny hand-crafted puzzles, each targeting one
mechanic, with exact expected states after action sequences.
"""

import os

import numpy as np
import pytest

from pushworld_tpu.core.puzzle import (
    Actions,
    Colors,
    Puzzle,
    plan_from_string,
    plan_to_string,
)

L, R, U, D = Actions.LEFT, Actions.RIGHT, Actions.UP, Actions.DOWN


def load(puzzles_dir, name):
    return Puzzle.from_file(os.path.join(puzzles_dir, name + ".pwp"))


def test_parsing_simple(puzzles_dir):
    p = load(puzzles_dir, "simple")
    # 4x3 content + 1-cell border on each side.
    assert p.dimensions == (6, 5)
    assert p.movable_names == ["a", "m0"]
    assert p.initial_state == ((1, 2), (2, 2))
    assert p.goal_state == ((4, 2),)
    # Border walls present.
    assert (0, 0) in p.wall_cells and (5, 4) in p.wall_cells
    assert (1, 0) in p.wall_cells and (0, 2) in p.wall_cells


def test_parsing_overlap_token(puzzles_dir):
    p = load(puzzles_dir, "overlap")
    assert p.initial_state == ((1, 1), (2, 1))
    assert p.goal_state == ((1, 1),)


def test_parsing_ordering(puzzles_dir):
    p = load(puzzles_dir, "multi_goal")
    # agent, then goal movables ascending, then others.
    assert p.movable_names == ["a", "m0", "m1"]
    assert p.goal_state == ((2, 1), (4, 3))


def test_parsing_errors(tmp_path):
    with pytest.raises(ValueError):
        Puzzle.from_text(". M0 .\n")  # no agent
    with pytest.raises(ValueError):
        Puzzle.from_text("A .\n. . .\n")  # ragged rows
    with pytest.raises(ValueError):
        Puzzle.from_text("A G0 .\n")  # goal without movable


def test_agent_movement(puzzles_dir):
    p = load(puzzles_dir, "simple")
    s = p.initial_state
    s = p.get_next_state(s, U)
    assert s == ((1, 1), (2, 2))
    s = p.get_next_state(s, U)  # blocked by border wall
    assert s == ((1, 1), (2, 2))
    s = p.get_next_state(s, D)
    s = p.get_next_state(s, D)
    assert s == ((1, 3), (2, 2))
    s = p.get_next_state(s, L)  # blocked by border wall
    assert s == ((1, 3), (2, 2))


def test_simple_push(puzzles_dir):
    p = load(puzzles_dir, "simple")
    s = p.get_next_state(p.initial_state, R)
    assert s == ((2, 2), (3, 2))
    assert not p.is_goal_state(s)
    s = p.get_next_state(s, R)
    assert s == ((3, 2), (4, 2))
    assert p.is_goal_state(s)
    assert p.is_valid_plan([R, R])
    assert not p.is_valid_plan([R])
    assert not p.is_valid_plan([R, R, R])  # goal hit before plan end? no: plan continues after goal
    assert p.is_valid_plan(plan_from_string("RR"))
    assert plan_to_string([R, R]) == "RR"


def test_transitive_push(puzzles_dir):
    p = load(puzzles_dir, "chain")
    assert p.movable_names == ["a", "m0", "m1"]
    s = p.initial_state
    assert s == ((1, 1), (3, 1), (2, 1))
    s = p.get_next_state(s, R)
    assert s == ((2, 1), (4, 1), (3, 1))
    s = p.get_next_state(s, R)
    assert s == ((3, 1), (5, 1), (4, 1))
    assert p.is_goal_state(s)
    assert p.is_valid_plan([R, R])


def test_transitive_stop(puzzles_dir):
    p = load(puzzles_dir, "blocked_chain")
    s = p.initial_state
    # Chain (agent, m1, m0) would push m0 into the wall: nothing moves.
    assert p.get_next_state(s, R) == s
    # The agent can still move up alone.
    s2 = p.get_next_state(s, U)
    assert s2[0] == (1, 1)
    assert s2[1:] == s[1:]


def test_agent_wall_semantics(puzzles_dir):
    p = load(puzzles_dir, "agent_wall")
    s = p.initial_state
    assert p.agent_wall_cells == frozenset({(3, 1)})
    # Movables may be pushed onto agent-wall cells.
    s = p.get_next_state(s, R)
    assert s == ((2, 1), (3, 1))
    # But the agent itself is blocked by the agent-wall.
    assert p.get_next_state(s, R) == s

    p2 = load(puzzles_dir, "agent_wall_blocked")
    assert p2.get_next_state(p2.initial_state, R) == p2.initial_state


def test_push_left_and_goal(puzzles_dir):
    p = load(puzzles_dir, "push_left")
    s = p.get_next_state(p.initial_state, L)
    assert s == ((2, 2), (1, 2))
    assert p.is_goal_state(s)
    assert p.count_achieved_goals(s) == 1
    assert p.count_achieved_goals(p.initial_state) == 0


def test_multi_goal_counting(puzzles_dir):
    p = load(puzzles_dir, "multi_goal")
    s = p.initial_state  # a=(1,2), m0=(2,2), m1=(2,3)
    assert p.count_achieved_goals(s) == 0
    # Push m0 up onto g0.
    s1 = p.get_next_state(s, D)  # a->(1,3)
    s2 = p.get_next_state(s1, R)  # pushes m1 right -> (3,3)
    assert s2 == ((2, 3), (2, 2), (3, 3))
    assert p.count_achieved_goals(s2) == 0
    s3 = p.get_next_state(s2, U)  # agent pushes m0 up onto g0
    assert s3 == ((2, 2), (2, 1), (3, 3))
    assert p.count_achieved_goals(s3) == 1
    assert not p.is_goal_state(s3)


def test_lshape_nonconvex(puzzles_dir):
    p = load(puzzles_dir, "lshape")
    assert p.movable_cells[1] == frozenset({(0, 0), (1, 0), (0, 1)})
    s = p.initial_state  # a=(2,3), m0=(1,1)
    s = p.get_next_state(s, U)  # into the concavity: no contact
    assert s == ((2, 2), (1, 1))
    # Pushing left would shove m0 into the border wall: nothing moves.
    assert p.get_next_state(s, L) == s
    # Pushing up from below the L's right arm pushes the whole object.
    s2 = p.get_next_state(s, R)
    s2 = p.get_next_state(s2, U)  # a=(3,1): no overlap with m0
    assert s2 == ((3, 1), (1, 1))


def test_agent_only_puzzle(puzzles_dir):
    p = load(puzzles_dir, "agent_only")
    assert p.num_goals == 0
    assert p.is_goal_state(p.initial_state)
    assert p.initial_state == ((2, 2),)
    assert p.get_next_state(p.initial_state, R) == ((3, 2),)


def test_render_shapes_and_colors(puzzles_dir):
    p = load(puzzles_dir, "simple")
    img = p.render(p.initial_state, border_width=2, pixels_per_cell=10)
    assert img.shape == (5 * 10, 6 * 10, 3)
    assert img.dtype == np.uint8
    # Wall fill at the border (center of cell (0,0)).
    assert tuple(img[5, 5]) == Colors.WALL
    # Agent fill at cell (1,2).
    assert tuple(img[25, 15]) == Colors.AGENT
    # Movable (goal object) fill at cell (2,2).
    assert tuple(img[25, 25]) == Colors.GOAL_OBJECT
    # Goal cell (4,2): transparent fill (white) with red border.
    assert tuple(img[25, 45]) == (255, 255, 255)
    assert tuple(img[21, 41]) == Colors.GOAL_BORDER
    # Empty cell stays white.
    assert tuple(img[15, 35]) == (255, 255, 255)

    with pytest.raises(ValueError):
        p.render(p.initial_state, border_width=0)
    with pytest.raises(ValueError):
        p.render(p.initial_state, border_width=3, pixels_per_cell=5)


def test_render_plan_frames(puzzles_dir):
    p = load(puzzles_dir, "simple")
    frames = p.render_plan([R, R], pixels_per_cell=5, border_width=1)
    assert len(frames) == 3
    assert not np.array_equal(frames[0], frames[1])


# ---------------------------------------------------------------- goldens

GOLDEN_FIXTURES = ["trivial", "transitive_pushing", "multiple_goals", "trivial_overlap"]


@pytest.mark.parametrize("name", GOLDEN_FIXTURES)
def test_render_matches_reference_golden(puzzles_dir, name):
    """Pixel-exact parity with the reference renderer (reference:
    python3/src/pushworld/puzzle.py:426-469): goldens in tests/goldens were
    rendered by the reference implementation on its own test fixtures
    (border_width=1, pixels_per_cell=10)."""
    here = os.path.dirname(os.path.abspath(__file__))
    p = Puzzle.from_file(os.path.join(here, "puzzles", "ref", name + ".pwp"))
    golden = np.load(os.path.join(here, "goldens", f"render_{name}.npy"))
    img = p.render(p.initial_state, border_width=1, pixels_per_cell=10)
    assert img.shape == golden.shape
    assert img.dtype == golden.dtype
    np.testing.assert_array_equal(img, golden)
