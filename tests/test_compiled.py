"""Dense collision-table content tests (analog of the reference's exact
collision-map assertions, test_puzzle.py:134-246)."""

import os

import numpy as np

from pushworld_tpu.core.compiled import compile_puzzle, compute_delta
from pushworld_tpu.core.puzzle import Puzzle

L, R, U, D = range(4)


def test_static_block_tables(puzzles_dir):
    p = Puzzle.from_file(os.path.join(puzzles_dir, "simple.pwp"))
    cp = compile_puzzle(p)
    sb = np.asarray(cp.static_block)  # (4, N, H, W)

    # Agent at x=1 moving LEFT hits the border wall column x=0.
    assert sb[L, 0, 2, 1]
    # Agent in the open moving RIGHT is free.
    assert not sb[R, 0, 2, 1]
    # Agent at the rightmost content column moving RIGHT hits the border.
    assert sb[R, 0, 2, 4]
    # Top/bottom borders.
    assert sb[U, 0, 1, 2]
    assert sb[D, 0, 3, 2]


def test_agent_wall_static_blocks_only_agent(puzzles_dir):
    p = Puzzle.from_file(os.path.join(puzzles_dir, "agent_wall.pwp"))
    cp = compile_puzzle(p)
    sb = np.asarray(cp.static_block)
    # aw at (3,1): the agent at (2,1) is blocked moving RIGHT...
    assert sb[R, 0, 1, 2]
    # ...but the movable m1 at (2,1) is not.
    assert not sb[R, 1, 1, 2]


def test_push_table_contacts(puzzles_dir):
    p = Puzzle.from_file(os.path.join(puzzles_dir, "simple.pwp"))
    cp = compile_puzzle(p)
    push = np.asarray(cp.push)  # (4, N, N, K, K)
    d = cp.delta
    # 1x1 agent pushes 1x1 m0 RIGHT only from rel offset (-1, 0).
    expected = np.zeros_like(push[R, 0, 1])
    expected[d + 0, d - 1] = True
    np.testing.assert_array_equal(push[R, 0, 1], expected)
    # And LEFT only from (+1, 0).
    assert push[L, 0, 1, d, d + 1]
    assert push[L, 0, 1].sum() == 1
    # The agent is never a pushee.
    assert push[:, 1, 0].sum() == 0


def test_push_table_excludes_overlap(puzzles_dir):
    # Pre-overlapping relative offsets are excluded (unreachable states).
    p = Puzzle.from_file(os.path.join(puzzles_dir, "lshape.pwp"))
    cp = compile_puzzle(p)
    push = np.asarray(cp.push)
    d = cp.delta
    # Offset (0,0) means overlap for any pair sharing a cell: never a push.
    assert not push[:, 0, 1, d, d].any()


def test_compute_delta_covers_contacts(puzzles_dir):
    for name in ["simple", "lshape", "heur/shortest_path_tool"]:
        p = Puzzle.from_file(os.path.join(puzzles_dir, name + ".pwp"))
        delta = compute_delta(p)
        cp = compile_puzzle(p)
        push = np.asarray(cp.push)
        K = push.shape[-1]
        assert K == 2 * delta + 1
        # No contact sits on the table boundary (radius is sufficient).
        assert not push[:, :, :, 0, :].any()
        assert not push[:, :, :, -1, :].any()
        assert not push[:, :, :, :, 0].any()
        assert not push[:, :, :, :, -1].any()
