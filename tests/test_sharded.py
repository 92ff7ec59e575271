"""Sharded SPMD planning tests on the virtual 8-device CPU mesh."""

import os

import numpy as np
import pytest

from pushworld_tpu.core.puzzle import Puzzle


def test_solve_group_on_mesh(puzzles_dir):
    import jax

    from pushworld_tpu.parallel.mesh import make_mesh
    from pushworld_tpu.parallel.sharded import solve_group

    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh()

    names = ["simple", "chain", "push_left", "multi_goal", "lshape", "no_solution"]
    named = [
        (n, Puzzle.from_file(os.path.join(puzzles_dir, n + ".pwp"))) for n in names
    ]
    results = solve_group(
        named,
        mesh=mesh,
        time_limit=300,
        expand=16,
        frontier_capacity=1 << 8,
        visited_bits=12,
        history_capacity=1 << 12,
        chunk=8,
    )
    for n, p in named:
        r = results[n]
        if n == "no_solution":
            assert r.failure_reason == "no solution"
        else:
            assert r.failure_reason is None, (n, r)
            assert p.is_valid_plan(r.plan) or (
                p.is_goal_state(p.initial_state) and r.plan == []
            )
