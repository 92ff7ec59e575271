"""Benchmark dataset integrity + device-dynamics validation on human plans.

reference behavior: python3/test/test_dataset.py:24-61 — every solution names
an existing puzzle, every plan validates, every puzzle has a solution.  Here
additionally: the vectorized device dynamics reproduce every human plan
exactly (differential test of the full trajectory on a sample).
"""

import os

import numpy as np
import pytest
import yaml

from pushworld_tpu import config
from pushworld_tpu.core.puzzle import Puzzle, plan_from_string
from pushworld_tpu.utils.filesystem import get_puzzle_file_paths, iter_files_with_extension

pytestmark = pytest.mark.skipif(
    not os.path.isdir(config.BENCHMARK_PUZZLES_PATH),
    reason="benchmark dataset not available",
)


def _load_solutions():
    solutions = {}
    for path in iter_files_with_extension(config.BENCHMARK_SOLUTIONS_PATH, ".yaml"):
        with open(path) as f:
            doc = yaml.safe_load(f)
        solutions[doc["puzzle"]] = doc["plan"]
    return solutions


def test_dataset_integrity():
    puzzle_paths = get_puzzle_file_paths(config.BENCHMARK_PUZZLES_PATH)
    solutions = _load_solutions()
    assert len(puzzle_paths) == 223
    errors = []
    for name, plan in solutions.items():
        if name not in puzzle_paths:
            errors.append(f"solution for unknown puzzle {name}")
            continue
        puzzle = Puzzle.from_file(puzzle_paths[name])
        if not puzzle.is_valid_plan(plan_from_string(plan)):
            errors.append(f"invalid plan for {name}")
    for name in puzzle_paths:
        if name not in solutions:
            errors.append(f"no solution for {name}")
    assert not errors, errors


def test_device_dynamics_on_human_plans():
    import jax.numpy as jnp

    from pushworld_tpu.core.compiled import compile_puzzle
    from pushworld_tpu.ops.step import is_goal_state, run_plan

    puzzle_paths = get_puzzle_file_paths(config.BENCHMARK_PUZZLES_PATH)
    solutions = _load_solutions()
    # A deterministic sample across levels (full sweep is covered by bench).
    names = sorted(solutions)[::11]
    for name in names:
        puzzle = Puzzle.from_file(puzzle_paths[name])
        plan = plan_from_string(solutions[name])
        cp = compile_puzzle(puzzle)
        final, traj = run_plan(cp, jnp.asarray(plan, jnp.int32), return_states=True)
        # Differential check of the entire trajectory.
        s = puzzle.initial_state
        traj = np.asarray(traj)
        for t, a in enumerate(plan):
            s = puzzle.get_next_state(s, a)
            np.testing.assert_array_equal(
                traj[t + 1, : puzzle.num_movables], np.array(s, np.int32),
                err_msg=f"{name} step {t}",
            )
        assert bool(is_goal_state(cp, final))
