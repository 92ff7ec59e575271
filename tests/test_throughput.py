"""Smoke tests for the vectorized-env throughput measurement."""

import os

from pushworld_tpu.core.puzzle import Puzzle
from pushworld_tpu.envs.throughput import measure_env_throughput


def test_measure_env_throughput_smoke(puzzles_dir):
    puzzle = Puzzle.from_file(os.path.join(puzzles_dir, "chain.pwp"))
    out = measure_env_throughput(
        puzzle, batch_size=16, horizon=8, reps=1, host_baseline_steps=16
    )
    assert out["steps_per_s"] > 0
    assert out["host_steps_per_s"] > 0
    assert out["obs_bytes_per_step"] > 0
    assert out["batch_size"] == 16 and out["horizon"] == 8


def test_measure_env_throughput_no_obs(puzzles_dir):
    puzzle = Puzzle.from_file(os.path.join(puzzles_dir, "chain.pwp"))
    out = measure_env_throughput(
        puzzle, batch_size=8, horizon=4, reps=1,
        observations=False, host_baseline_steps=0,
    )
    assert out["steps_per_s"] > 0
    assert out["obs_bytes_per_step"] == 0
    assert "host_steps_per_s" not in out
