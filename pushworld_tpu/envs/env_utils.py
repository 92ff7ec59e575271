"""Observation helpers shared by the Gym/dm_env wrappers.

reference: python3/src/pushworld/utils/env_utils.py:25-91 (max benchmark
dimensions; center-padded float32 observation render).
"""

from typing import Tuple

import numpy as np

from pushworld_tpu import config
from pushworld_tpu.core.puzzle import Puzzle
from pushworld_tpu.utils.filesystem import iter_files_with_extension


def get_max_puzzle_dimensions() -> Tuple[int, int]:
    """(max height, max width), including border walls, over the benchmark
    puzzle directory."""
    max_height = 0
    max_width = 0
    for path in iter_files_with_extension(
        config.BENCHMARK_PUZZLES_PATH, config.PUZZLE_EXTENSION
    ):
        with open(path, "r") as f:
            lines = [ln for ln in f.readlines()]
        max_height = max(max_height, len(lines) + 2)
        max_width = max(max_width, len(lines[0].strip().split()) + 2)
    return max_height, max_width


def render_observation_padded(
    puzzle: Puzzle,
    state,
    max_cell_height: int,
    max_cell_width: int,
    pixels_per_cell: int,
    border_width: int,
) -> np.ndarray:
    """float32 [0, 1] RGB observation, center zero-padded to
    (max_cell_height * ppc, max_cell_width * ppc, 3)."""
    image = (
        puzzle.render(
            state, border_width=border_width, pixels_per_cell=pixels_per_cell
        ).astype(np.float32)
        / 255
    )
    height_padding = max_cell_height * pixels_per_cell - image.shape[0]
    width_padding = max_cell_width * pixels_per_cell - image.shape[1]
    top = height_padding // 2
    left = width_padding // 2
    return np.pad(
        image,
        [(top, height_padding - top), (left, width_padding - left), (0, 0)],
    )
