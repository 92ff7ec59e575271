"""Reference policies for batched rollouts.

The greedy goal-distance policy realizes BASELINE config 2 ("level-0 puzzle
set, 4096 vmapped rollouts/chip with greedy goal-distance policy"): each
rollout picks the action minimizing the depth-0 RGD estimate of the
successor state, breaking ties randomly.
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pushworld_tpu.core.compiled import CompiledPuzzle
from pushworld_tpu.ops.rgd import RGDTables, rgd_heuristic
from pushworld_tpu.ops.step import step


@partial(jax.jit, static_argnames=())
def greedy_goal_distance_actions(
    cp: CompiledPuzzle, tables: RGDTables, rng: jax.Array, positions: jax.Array
) -> jax.Array:
    """(B,) int32 actions minimizing the successor depth-0 RGD estimate.

    positions: (B, N, 2) int32 states of one puzzle.
    """
    B = positions.shape[0]

    def next_h(a):
        nxt = jax.vmap(step, in_axes=(None, 0, None))(cp, positions, np.int32(a))
        return rgd_heuristic(tables, nxt, max_depth=0)

    h = jnp.stack([next_h(a) for a in range(4)], axis=1)  # (B, 4)
    # Random tie-breaking: add tiny noise below the heuristic's resolution.
    noise = jax.random.uniform(rng, (B, 4)) * 0.5
    return jnp.argmin(h + noise, axis=1).astype(jnp.int32)


def make_greedy_policy(cp: CompiledPuzzle, tables: RGDTables):
    """Policy closure compatible with :meth:`VectorEnv.rollout`."""

    def policy(rng, positions):
        return greedy_goal_distance_actions(cp, tables, rng, positions)

    return policy
