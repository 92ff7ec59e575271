"""Pure-JAX vectorized PushWorld environment.

Reward/termination semantics match the reference Gym environment exactly
(reference: python3/src/pushworld/gym_env.py:210-226):

- terminal reward +10 when the goal is reached,
- otherwise ``delta(achieved goals) - 0.01`` per step,
- truncation after ``max_steps`` steps since the last reset.

Unlike the reference (one Python env stepping one puzzle with host-side
rendering), this environment advances B independent rollouts per call under
``jit``/``vmap`` — observations are the compact state tensor by default;
image observations are rendered lazily on host (or via
:mod:`pushworld_tpu.ops.render` on device) only when requested.

Auto-reset: when an episode terminates or truncates, the next ``step``
starts from the initial state again (standard batched-env convention; the
reference requires a manual ``reset``, which the Gym/dm_env wrappers in
:mod:`pushworld_tpu.envs.gym_env` / :mod:`pushworld_tpu.envs.dm_env_impl`
preserve).
"""

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pushworld_tpu.core.compiled import CompiledPuzzle
from pushworld_tpu.ops.step import (
    build_contact_lists,
    count_achieved_goals,
    expand_children,
    is_goal_state,
    step,
)

TERMINAL_REWARD = 10.0
STEP_PENALTY = 0.01


@dataclass(frozen=True)
class EnvState:
    """Batched environment state (a JAX pytree)."""

    positions: jax.Array  # int32 (B, N, 2)
    steps: jax.Array  # int32 (B,)
    achieved: jax.Array  # int32 (B,) goals achieved at current positions
    puzzle_idx: jax.Array  # int32 (B,) index into the puzzle batch


jax.tree_util.register_dataclass(
    EnvState, data_fields=["positions", "steps", "achieved", "puzzle_idx"], meta_fields=[]
)


class VectorEnv:
    """B lockstep rollouts over a batch of compiled puzzles.

    Args:
        puzzles: a stacked :class:`CompiledPuzzle` with leading puzzle axis P
            (or a single unstacked puzzle).
        max_steps: truncation horizon (None = no truncation).
    """

    def __init__(self, puzzles: CompiledPuzzle, max_steps: Optional[int] = None):
        self._single = jnp.asarray(puzzles.init_state).ndim == 2
        self.puzzles = puzzles
        self.max_steps = max_steps
        self.num_puzzles = 1 if self._single else int(jnp.asarray(puzzles.init_state).shape[0])
        # Single-puzzle batches step through the gather-free 4-action
        # expansion + per-env action select (the dense push-table gather
        # XLA lowers at ~30 ns/element dominated the step; see
        # ops.step.expand_children).
        if self._single:
            c, m = build_contact_lists(puzzles)
            self._contacts = jnp.asarray(c)
            self._contacts_mask = jnp.asarray(m)

    def _gather_puzzle(self, idx: jax.Array) -> CompiledPuzzle:
        if self._single:
            return self.puzzles
        return jax.tree_util.tree_map(lambda x: jnp.asarray(x)[idx], self.puzzles)

    def _vmap(self, fn):
        """vmaps ``fn(cp, *args)`` over the batch, broadcasting a single puzzle."""
        in_axes = (None, 0) if self._single else (0, 0)
        return jax.vmap(fn, in_axes=in_axes)

    @partial(jax.jit, static_argnums=(0, 2))
    def reset(self, rng: jax.Array, batch_size: int = None) -> EnvState:  # noqa: D401
        """Samples a puzzle per rollout and starts from its initial state."""
        if batch_size is None:
            raise ValueError("batch_size is required")
        idx = jax.random.randint(rng, (batch_size,), 0, self.num_puzzles)
        cp = self._gather_puzzle(idx)
        positions = jnp.asarray(cp.init_state)
        if self._single:
            positions = jnp.broadcast_to(positions, (batch_size,) + positions.shape)
        achieved = self._vmap(count_achieved_goals)(cp, positions)
        return EnvState(
            positions=positions,
            steps=jnp.asarray(np.zeros((batch_size,), np.int32)),
            achieved=achieved.astype(jnp.int32),
            puzzle_idx=idx,
        )

    @partial(jax.jit, static_argnums=0)
    def step(self, state: EnvState, actions: jax.Array):
        """Advances every rollout by one action.

        Returns ``(next_state, obs_positions, reward, terminated, truncated)``
        with auto-reset applied to ``next_state`` (the returned observation /
        reward reflect the pre-reset transition).
        """
        cp = self._gather_puzzle(state.puzzle_idx)
        if self._single:
            B = state.positions.shape[0]
            children = expand_children(
                cp, self._contacts, self._contacts_mask, state.positions
            )  # (4B, N, 2) in action-block order
            next_pos = children.reshape(4, B, *children.shape[1:])[
                actions, jnp.arange(B)
            ]
        else:
            next_pos = jax.vmap(step)(cp, state.positions, actions)
        terminated = self._vmap(is_goal_state)(cp, next_pos)
        achieved = self._vmap(count_achieved_goals)(cp, next_pos).astype(jnp.int32)
        reward = jnp.where(
            terminated,
            TERMINAL_REWARD,
            (achieved - state.achieved).astype(jnp.float32) - STEP_PENALTY,
        )
        steps = state.steps + 1
        if self.max_steps is None:
            truncated = jnp.zeros_like(terminated)
        else:
            truncated = ~terminated & (steps >= self.max_steps)
        done = terminated | truncated

        init_pos = jnp.asarray(cp.init_state)
        if self._single:
            init_pos = jnp.broadcast_to(init_pos, next_pos.shape)
        init_achieved = self._vmap(count_achieved_goals)(cp, init_pos).astype(jnp.int32)
        new_state = EnvState(
            positions=jnp.where(done[:, None, None], init_pos, next_pos),
            steps=jnp.where(done, 0, steps),
            achieved=jnp.where(done, init_achieved, achieved),
            puzzle_idx=state.puzzle_idx,
        )
        return new_state, next_pos, reward, terminated, truncated

    def rollout(self, rng: jax.Array, policy_fn, batch_size: int, horizon: int):
        """Runs ``horizon`` steps with ``policy_fn(rng, positions) -> actions``.

        Returns the final env state and per-step (reward, terminated) stacked
        over time.  Fully jitted via ``lax.scan``.
        """

        def body(carry, step_rng):
            env_state = carry
            actions = policy_fn(step_rng, env_state.positions)
            env_state, _, reward, terminated, truncated = self.step(env_state, actions)
            return env_state, (reward, terminated)

        env_state = self.reset(rng, batch_size)
        rngs = jax.random.split(rng, horizon)
        return jax.lax.scan(body, env_state, rngs)
