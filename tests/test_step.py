"""Differential tests: JAX batched dynamics vs the exact host oracle."""

import os

import numpy as np
import pytest

from pushworld_tpu.core.compiled import compile_batch, compile_puzzle, stack_puzzles
from pushworld_tpu.core.puzzle import NUM_ACTIONS, Puzzle

ALL_FIXTURES = [
    "simple",
    "chain",
    "blocked_chain",
    "agent_wall",
    "agent_wall_blocked",
    "multi_goal",
    "push_left",
    "overlap",
    "lshape",
    "no_solution",
    "agent_only",
]


def host_rollout(puzzle, actions):
    states = [puzzle.initial_state]
    for a in actions:
        states.append(puzzle.get_next_state(states[-1], a))
    return states


@pytest.mark.parametrize("name", ALL_FIXTURES)
def test_step_matches_host(puzzles_dir, name):
    import jax.numpy as jnp

    from pushworld_tpu.ops.step import run_plan

    puzzle = Puzzle.from_file(os.path.join(puzzles_dir, name + ".pwp"))
    cp = compile_puzzle(puzzle)

    rng = np.random.RandomState(0)
    actions = rng.randint(0, NUM_ACTIONS, size=64)
    host_states = host_rollout(puzzle, actions)

    _, traj = run_plan(cp, jnp.asarray(actions, jnp.int32), return_states=True)
    traj = np.asarray(traj)
    n = puzzle.num_movables
    for t, hs in enumerate(host_states):
        np.testing.assert_array_equal(
            traj[t, :n], np.array(hs, np.int32), err_msg=f"{name} step {t}"
        )


def test_step_batch_and_padding(puzzles_dir):
    import jax.numpy as jnp

    from pushworld_tpu.ops.step import step_batch

    puzzle = Puzzle.from_file(os.path.join(puzzles_dir, "chain.pwp"))
    # Pad generously to prove padding invariance.
    cp = compile_puzzle(puzzle, n_pad=8, h_pad=12, w_pad=16, delta=6)

    rng = np.random.RandomState(1)
    B = 37
    # Random reachable states via random walks on the host.
    states = []
    for b in range(B):
        s = puzzle.initial_state
        for a in rng.randint(0, NUM_ACTIONS, size=rng.randint(0, 30)):
            s = puzzle.get_next_state(s, a)
        states.append(s)
    actions = rng.randint(0, NUM_ACTIONS, size=B)

    batch = np.zeros((B, cp.n, 2), np.int32)
    for b, s in enumerate(states):
        batch[b, : puzzle.num_movables] = s
    out = np.asarray(step_batch(cp, jnp.asarray(batch), jnp.asarray(actions)))

    for b in range(B):
        expected = puzzle.get_next_state(states[b], int(actions[b]))
        np.testing.assert_array_equal(out[b, : puzzle.num_movables], np.array(expected))
        # Padded movables never move.
        np.testing.assert_array_equal(out[b, puzzle.num_movables :], 0)


def test_multi_puzzle_batch(puzzles_dir):
    import jax
    import jax.numpy as jnp

    from pushworld_tpu.ops.step import count_achieved_goals, is_goal_state, step_puzzles

    names = ["simple", "chain", "multi_goal", "push_left"]
    puzzles = [Puzzle.from_file(os.path.join(puzzles_dir, n + ".pwp")) for n in names]
    cp = compile_batch(puzzles)

    states = np.asarray(cp.init_state)
    rng = np.random.RandomState(2)
    host_states = [p.initial_state for p in puzzles]
    for t in range(50):
        actions = rng.randint(0, NUM_ACTIONS, size=len(puzzles))
        states = np.asarray(step_puzzles(cp, jnp.asarray(states), jnp.asarray(actions)))
        for i, p in enumerate(puzzles):
            host_states[i] = p.get_next_state(host_states[i], int(actions[i]))
            np.testing.assert_array_equal(
                states[i, : p.num_movables], np.array(host_states[i]), err_msg=f"t={t} puzzle={names[i]}"
            )
        goals = np.asarray(jax.vmap(count_achieved_goals)(cp, jnp.asarray(states)))
        is_goal = np.asarray(jax.vmap(is_goal_state)(cp, jnp.asarray(states)))
        for i, p in enumerate(puzzles):
            assert goals[i] == p.count_achieved_goals(host_states[i])
            assert bool(is_goal[i]) == p.is_goal_state(host_states[i])


@pytest.mark.parametrize("name", ALL_FIXTURES)
def test_expand_children_matches_step(puzzles_dir, name):
    """The gather-free 4-action expansion must equal the per-action step
    kernel on random reachable states (reached by random walks)."""
    import jax
    import jax.numpy as jnp

    from pushworld_tpu.ops.rgd import build_rgd_tables
    from pushworld_tpu.ops.step import expand_children, step

    puzzle = Puzzle.from_file(os.path.join(puzzles_dir, name + ".pwp"))
    cp = compile_puzzle(puzzle, n_pad=puzzle.num_movables + 2)
    t = build_rgd_tables(puzzle, cp, max_depth=1)

    rng = np.random.RandomState(7)
    states = [puzzle.initial_state]
    s = puzzle.initial_state
    for a in rng.randint(0, NUM_ACTIONS, size=40):
        s = puzzle.get_next_state(s, a)
        states.append(s)
    B = len(states)
    parents = np.zeros((B, cp.n, 2), np.int32)
    for b, st in enumerate(states):
        parents[b, : puzzle.num_movables] = np.array(st, np.int32)

    children = np.asarray(
        expand_children(cp, t.contacts, t.contacts_mask, jnp.asarray(parents))
    )
    par4 = np.tile(parents, (4, 1, 1))
    actions = np.repeat(np.arange(4, dtype=np.int32), B)
    expected = np.asarray(
        jax.vmap(step, in_axes=(None, 0, 0))(
            cp, jnp.asarray(par4), jnp.asarray(actions)
        )
    )
    np.testing.assert_array_equal(children, expected, err_msg=name)
