"""Environment contract tests: VectorEnv, Gym, dm_env wrappers.

Mirrors the reference env test strategy (reference: python3/test/test_gym_env.py,
test_dm_env.py): observation within space and consistent with render, reward
schedule incl. goal deltas and -0.01 step cost, termination vs truncation,
reset determinism.
"""

import os

import numpy as np
import pytest

from pushworld_tpu.core.compiled import compile_batch, compile_puzzle
from pushworld_tpu.core.puzzle import Actions, Puzzle

L, R, U, D = range(4)


# ------------------------------------------------------------------ VectorEnv


def test_vector_env_reward_semantics(puzzles_dir):
    import jax
    import jax.numpy as jnp

    from pushworld_tpu.envs.vector_env import VectorEnv

    puzzle = Puzzle.from_file(os.path.join(puzzles_dir, "simple.pwp"))
    cp = compile_puzzle(puzzle)
    env = VectorEnv(cp, max_steps=5)
    state = env.reset(jax.random.PRNGKey(0), batch_size=4)

    # Step R: no goal change => -0.01.
    state, obs, reward, term, trunc = env.step(state, jnp.full((4,), R, jnp.int32))
    np.testing.assert_allclose(np.asarray(reward), -0.01)
    assert not np.asarray(term).any() and not np.asarray(trunc).any()

    # Second R reaches the goal => +10 and terminated; auto-reset occurs.
    state, obs, reward, term, trunc = env.step(state, jnp.full((4,), R, jnp.int32))
    np.testing.assert_allclose(np.asarray(reward), 10.0)
    assert np.asarray(term).all()
    np.testing.assert_array_equal(
        np.asarray(state.positions), np.broadcast_to(cp.init_state, (4, cp.n, 2))
    )
    assert (np.asarray(state.steps) == 0).all()


def test_vector_env_goal_delta_reward(puzzles_dir):
    import jax
    import jax.numpy as jnp

    from pushworld_tpu.envs.vector_env import VectorEnv

    puzzle = Puzzle.from_file(os.path.join(puzzles_dir, "multi_goal.pwp"))
    cp = compile_puzzle(puzzle)
    env = VectorEnv(cp)
    state = env.reset(jax.random.PRNGKey(0), batch_size=2)

    # D, R, U achieves goal 0 (of 2): reward = +1 - 0.01 on the U step.
    for a, expected in [(D, -0.01), (R, -0.01), (U, 0.99)]:
        state, obs, reward, term, trunc = env.step(
            state, jnp.full((2,), a, jnp.int32)
        )
        np.testing.assert_allclose(np.asarray(reward), expected, atol=1e-6)
        assert not np.asarray(term).any()

    # Pushing m0 further up is blocked by the border wall: plain step cost.
    state, obs, reward, term, trunc = env.step(state, jnp.full((2,), U, jnp.int32))
    np.testing.assert_allclose(np.asarray(reward), -0.01, atol=1e-6)

    # Walk around (L, then U) and push the goal object off its goal (R):
    # reward = -1 - 0.01.
    for a, expected in [(L, -0.01), (U, -0.01), (R, -1.01)]:
        state, obs, reward, term, trunc = env.step(
            state, jnp.full((2,), a, jnp.int32)
        )
        np.testing.assert_allclose(np.asarray(reward), expected, atol=1e-6)


def test_vector_env_truncation(puzzles_dir):
    import jax
    import jax.numpy as jnp

    from pushworld_tpu.envs.vector_env import VectorEnv

    puzzle = Puzzle.from_file(os.path.join(puzzles_dir, "no_solution.pwp"))
    cp = compile_puzzle(puzzle)
    env = VectorEnv(cp, max_steps=3)
    state = env.reset(jax.random.PRNGKey(0), batch_size=2)
    for t in range(3):
        state, obs, reward, term, trunc = env.step(
            state, jnp.full((2,), U, jnp.int32)
        )
        assert not np.asarray(term).any()
        assert np.asarray(trunc).all() == (t == 2)
    assert (np.asarray(state.steps) == 0).all()  # auto-reset after truncation


def test_vector_env_multi_puzzle_rollout(puzzles_dir):
    import jax
    import jax.numpy as jnp

    from pushworld_tpu.envs.vector_env import VectorEnv

    puzzles = [
        Puzzle.from_file(os.path.join(puzzles_dir, n + ".pwp"))
        for n in ["simple", "chain", "push_left"]
    ]
    cp = compile_batch(puzzles)
    env = VectorEnv(cp, max_steps=20)

    def random_policy(rng, positions):
        return jax.random.randint(rng, (positions.shape[0],), 0, 4)

    final_state, (rewards, terms) = env.rollout(
        jax.random.PRNGKey(7), random_policy, batch_size=64, horizon=50
    )
    assert rewards.shape == (50, 64)
    # Sanity: rollouts sample multiple distinct puzzles.
    assert len(np.unique(np.asarray(final_state.puzzle_idx))) > 1


# ------------------------------------------------------------------ Gym

def test_gym_env_contract(puzzles_dir):
    gym = pytest.importorskip("gymnasium", reason="gymnasium not installed")
    from pushworld_tpu.envs.gym_env import PushWorldEnv

    env = PushWorldEnv(
        os.path.join(puzzles_dir, "simple.pwp"), max_steps=4, pixels_per_cell=8
    )
    obs, info = env.reset()
    assert env.observation_space.contains(obs)
    assert obs.dtype == np.float32 and obs.min() >= 0.0 and obs.max() <= 1.0
    np.testing.assert_allclose(
        obs, env.render().astype(np.float32) / 255, atol=1e-6
    )

    obs, reward, term, trunc, info = env.step(R)
    assert reward == pytest.approx(-0.01)
    assert not term and not trunc
    obs, reward, term, trunc, info = env.step(R)
    assert reward == pytest.approx(10.0)
    assert term and not trunc
    assert env.render().dtype == np.uint8

    with pytest.raises(ValueError):
        env.step(17)


def test_gym_env_truncation_and_reset_determinism(puzzles_dir):
    pytest.importorskip("gymnasium", reason="gymnasium not installed")
    from pushworld_tpu.envs.gym_env import PushWorldEnv

    env = PushWorldEnv(puzzles_dir, max_steps=2, pixels_per_cell=8)
    env.reset(seed=5)
    seq1 = [env._current_puzzle for _ in range(6) if env.reset() is not None]
    env.reset(seed=5)
    seq2 = [env._current_puzzle for _ in range(6) if env.reset() is not None]
    assert seq1 == seq2
    assert len(set(id(p) for p in seq1)) > 1  # samples multiple puzzles

    obs, _ = env.reset()
    _, _, term, trunc, _ = env.step(U)
    _, _, term, trunc, _ = env.step(D)
    assert trunc or term  # truncated at max_steps (or solved)


# ------------------------------------------------------------------ dm_env

def test_dm_env_contract(puzzles_dir):
    dm_env = pytest.importorskip("dm_env", reason="dm_env not installed")
    from pushworld_tpu.envs.dm_env_impl import PushWorldEnv

    env = PushWorldEnv(
        os.path.join(puzzles_dir, "simple.pwp"), max_steps=4, pixels_per_cell=8
    )
    ts = env.reset()
    assert ts.first()
    env.observation_spec().validate(ts.observation)

    ts = env.step(R)
    assert ts.mid() and ts.reward == pytest.approx(-0.01)
    ts = env.step(R)
    assert ts.last() and ts.reward == pytest.approx(10.0)
    # render returns float32/255 (reference: dm_env.py:244-251).
    assert env.render().dtype == np.float32


def test_greedy_goal_distance_policy_solves_simple(puzzles_dir):
    import jax
    import jax.numpy as jnp

    from pushworld_tpu.envs.policies import make_greedy_policy
    from pushworld_tpu.envs.vector_env import VectorEnv
    from pushworld_tpu.ops.rgd import build_rgd_tables

    puzzle = Puzzle.from_file(os.path.join(puzzles_dir, "simple.pwp"))
    cp = compile_puzzle(puzzle)
    tables = build_rgd_tables(puzzle, cp)
    env = VectorEnv(cp, max_steps=30)
    policy = make_greedy_policy(cp, tables)

    _, (rewards, terms) = env.rollout(
        jax.random.PRNGKey(3), policy, batch_size=32, horizon=20
    )
    # Greedy goal-distance reaches the 2-step goal quickly in every rollout.
    assert bool(np.asarray(terms).any(axis=0).all())


def test_device_cell_renderer(puzzles_dir):
    import jax.numpy as jnp

    from pushworld_tpu.ops.render import (
        compile_render_tables,
        render_cells_class,
        render_cells_onehot,
        render_cells_rgb,
    )

    p = Puzzle.from_file(os.path.join(puzzles_dir, "multi_goal.pwp"))
    cp = compile_puzzle(p)
    tables = compile_render_tables(p, cp)
    state = jnp.asarray(cp.init_state)
    grid = np.asarray(render_cells_class(tables, state))

    # Border walls, agent, goal object, plain movable, goal outline cells.
    assert grid[0, 0] == 1
    ax, ay = p.initial_state[0]
    assert grid[ay, ax] == 3
    m0x, m0y = p.initial_state[1]
    assert grid[m0y, m0x] == 4
    m1x, m1y = p.initial_state[2]
    assert grid[m1y, m1x] == 4  # multi_goal's m1 is also a goal object
    g1x, g1y = p.goal_state[1]
    assert grid[g1y, g1x] == 6  # unoccupied goal cell shows the goal class

    rgb = np.asarray(render_cells_rgb(tables, state))
    assert rgb.shape == (cp.height, cp.width, 3) and rgb.dtype == np.uint8
    onehot = np.asarray(render_cells_onehot(tables, state))
    assert onehot.shape == (cp.height, cp.width, 6)
    assert onehot[0, 0, 0] == 1.0  # wall channel
    assert onehot[ay, ax, 2] == 1.0  # agent channel
    # Empty cells are all-zero.
    assert onehot[4, 3].sum() == 0 or grid[4, 3] != 0

    # A plain (non-goal) movable renders class 5.
    p2 = Puzzle.from_file(os.path.join(puzzles_dir, "chain.pwp"))
    cp2 = compile_puzzle(p2)
    t2 = compile_render_tables(p2, cp2)
    g2 = np.asarray(render_cells_class(t2, jnp.asarray(cp2.init_state)))
    mx, my = p2.initial_state[2]
    assert g2[my, mx] == 5


def test_batched_onehot_renderer_matches_scalar(puzzles_dir):
    """The matmul-based batched renderer must agree with the scatter-based
    scalar renderer on every reachable state it is given (differential
    test over random rollouts, several fixtures incl. agent-wall and
    multi-goal content)."""
    import jax
    import jax.numpy as jnp

    from pushworld_tpu.envs.vector_env import VectorEnv
    from pushworld_tpu.ops.render import (
        compile_render_tables,
        render_cells_onehot,
        render_cells_onehot_batched,
    )

    for name in ["multi_goal", "chain", "heur/two_tools", "agent_wall"]:
        path = os.path.join(puzzles_dir, name + ".pwp")
        if not os.path.exists(path):
            continue
        p = Puzzle.from_file(path)
        cp = compile_puzzle(p)
        tables = compile_render_tables(p, cp)
        env = VectorEnv(cp, max_steps=None)
        rng = jax.random.PRNGKey(7)
        st = env.reset(rng, 16)
        for i in range(5):
            rng, k = jax.random.split(rng)
            actions = jax.random.randint(k, (16,), 0, 4)
            st, pos, _, _, _ = env.step(st, actions)
            batched = np.asarray(render_cells_onehot_batched(tables, pos))
            scalar = np.asarray(
                jax.vmap(lambda s: render_cells_onehot(tables, s))(pos)
            )
            np.testing.assert_array_equal(batched, scalar, err_msg=(name, i))
