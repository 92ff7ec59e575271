"""Vectorized-environment throughput measurement.

The reference RL path steps ONE environment at a time and re-renders the
full observation image on host every step (reference:
python3/src/pushworld/gym_env.py:188-226, utils/env_utils.py:44-91) — the
hot loop of its call stack §3.3.  The TPU-native replacement advances B
rollouts in lockstep under one jitted ``lax.scan`` with observations
rendered on device (:mod:`pushworld_tpu.ops.render`), so the whole
(step, render, reward) pipeline runs from HBM with no host round-trips.

:func:`measure_env_throughput` reports environment steps/s/chip plus an
HBM-roofline estimate (the loop is memory-bound: the observation write
dominates bytes moved), and optionally the reference-style host loop's
steps/s on the same puzzle for comparison.
"""

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pushworld_tpu.core.compiled import compile_puzzle
from pushworld_tpu.core.puzzle import Puzzle
from pushworld_tpu.envs.vector_env import VectorEnv
from pushworld_tpu.ops.render import (
    NUM_CHANNELS,
    compile_render_tables,
    render_cells_onehot_batched,
)

# Published HBM bandwidth per chip, bytes/s (TPU v5e: 819 GB/s).
HBM_BYTES_PER_S = {"tpu v5 lite": 819e9, "tpu v5e": 819e9}
HBM_DEFAULT = 819e9


def _device_hbm_bw() -> float:
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return HBM_DEFAULT
    for k, bw in HBM_BYTES_PER_S.items():
        if k in kind:
            return bw
    return HBM_DEFAULT


def measure_env_throughput(
    puzzle: Puzzle,
    batch_size: int = 4096,
    horizon: int = 256,
    observations: bool = True,
    reps: int = 3,
    host_baseline_steps: int = 200,
    seed: int = 0,
) -> Dict[str, float]:
    """Measures batched env steps/s on the default JAX device.

    Runs ``reps`` jitted rollouts of ``horizon`` steps × ``batch_size``
    lockstep rollouts with a uniform-random policy; when ``observations``
    is set, every step also renders the one-hot observation tensor on
    device and folds it into a running statistic (so the render cannot be
    dead-code-eliminated).  Returns a dict with:

    - ``steps_per_s``: env steps (B × horizon) per wall second, best rep;
    - ``obs_bytes_per_step``: estimated HBM bytes written per env step
      (the observation tensor; zero when observations are off);
    - ``hbm_roofline_pct``: observed obs write traffic as % of the chip's
      published HBM bandwidth (a lower bound on attained bandwidth — reads
      of state/render tables add more traffic);
    - ``host_steps_per_s``: the reference-style host loop (Python
      ``get_next_state`` + full host render per step) on the same puzzle,
      when ``host_baseline_steps`` > 0.
    """
    cp = compile_puzzle(puzzle)
    tables = compile_render_tables(puzzle, cp)
    tables = {k: jnp.asarray(v) for k, v in tables.items()}
    env = VectorEnv(cp, max_steps=None)
    H, W = cp.height, cp.width

    @jax.jit
    def run(rng):
        def body(carry, step_rng):
            env_state, acc = carry
            actions = jax.random.randint(step_rng, (batch_size,), 0, 4)
            env_state, next_pos, reward, _, _ = env.step(env_state, actions)
            if observations:
                # Batched matmul renderer: the vmapped scatter renderer
                # serialized per state and dominated the step (round-5
                # rewrite; see ops/render.py).
                obs = render_cells_onehot_batched(tables, next_pos)
                # Full reduction: consumes every observation element so the
                # render cannot be dead-code-eliminated.
                acc = acc + obs.sum() + reward.sum()
            else:
                acc = acc + reward.sum()
            return (env_state, acc), None

        st = env.reset(rng, batch_size)
        (st, acc), _ = jax.lax.scan(
            body, (st, jnp.float32(0.0)), jax.random.split(rng, horizon)
        )
        return acc

    rng = jax.random.PRNGKey(seed)
    jax.block_until_ready(run(rng))  # compile + first run
    best = float("inf")
    for r in range(reps):
        t0 = time.monotonic()
        jax.block_until_ready(run(jax.random.PRNGKey(seed + 1 + r)))
        best = min(best, time.monotonic() - t0)

    steps_per_s = batch_size * horizon / best
    obs_bytes = H * W * NUM_CHANNELS * 4 if observations else 0
    roofline_pct = 100.0 * steps_per_s * obs_bytes / _device_hbm_bw()

    out = {
        "steps_per_s": round(steps_per_s),
        "batch_size": batch_size,
        "horizon": horizon,
        "grid": [H, W],
        "obs_bytes_per_step": obs_bytes,
        "hbm_roofline_pct": round(roofline_pct, 2),
    }

    if host_baseline_steps:
        out["host_steps_per_s"] = round(
            _host_loop_steps_per_s(puzzle, host_baseline_steps)
        )
    return out


def _host_loop_steps_per_s(puzzle: Puzzle, steps: int) -> float:
    """Reference-style loop: host dynamics + full host render per step
    (the work `gym_env.PushWorldEnv.step` does per call, reference:
    gym_env.py:188-226)."""
    rng = np.random.default_rng(0)
    state = puzzle.initial_state
    t0 = time.monotonic()
    for _ in range(steps):
        state = puzzle.get_next_state(state, int(rng.integers(0, 4)))
        puzzle.render(state)
        if puzzle.is_goal_state(state):
            state = puzzle.initial_state
    return steps / (time.monotonic() - t0)
