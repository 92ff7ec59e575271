#!/usr/bin/env python
"""Headline benchmark for pushworld-tpu.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Current headline: batched PushWorld dynamics throughput (environment steps/s)
on one chip, measured on real benchmark puzzles, vs the single-threaded host
reference implementation of the same transition function (the reference
Python stack's architecture — one state, one step at a time; reference:
python3/src/pushworld/puzzle.py:348-394).

Once the batched planner lands, the headline switches to puzzles-solved/s
within the 1-minute budget (BASELINE.md north star).
"""

import json
import os
import sys
import time

import numpy as np


def _benchmark_puzzles(max_count=16):
    from pushworld_tpu import config
    from pushworld_tpu.core.puzzle import Puzzle
    from pushworld_tpu.utils.filesystem import iter_files_with_extension

    paths = list(
        iter_files_with_extension(
            os.path.join(config.BENCHMARK_PUZZLES_PATH, "level1"), ".pwp"
        )
    )[:max_count]
    if not paths:
        raise RuntimeError("benchmark puzzles not found")
    return [Puzzle.from_file(p) for p in paths]


def host_baseline_steps_per_s(puzzle, seconds=2.0):
    """Single-threaded, one-state-at-a-time transition throughput (the
    reference architecture's per-step cost, measured on our exact host
    oracle which mirrors it)."""
    rng = np.random.RandomState(0)
    state = puzzle.initial_state
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        for a in rng.randint(0, 4, size=256):
            state = puzzle.get_next_state(state, int(a))
        n += 256
    return n / (time.perf_counter() - t0)


def device_steps_per_s(puzzles, batch_per_puzzle=512, horizon=256):
    import jax
    import jax.numpy as jnp

    from pushworld_tpu.core.compiled import compile_batch
    from pushworld_tpu.ops.step import step

    cp = compile_batch(puzzles)
    P = len(puzzles)
    B = batch_per_puzzle

    # (P, B, N, 2) states; scan a horizon of random actions, fully on device.
    step_pb = jax.vmap(jax.vmap(step, in_axes=(None, 0, 0)), in_axes=(0, 0, 0))

    @jax.jit
    def rollout(states, rng):
        def body(carry, step_rng):
            states = carry
            actions = jax.random.randint(step_rng, (P, B), 0, 4)
            return step_pb(cp, states, actions), None

        rngs = jax.random.split(rng, horizon)
        final, _ = jax.lax.scan(body, states, rngs)
        return final

    states0 = jnp.broadcast_to(
        jnp.asarray(cp.init_state)[:, None], (P, B) + cp.init_state.shape[1:]
    )
    # Warm up / compile.
    out = rollout(states0, jax.random.PRNGKey(0))
    out.block_until_ready()

    t0 = time.perf_counter()
    iters = 4
    for i in range(iters):
        out = rollout(out, jax.random.PRNGKey(i + 1))
    out.block_until_ready()
    dt = time.perf_counter() - t0
    return iters * horizon * P * B / dt


def main():
    puzzles = _benchmark_puzzles()
    value = device_steps_per_s(puzzles)
    baseline = host_baseline_steps_per_s(puzzles[0])
    print(
        json.dumps(
            {
                "metric": "env_steps_per_s_per_chip",
                "value": round(value, 1),
                "unit": "steps/s",
                "vs_baseline": round(value / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
