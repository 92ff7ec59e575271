"""Puzzle-sharded SPMD planning: one batched search per device, in lockstep
chunks.

Independent puzzles are the embarrassingly-parallel axis of the benchmark
(the reference runs planner subprocesses sequentially,
benchmark_rgd.py:70-84).  Here a group of G puzzles — all compiled to one
bucket shape — is stacked along a leading axis, sharded over the mesh's
'puzzle' axis, and the per-puzzle batched search iterates under a single
``jit`` as a vmapped while-loop: every device advances its own search; the
host polls the (tiny) solved/active flags between chunks to enforce budgets.
Lanes that finish early keep their results sticky (solved flag and history
prefix are immutable once set) while the remaining lanes continue.
"""

import time
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from pushworld_tpu.core.compiled import compile_puzzle
from pushworld_tpu.core.puzzle import Puzzle
from pushworld_tpu.ops.rgd import build_rgd_tables
from pushworld_tpu.search.batched import (
    EMPTY,
    BatchedPlanner,
    SearchConfig,
    SearchState,
    _iterate,
)
from pushworld_tpu.search.planner import PlanResult, _pad, _CMAX_LADDER


@partial(jax.jit, static_argnames=("cfg", "chunk"))
def _run_chunk_group(cps, tables, cfg: SearchConfig, states, chunk: int = 16):
    """Advances every lane of a stacked search state by up to ``chunk``
    iterations (lanes whose search is finished are effectively frozen:
    solved/history prefixes are sticky)."""

    def one(cp, t, s):
        # Fixed trip count with a cond-gated body: a data-dependent
        # while_loop condition costs ~19 ms/iteration on the axon TPU
        # platform (see search/batched.py run_chunk).
        def body(i, s):
            active = (
                (~s.solved)
                & (jnp.min(s.frontier_h) < EMPTY)
                & (s.hist_cursor < cfg.history_capacity - 8 * cfg.expand)
            )
            return jax.lax.cond(
                active, lambda s: _iterate(cp, t, cfg, s), lambda s: s, s
            )

        return jax.lax.fori_loop(0, chunk, body, s)

    return jax.vmap(one)(cps, tables, states)


def solve_group(
    named_puzzles: Sequence[Tuple[str, Puzzle]],
    mesh: Optional[Mesh] = None,
    mode: str = "N+RGD",
    time_limit: Optional[float] = 60.0,
    max_depth: int = 1,
    expand: int = 128,
    frontier_capacity: int = 1 << 14,
    visited_bits: int = 19,
    history_capacity: int = 1 << 19,
    chunk: int = 16,
    pad_group_to: Optional[int] = None,
) -> Dict[str, PlanResult]:
    """Solves a group of puzzles concurrently, sharded over ``mesh``.

    All puzzles are padded to one common bucket shape drawn from the same
    two-profile ladder the per-puzzle planner uses (a fresh exact shape per
    group would recompile the kernels for every distinct group composition
    — minutes on the TPU toolchain).  The group is padded to
    ``pad_group_to`` lanes (and to a multiple of the mesh size) by
    replicating the last puzzle (padding lanes are discarded), so repeated
    calls with the same lane count reuse one compiled program.
    """
    if mesh is None:
        from pushworld_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    n_dev = int(np.prod(mesh.devices.shape))

    names = [n for n, _ in named_puzzles]
    puzzles = [p for _, p in named_puzzles]
    G = len(puzzles)
    lanes = max(G, pad_group_to or 0)
    lanes += (-lanes) % n_dev
    padded = puzzles + [puzzles[-1]] * (lanes - G)

    # One ladder profile covering the group (shared with the per-puzzle
    # planner's buckets, so kernels are reused across groups).
    from pushworld_tpu.core.compiled import compute_delta
    from pushworld_tpu.search.planner import _profile_for

    N, dim, delta, _ = _profile_for(
        max(p.num_movables for p in padded),
        max(max(p.height, p.width) for p in padded),
        max(compute_delta(p) for p in padded),
    )
    H = W = dim
    cps = [compile_puzzle(p, N, H, W, delta) for p in padded]
    cmax_req = max(
        int(np.asarray(cp.push).reshape(4, N, N, -1).sum(-1).max()) for cp in cps
    )
    cmax = _pad(_CMAX_LADDER, max(1, cmax_req))
    from pushworld_tpu.search.planner import _CMAX_AGENT_LADDER

    cagent_req = max(
        int(np.asarray(cp.push).reshape(4, N, N, -1).sum(-1)[:, 0, :].max())
        for cp in cps
    )
    cagent = _pad(_CMAX_AGENT_LADDER, max(1, cagent_req))
    # Fixed-ladder goal pad: keeps the compiled shape independent of the
    # dynamic group composition (shared with the per-puzzle planner buckets).
    from pushworld_tpu.search.planner import _GOALS_LADDER

    goals = _pad(_GOALS_LADDER, max(p.num_goals for p in padded))
    from pushworld_tpu.ops.rgd import dflat_required
    from pushworld_tpu.search.planner import _DFLAT_LADDER

    dflat = _pad(
        _DFLAT_LADDER,
        max(dflat_required(p, cp, max_depth) for p, cp in zip(padded, cps)),
    )
    tables = [
        build_rgd_tables(
            p, cp, cmax_pad=cmax, max_goals=goals, max_depth=max_depth,
            dflat_cap=dflat, cmax_agent_pad=cagent,
        )
        for p, cp in zip(padded, cps)
    ]

    cfg = SearchConfig(
        expand=expand,
        history_capacity=history_capacity,
        max_depth=max_depth,
        use_novelty=(mode == "N+RGD"),
    )
    planners = [
        BatchedPlanner(
            p,
            cp=cp,
            tables=t,
            expand=expand,
            frontier_capacity=frontier_capacity,
            visited_bits=visited_bits,
            history_capacity=history_capacity,
            max_depth=max_depth,
            use_novelty=cfg.use_novelty,
        )
        for p, cp, t in zip(padded, cps, tables)
    ]
    states = [pl.init_state() for pl in planners]

    stack = lambda trees: jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)
    cps_s = stack(cps)
    tables_s = stack(tables)
    states_s = stack(states)

    sharding = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
    put = lambda tree: jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )
    cps_s, tables_s, states_s = put(cps_s), put(tables_s), put(states_s)

    from pushworld_tpu.search.batched import search_status

    status_group = jax.jit(jax.vmap(search_status))

    t0 = time.monotonic()
    deadline = None if time_limit is None else t0 + time_limit
    while True:
        states_s = _run_chunk_group(cps_s, tables_s, cfg, states_s, chunk)
        # One packed (G, 8) readback per chunk: each separate scalar/array
        # readback costs a ~25 ms tunnel round-trip on the axon platform.
        stat = np.asarray(status_group(states_s))
        solved = stat[:, 0].astype(bool)
        h_min = stat[:, 2]
        cursors = stat[:, 3]
        exhausted = h_min >= EMPTY
        hist_full = cursors >= history_capacity - 8 * expand
        active = ~solved & ~exhausted & ~hist_full
        if not active.any():
            break
        if deadline is not None and time.monotonic() > deadline:
            break

    elapsed = time.monotonic() - t0
    solved = np.asarray(states_s.solved)
    solved_hist = np.asarray(states_s.solved_hist)
    hist_parent = np.asarray(states_s.hist_parent)
    hist_action = np.asarray(states_s.hist_action)
    h_min = np.asarray(jnp.min(states_s.frontier_h, axis=1))

    results: Dict[str, PlanResult] = {}
    for i, name in enumerate(names):
        if puzzles[i].is_goal_state(puzzles[i].initial_state):
            results[name] = PlanResult([], elapsed, None)
            continue
        if solved[i]:
            plan: List[int] = []
            idx = int(solved_hist[i])
            while idx > 0:
                plan.append(int(hist_action[i, idx]))
                idx = int(hist_parent[i, idx])
            plan.reverse()
            if puzzles[i].is_valid_plan(plan):
                results[name] = PlanResult(plan, elapsed, None)
            else:
                results[name] = PlanResult(plan, elapsed, "invalid plan")
        elif h_min[i] >= EMPTY:
            if int(np.asarray(states_s.evictions)[i]) == 0:
                results[name] = PlanResult(None, elapsed, "no solution")
            else:
                results[name] = PlanResult(None, elapsed, "time limit")
        else:
            results[name] = PlanResult(None, elapsed, "time limit")
    return results
