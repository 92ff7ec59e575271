"""Cross-chip frontier sharding: ONE puzzle's search spread over a mesh.

The puzzle-sharded group solver (parallel/sharded.py) parallelizes over
independent puzzles; a level-4-scale instance can still use only one chip.
This module shards a SINGLE search across the mesh in the classic
hash-distributed search style (HDA*-family): the fingerprint space is
partitioned by ``lo % n_shards``, and every state lives on exactly one
owner shard —

  - each shard keeps its own ring frontier, visited hash set, novelty
    tables, and history arena (disjoint state ownership means dedup needs
    no global structure at all);
  - each iteration, every shard expands its local best ``expand`` states
    (hardware approx top-k), fingerprints the children, and routes each
    child to its owner with ONE ``all_to_all`` per payload array.  Send
    buckets are sized 4*expand (the total child count), so routing can
    NEVER drop a child regardless of how skewed the ownership split is —
    an eviction-free exhaustion therefore remains a complete no-solution
    proof, exactly as in the single-chip planner;
  - history parent references are GLOBAL ids ``shard * capacity + index``,
    so the host reconstructs plans by walking refs across the per-shard
    history arenas;
  - the chunk loop's stop conditions (solved / global frontier empty) are
    psum-reduced so every shard takes the same branch.

Per-shard novelty tables are a documented deviation from the single-chip
lockstep semantics (each owner scores against its local pair table);
false sharing across shards can only differ in search ORDER, never emit
invalid plans — plan validity is the acceptance bar (reference validates
but never compares plans, benchmark_rgd.py:107-113).

There is no reference counterpart to any of this (the reference is a
single-threaded serial loop, best_first_search.h:72-94); SURVEY §2e names
cross-chip frontier sharding as a first-class new component.
"""

import dataclasses
import time
from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pushworld_tpu.core.compiled import CompiledPuzzle, compile_puzzle
from pushworld_tpu.core.puzzle import Puzzle
from pushworld_tpu.ops.hashset import (
    dedup_batch,
    fingerprint,
    init_hashset,
    probe_and_insert,
)
from pushworld_tpu.ops.novelty import init_novelty, novelty_score_and_update
from pushworld_tpu.ops.rgd import build_rgd_tables, rgd_heuristic
from pushworld_tpu.ops.step import expand_children, is_goal_state
from pushworld_tpu.search.batched import (
    EMPTY,
    SearchConfig,
    _append_frontier,
    _priority,
    _select_frontier,
    required_depth,
)
from pushworld_tpu.search.batched import SearchState


AXIS = "shard"


def _shard_iterate(cp, t, cfg: SearchConfig, s: SearchState, axis: str = AXIS) -> SearchState:
    """One distributed iteration; runs per shard inside shard_map."""
    B, N = cfg.expand, cp.n
    D = jax.lax.psum(1, axis)
    me = jax.lax.axis_index(axis)
    Hcap = cfg.history_capacity
    C = 4 * B  # per-destination bucket: total children, so never dropped

    # 1. local selection + expansion.
    parents, parent_hist, sel_valid, sel_h = _select_frontier(s, B)
    s = jax.tree_util.tree_map(lambda x: x, s)
    import dataclasses as _dc

    s = _dc.replace(s, frontier_h=sel_h)
    actions = jnp.asarray(np.repeat(np.arange(4, dtype=np.int32), B))
    par4 = jnp.tile(parents, (4, 1, 1))
    phist4 = jnp.tile(parent_hist, (4,))
    pvalid4 = jnp.tile(sel_valid, (4,))
    children = expand_children(cp, t.contacts, t.contacts_mask, parents)
    moved4 = jnp.any(children != par4, axis=-1)  # (4B, N)
    effective = jnp.any(moved4, axis=-1) & pvalid4  # (4B,)

    # 2. fingerprint + owner routing.
    lo, hi = fingerprint(children, cp.width)
    owner = (lo % jnp.uint32(D)).astype(jnp.int32)  # (4B,)
    # Parent refs become global BEFORE routing (they index MY history).
    parent_gid = me * Hcap + phist4

    # Sort children by owner; dest d's run is [offsets[d], offsets[d]+counts[d]).
    sort_key = jnp.where(effective, owner, D)  # ineffective children last
    order = jnp.argsort(sort_key)
    counts = jnp.sum(
        (sort_key[None, :] == jnp.arange(D, dtype=jnp.int32)[:, None]),
        axis=1,
        dtype=jnp.int32,
    )  # (D,)
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]]
    )
    take = offsets[:, None] + jnp.arange(C, dtype=jnp.int32)[None, :]  # (D, C)
    in_run = jnp.arange(C, dtype=jnp.int32)[None, :] < counts[:, None]
    take = jnp.clip(take, 0, 4 * B - 1)
    src = order[take]  # (D, C) indices into the unsorted children

    def pick(x, fill):
        v = x[src]
        m = in_run
        if v.ndim > 2:
            m = m.reshape(m.shape + (1,) * (v.ndim - 2))
        return jnp.where(m, v, fill)

    snd_states = pick(children, 0)
    snd_lo = pick(lo, jnp.uint32(0))
    snd_hi = pick(hi, jnp.uint32(0))
    snd_parent = pick(parent_gid, -1)
    snd_action = pick(actions, -1)
    snd_moved = pick(moved4, False)
    snd_valid = in_run

    a2a = lambda x: jax.lax.all_to_all(
        x, axis, split_axis=0, concat_axis=0, tiled=True
    )
    rcv_states = a2a(snd_states).reshape(D * C, N, 2)
    rcv_lo = a2a(snd_lo).reshape(D * C)
    rcv_hi = a2a(snd_hi).reshape(D * C)
    rcv_parent = a2a(snd_parent).reshape(D * C)
    rcv_action = a2a(snd_action).reshape(D * C)
    rcv_moved = a2a(snd_moved).reshape(D * C, N)
    rcv_valid = a2a(snd_valid).reshape(D * C)

    # 3. owner-side dedup + history + goal + scoring + ring append.
    uniq = dedup_batch(rcv_lo, rcv_hi, rcv_valid)
    is_new, visited = probe_and_insert(s.visited, rcv_lo, rcv_hi, uniq)

    offs = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    hist_idx = jnp.where(is_new, s.hist_cursor + offs, 0)
    write_idx = jnp.where(is_new, hist_idx, Hcap - 1)
    hist_parent = s.hist_parent.at[write_idx].set(
        jnp.where(is_new, rcv_parent, s.hist_parent[write_idx])
    )
    hist_action = s.hist_action.at[write_idx].set(
        jnp.where(is_new, rcv_action, s.hist_action[write_idx])
    )
    n_new = jnp.sum(is_new.astype(jnp.int32))
    hist_cursor = jnp.minimum(s.hist_cursor + n_new, Hcap - 8 * B * D)

    goal = jax.vmap(is_goal_state, in_axes=(None, 0))(cp, rcv_states) & is_new
    any_goal_local = jnp.any(goal)
    first_goal = jnp.argmax(goal)
    my_gid = me * Hcap + hist_idx[first_goal]
    # Smallest solving gid wins globally (deterministic across shards).
    cand = jnp.where(any_goal_local, my_gid, jnp.int32(0x7FFFFFFF))
    best = jax.lax.pmin(cand, axis)
    solved_now = best < 0x7FFFFFFF
    solved = s.solved | solved_now
    solved_hist = jnp.where(
        s.solved, s.solved_hist, jnp.where(solved_now, best, 0)
    )

    nov, novelty = novelty_score_and_update(
        s.novelty, rcv_states, rcv_moved, is_new
    )
    rgd = rgd_heuristic(t, rcv_states, max_depth=cfg.max_depth)
    h = _priority(nov, rgd, hist_idx, cfg.use_novelty)
    h = jnp.where(is_new, h, np.int32(EMPTY))

    (
        new_states, new_h, new_hist, new_lo, new_hi, new_cursor, visited,
        n_evicted,
    ) = _append_frontier(s, B, h, rcv_states, hist_idx, rcv_lo, rcv_hi, visited)

    return SearchState(
        frontier_states=new_states,
        frontier_h=new_h,
        frontier_hist=new_hist,
        frontier_lo=new_lo,
        frontier_hi=new_hi,
        ring_cursor=new_cursor,
        hist_parent=hist_parent,
        hist_action=hist_action,
        hist_cursor=hist_cursor,
        visited=visited,
        novelty=novelty,
        solved=solved,
        solved_hist=solved_hist,
        iterations=s.iterations + 1,
        expansions=s.expansions + jnp.sum(sel_valid.astype(jnp.int32)),
        evictions=s.evictions + n_evicted,
        needs_deeper=s.needs_deeper,
    )


def _make_run_chunk(mesh: Mesh, cp, tables, cfg: SearchConfig, chunk: int):
    axis = mesh.axis_names[0]
    state_spec = P(axis)

    def body_fn(cp_, t_, s: SearchState) -> SearchState:
        s = jax.tree_util.tree_map(lambda x: x[0], s)  # drop lead dev axis

        def body(i, s):
            solved_any = jax.lax.pmax(s.solved.astype(jnp.int32), axis) > 0
            gmin = jax.lax.pmin(jnp.min(s.frontier_h), axis)
            # pmax, not pmin: the loop must stop as soon as ANY shard is
            # within one receive window of history capacity — a saturated
            # shard clamps its cursor and would otherwise keep rewriting
            # its last window, corrupting parent refs that children on
            # OTHER shards already hold (matches the single-chip
            # per-iteration gate in search/batched.py).
            hist_ok = (
                jax.lax.pmax(s.hist_cursor, axis)
                < cfg.history_capacity - 8 * cfg.expand * mesh.size
            )
            active = (~solved_any) & (gmin < EMPTY) & hist_ok
            return jax.lax.cond(
                active, lambda s: _shard_iterate(cp_, t_, cfg, s, axis), lambda s: s, s
            )

        s = jax.lax.fori_loop(0, chunk, body, s)
        return jax.tree_util.tree_map(lambda x: x[None], s)

    fn = shard_map(
        body_fn,
        mesh=mesh,
        in_specs=(P(), P(), state_spec),
        out_specs=state_spec,
        # The compact/no-compact cond's branches mix shard-varying and
        # replicated values (the append cursor); skip the varying-manual-
        # axes type check rather than pvary-annotate every branch output.
        check_vma=False,
    )
    return jax.jit(lambda s: fn(cp, tables, s))


# Epoch tag field of a virtual history id: bits 25.. hold (epoch + 1) of
# the referenced entry, 0 = "same epoch as the referencing array" (see the
# history-spill notes in solve_frontier_sharded).  Requires
# n_shards * history_capacity < 2**25 and at most 62 spill epochs.
_EPOCH_SHIFT = 25
_EPOCH_MASK = (1 << _EPOCH_SHIFT) - 1


@jax.jit
def _packed_status(states: "SearchState") -> jax.Array:
    """[any solved, global min frontier key, max hist cursor, total
    evictions] in ONE D2H fetch (each separate scalar readback costs a
    tunnel round-trip on axon — four per chunk dominated the round-4
    level4 probe's wall)."""
    return jnp.stack(
        [
            jnp.max(states.solved.astype(jnp.int32)),
            jnp.min(states.frontier_h),
            jnp.max(states.hist_cursor),
            jnp.sum(states.evictions),
        ]
    )


def solve_frontier_sharded(
    puzzle: Puzzle,
    mesh: Optional[Mesh] = None,
    mode: str = "N+RGD",
    time_limit: Optional[float] = 60.0,
    max_depth: Optional[int] = None,
    expand: int = 64,
    frontier_capacity: int = 1 << 13,
    visited_bits: int = 18,
    history_capacity: int = 1 << 18,
    chunk: int = 16,
    stats_out: Optional[dict] = None,
) -> Optional[List[int]]:
    """Solves ONE puzzle with its frontier sharded across ``mesh``.

    ``stats_out`` (when given) receives run telemetry: spill_epochs,
    chunks, in_budget_wall_s (measured from after the warm chunk).

    ``expand``/``frontier_capacity``/``visited_bits``/``history_capacity``
    are PER SHARD; the effective global expansion width is
    ``mesh.size * expand``.  Returns the plan (validated here against the
    host oracle before returning),
    ``None`` when the distributed search exhausts without evictions (a
    complete no-solution proof — routing is drop-free, see module
    docstring), and raises TimeoutError on budget exhaustion.

    BUDGET DISCIPLINE (round-5): the clock starts after the first chunk
    returns (compile excluded, the fleet's discipline), and a chunk is not
    started unless it can finish before the deadline (estimated by the
    previous chunk's duration) — attempts end within ~one chunk of the
    budget instead of the round-4 probe's 2x overrun.

    HISTORY SPILL (round-5): the history arena is append-only and its
    parent refs are only ever read back on HOST (plan reconstruction), so
    capacity exhaustion no longer ends the attempt: the full arrays are
    snapshotted to host, live frontier refs are re-tagged with their epoch
    (virtual id = (epoch+1) << 25 | shard * Hcap + idx; an untagged ref
    means "same epoch as the array it was read from" — entries only
    reference ancestors, so epochs can never increase along a walk), and
    the device cursor resets.  The search runs until budget with a bounded
    device arena; reconstruction walks the snapshot chain.
    """
    if mesh is None:
        from pushworld_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    D = mesh.size
    if max_depth is None:
        max_depth = required_depth(puzzle)
    if frontier_capacity < 8 * expand * D:
        # A shard's append window holds the RECEIVED candidates:
        # 4*expand children from every one of the D shards.
        raise ValueError(
            f"frontier_capacity ({frontier_capacity}) must be >= "
            f"8*expand*n_shards ({8 * expand * D}) per shard"
        )

    cp = compile_puzzle(puzzle)
    tables = build_rgd_tables(puzzle, cp, max_depth=max_depth)
    cfg = SearchConfig(
        expand=expand,
        history_capacity=history_capacity,
        max_depth=max_depth,
        use_novelty=(mode == "N+RGD"),
    )
    if puzzle.is_goal_state(puzzle.initial_state):
        return []

    # Per-shard initial states: the root lives ONLY on its owner shard.
    init = np.asarray(cp.init_state)
    lo0, hi0 = fingerprint(jnp.asarray(init)[None], cp.width)
    owner0 = int(np.asarray(lo0)[0] % np.uint32(D))

    shard_states = []
    for d in range(D):
        F, N = frontier_capacity, cp.n
        novelty = init_novelty(N, cp.height, cp.width)
        visited = init_hashset(visited_bits)
        fh = jnp.full((F,), EMPTY, jnp.int32)
        fstates = jnp.zeros((F, N, 2), jnp.int32)
        flo = jnp.zeros((F,), jnp.uint32)
        fhi = jnp.zeros((F,), jnp.uint32)
        if d == owner0:
            _, visited = probe_and_insert(visited, lo0, hi0, jnp.ones((1,), bool))
            moved = jnp.ones((1, N), bool) & jnp.asarray(cp.obj_mask)[None]
            nov, novelty = novelty_score_and_update(
                novelty, jnp.asarray(init)[None], moved, jnp.ones((1,), bool)
            )
            h0 = rgd_heuristic(tables, jnp.asarray(init)[None], max_depth=max_depth)
            prio = _priority(nov, h0, jnp.zeros((1,), jnp.int32), cfg.use_novelty)
            fh = fh.at[0].set(prio[0])
            fstates = fstates.at[0].set(jnp.asarray(init))
            flo = flo.at[0].set(lo0[0])
            fhi = fhi.at[0].set(hi0[0])
        shard_states.append(
            SearchState(
                frontier_states=fstates,
                frontier_h=fh,
                frontier_hist=jnp.zeros((F,), jnp.int32),
                frontier_lo=flo,
                frontier_hi=fhi,
                ring_cursor=jnp.int32(1),
                hist_parent=jnp.full((history_capacity,), -1, jnp.int32),
                hist_action=jnp.full((history_capacity,), -1, jnp.int32),
                hist_cursor=jnp.int32(1),
                visited=visited,
                novelty=novelty,
                solved=jnp.asarray(False),
                solved_hist=jnp.int32(0),
                iterations=jnp.int32(0),
                expansions=jnp.int32(0),
                evictions=jnp.int32(0),
                needs_deeper=jnp.int32(0),
            )
        )
    stack = lambda trees: jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)
    states = stack(shard_states)
    sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
    states = jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), states)

    if D * history_capacity >= (1 << _EPOCH_SHIFT):
        raise ValueError(
            f"n_shards * history_capacity ({D * history_capacity}) must fit "
            f"below 2**{_EPOCH_SHIFT} for epoch-tagged history spilling"
        )

    run = _make_run_chunk(mesh, cp, tables, cfg, chunk)

    # Host-side spill chain: snapshots[e] = (hist_parent, hist_action)
    # numpy copies of epoch e; the live device arrays are the current
    # epoch len(snapshots).
    snapshots: List[Tuple[np.ndarray, np.ndarray]] = []
    spill_margin = 8 * expand * D  # matches the in-kernel hist_ok gate

    def spill(states):
        epoch = len(snapshots)
        if epoch >= (1 << (31 - _EPOCH_SHIFT)) - 2:
            raise TimeoutError("sharded history spill epochs exhausted")
        snapshots.append(
            (
                np.array(np.asarray(states.hist_parent)),
                np.array(np.asarray(states.hist_action)),
            )
        )
        # Tag every still-untagged frontier ref with the epoch it belongs
        # to (the one just snapshotted); already-tagged refs keep their
        # older epochs.  The kernel adds me*Hcap to the ref verbatim, so
        # (epoch+1) << 25 | local_idx flows into history parent refs as
        # the correct virtual id.
        fh = states.frontier_hist
        tagged = jnp.where(
            fh < (1 << _EPOCH_SHIFT),
            fh | np.int32((epoch + 1) << _EPOCH_SHIFT),
            fh,
        )
        return dataclasses.replace(
            states,
            frontier_hist=tagged,
            # Cursor back to 1 (slot 0 stays the root/stop sentinel); old
            # entries are overwritten as the new epoch appends — their
            # contents live on in the snapshot.
            hist_cursor=jnp.ones_like(states.hist_cursor),
        )

    # First chunk warms the compiled program; the budget clock starts when
    # it returns (compiles take minutes on the axon toolchain and must not
    # eat the puzzle's budget — same discipline as search/fleet.py).
    states = run(states)
    stat = [int(v) for v in np.asarray(_packed_status(states))]
    t0 = time.monotonic()
    deadline = None if time_limit is None else t0 + time_limit
    last_dur = 0.0
    chunks = 1

    def record_stats():
        if stats_out is not None:
            stats_out.update(
                spill_epochs=len(snapshots),
                chunks=chunks,
                in_budget_wall_s=round(time.monotonic() - t0, 2),
            )

    try:
        while True:
            any_solved, hmin, cur_max, evictions = stat
            if any_solved:
                break
            if hmin >= EMPTY:
                if evictions == 0:
                    return None
                raise TimeoutError("sharded frontier exhausted after evictions")
            if cur_max >= history_capacity - spill_margin:
                states = spill(states)
            # Start a chunk only if it can plausibly finish inside the
            # budget (previous chunk's duration as the estimate): ends the
            # attempt within ~one chunk of the deadline instead of
            # overrunning.
            if deadline is not None and time.monotonic() + last_dur > deadline:
                raise TimeoutError("time budget exhausted")
            c0 = time.monotonic()
            states = run(states)
            stat = [int(v) for v in np.asarray(_packed_status(states))]
            last_dur = time.monotonic() - c0
            chunks += 1
    finally:
        record_stats()

    # Reconstruct across shards/epochs by virtual history ids.  An
    # untagged ref means "same epoch as the array it was read from";
    # entries only reference ancestors, so the epoch context can never
    # increase along the walk.
    live = (
        np.asarray(states.hist_parent),  # (D, Hcap)
        np.asarray(states.hist_action),
    )
    solved_hist = np.asarray(states.solved_hist)
    gid = int(solved_hist[np.argmax(np.asarray(states.solved))])
    # The solve always lands in the CURRENT epoch (the host breaks before
    # any later spill), so the walk starts at the live arrays.
    epoch_ctx = len(snapshots)
    plan: List[int] = []
    # Bounded walk: any ref corruption must fail loudly, never hang.
    for _ in range(history_capacity * D * (len(snapshots) + 1)):
        tag = gid >> _EPOCH_SHIFT
        if tag:
            epoch_ctx = tag - 1
        d, idx = divmod(gid & _EPOCH_MASK, history_capacity)
        parent, action = (
            live if epoch_ctx == len(snapshots) else snapshots[epoch_ctx]
        )
        a = int(action[d, idx])
        if a < 0:
            break
        plan.append(a)
        gid = int(parent[d, idx])
    else:
        raise RuntimeError(
            "sharded plan reconstruction exceeded history capacity "
            "(corrupted parent refs)"
        )
    plan.reverse()
    if not puzzle.is_valid_plan(plan):
        raise RuntimeError("sharded search produced an invalid plan")
    return plan
