"""Batched greedy best-first search on device.

The planner-side replacement for the reference's serial best-first loop
(reference: cpp/include/search/best_first_search.h:45-98): instead of popping
one node from a Fibonacci heap, every iteration

1. selects the ``expand`` lowest-priority frontier states (``lax.top_k``),
2. expands all 4 actions of each with the batched dynamics kernel,
3. fingerprints + deduplicates children against a device hash set,
4. scores new children with batched novelty (lexicographically stacked,
   weight 1e6 — reference: run_planner.cc:48-55) + fewest-tools RGD,
5. merges children into the fixed-capacity frontier by partial sort,

entirely inside one jitted while-loop.  Search *order* therefore differs
from the reference (lockstep novelty, batch expansion), which is permitted:
acceptance is valid plans within budget, not identical plans (reference
validates but never compares plans, benchmark_rgd.py:107-113).

Plans are reconstructed from a device-side history of (parent index, action)
records — the reference re-simulates actions instead (search.cc:25-54).

The while-loop runs in fixed-size chunks so the host can enforce wall-clock
budgets between chunks.
"""

import dataclasses
import time
from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pushworld_tpu.core.compiled import CompiledPuzzle, compile_puzzle
from pushworld_tpu.core.puzzle import Puzzle
from pushworld_tpu.ops.hashset import (
    HashSet,
    dedup_batch,
    fingerprint,
    init_hashset,
    probe_and_insert,
    probe_delete,
)
from pushworld_tpu.ops.novelty import NoveltyTables, init_novelty, novelty_score_and_update
from pushworld_tpu.ops.rgd import (
    FINITE_THRESHOLD,
    RGDTables,
    build_rgd_tables,
    rgd_heuristic,
    rgd_heuristic_with_flags,
)
from pushworld_tpu.ops.step import expand_children, is_goal_state, step

# Frontier priorities are int32 keys: novelty tier (2 bits) | clamped RGD
# value (13 bits) | inverted recency (15 bits).  The recency bits make
# expansion LIFO within equal (novelty, rgd) buckets — the depth-first
# plateau behavior of the reference's bucket priority queue
# (reference: priority_queue.h:43-222, LIFO within equal priority) — which
# batched expansion otherwise loses (breadth-flooding plateaus).
#
# Every key (and the EMPTY sentinel) is a positive int32 below 0x7F800000,
# so its BIT PATTERN is a finite positive float32 and int ordering equals
# float ordering after a bitcast — which lets frontier selection run on the
# TPU's hardware approximate-top-k unit (jax.lax.approx_min_k) with exact
# key semantics and no precision loss.
EMPTY = 0x7F000000  # int32 sentinel for a free frontier slot
NOVELTY_WEIGHT = 1e6  # kept for API parity in docs; priorities use the int key


class _EscalateDepth(Exception):
    """Internal: the search should restart at a deeper RGD pushing depth."""


def _priority(nov, rgd, hist_idx, use_novelty):
    """int32 search key; smaller = expanded earlier."""
    nov_i = nov.astype(jnp.int32) if use_novelty else jnp.ones_like(hist_idx)
    rgd_i = jnp.clip(rgd, 0.0, 8190.0).astype(jnp.int32)
    recency = jnp.bitwise_and(jnp.bitwise_not(hist_idx), np.int32(0x7FFF))
    return (nov_i << np.int32(28)) | (rgd_i << np.int32(15)) | recency


from typing import NamedTuple


class SearchConfig(NamedTuple):
    """Static (compile-time) search configuration.  Puzzles compiled to the
    same bucket shape + config share all jitted search kernels.

    ``lazy``: deferred RGD — the heuristic is evaluated once per SELECTED
    parent (B evaluations) instead of once per generated child (4B), and
    children inherit the parent's RGD in their priority key (novelty stays
    exact per child — its moved mask is only known at generation).  The
    native planner's measured counterpart of this discipline is 1.4-2.1x
    expansions/s (planner.cc lazy mode); on device it removes 3/4 of the
    dominant remaining gather term (the depth-0 cvidx_a/Dflat reads,
    ops/rgd.py:_agent_push_cost)."""

    expand: int = 256
    history_capacity: int = 1 << 20
    max_depth: int = 1
    use_novelty: bool = True
    lazy: bool = False


@dataclass(frozen=True)
class SearchState:
    frontier_states: jax.Array  # (F, N, 2) int32
    frontier_h: jax.Array  # (F,) int32 priority keys (EMPTY = free slot)
    frontier_hist: jax.Array  # (F,) int32
    frontier_lo: jax.Array  # (F,) uint32 — fingerprints (for eviction deletes)
    frontier_hi: jax.Array  # (F,) uint32
    ring_cursor: jax.Array  # int32 scalar — next append window offset
    hist_parent: jax.Array  # (Hcap,) int32
    hist_action: jax.Array  # (Hcap,) int32
    hist_cursor: jax.Array  # int32 scalar
    visited: HashSet
    novelty: NoveltyTables
    solved: jax.Array  # bool scalar
    solved_hist: jax.Array  # int32 scalar
    iterations: jax.Array  # int32 scalar
    expansions: jax.Array  # int32 scalar
    evictions: jax.Array  # int32 scalar — states dropped by the capacity bound
    # Count of scored states whose RGD was INF at the compiled depth although
    # the goal was graph-reachable — deeper pushing could score them (drives
    # the host-side depth escalation; see BatchedPlanner.solve).
    needs_deeper: jax.Array  # int32 scalar


jax.tree_util.register_dataclass(
    SearchState,
    data_fields=[
        "frontier_states",
        "frontier_h",
        "frontier_hist",
        "frontier_lo",
        "frontier_hi",
        "ring_cursor",
        "hist_parent",
        "hist_action",
        "hist_cursor",
        "visited",
        "novelty",
        "solved",
        "solved_hist",
        "iterations",
        "expansions",
        "evictions",
        "needs_deeper",
    ],
    meta_fields=[],
)


@partial(
    jax.jit,
    static_argnames=(
        "cfg",
        "frontier_capacity",
        "visited_bits",
        "history_capacity",
        "solved0",
    ),
)
def _init_state_jit(
    cp,
    t,
    cfg: "SearchConfig",
    frontier_capacity: int,
    visited_bits: int,
    history_capacity: int,
    solved0: bool,
) -> "SearchState":
    F, N = frontier_capacity, cp.n
    init = jnp.asarray(cp.init_state)[None]  # (1, N, 2)

    novelty = init_novelty(N, cp.height, cp.width)
    visited = init_hashset(visited_bits)
    lo, hi = fingerprint(init, cp.width)
    _, visited = probe_and_insert(visited, lo, hi, jnp.ones((1,), bool))

    moved = jnp.ones((1, N), bool) & jnp.asarray(cp.obj_mask)[None]
    nov, novelty = novelty_score_and_update(
        novelty, init, moved, jnp.ones((1,), bool)
    )
    h = rgd_heuristic(t, init, max_depth=cfg.max_depth)
    prio = _priority(nov, h, jnp.zeros((1,), jnp.int32), cfg.use_novelty)

    return SearchState(
        frontier_states=jnp.zeros((F, N, 2), jnp.int32).at[0].set(init[0]),
        frontier_h=jnp.full((F,), EMPTY, jnp.int32).at[0].set(prio[0]),
        frontier_hist=jnp.zeros((F,), jnp.int32),
        frontier_lo=jnp.zeros((F,), jnp.uint32).at[0].set(lo[0]),
        frontier_hi=jnp.zeros((F,), jnp.uint32).at[0].set(hi[0]),
        ring_cursor=jnp.int32(1),  # slot 0 holds the initial state
        hist_parent=jnp.full((history_capacity,), -1, jnp.int32),
        hist_action=jnp.full((history_capacity,), -1, jnp.int32),
        hist_cursor=jnp.int32(1),
        visited=visited,
        novelty=novelty,
        solved=jnp.asarray(solved0),
        solved_hist=jnp.int32(0),
        iterations=jnp.int32(0),
        expansions=jnp.int32(0),
        evictions=jnp.int32(0),
        needs_deeper=jnp.int32(0),
    )


def reconstruct_plan(s: "SearchState") -> List[int]:
    """Backtracks the device-side (parent index, action) history of a solved
    search into the action list (host-side; reads back the history arrays).
    Shared by every driver of the batched search."""
    parent = np.asarray(s.hist_parent)
    action = np.asarray(s.hist_action)
    idx = int(np.asarray(s.solved_hist))
    plan: List[int] = []
    while idx > 0:
        plan.append(int(action[idx]))
        idx = int(parent[idx])
    plan.reverse()
    return plan


@jax.jit
def search_status(s: "SearchState") -> jax.Array:
    """Packs the host-visible search status into ONE int32 vector so the
    between-chunk host sync is a single D2H transfer (each separate scalar
    readback costs a ~25 ms tunnel round-trip on axon; the first readback of
    each distinct program costs seconds).

    Layout: [solved, solved_hist, min_frontier_key, hist_cursor,
             expansions, evictions, iterations, needs_deeper].
    """
    return jnp.stack(
        [
            s.solved.astype(jnp.int32),
            s.solved_hist,
            jnp.min(s.frontier_h),
            s.hist_cursor,
            s.expansions,
            s.evictions,
            s.iterations,
            s.needs_deeper,
        ]
    )


class BatchedPlanner:
    """Device planner for one compiled puzzle.

    Args:
        puzzle: host puzzle (for table construction and plan validation).
        cp: compiled tensors (built if omitted).
        expand: states expanded per iteration.
        frontier_capacity: max frontier size (worst entries are dropped).
        visited_bits: log2 capacity of the visited hash set.
        history_capacity: max states retained for plan reconstruction.
        max_depth: RGD pushing-depth bound (static).
        use_novelty: lexicographic novelty stacking ("N+RGD" vs "RGD").
    """

    def __init__(
        self,
        puzzle: Puzzle,
        cp: Optional[CompiledPuzzle] = None,
        tables: Optional[RGDTables] = None,
        expand: int = 256,
        frontier_capacity: int = 1 << 15,
        visited_bits: int = 20,
        history_capacity: int = 1 << 20,
        max_depth: int = 1,
        use_novelty: bool = True,
        lazy: bool = False,
    ):
        if frontier_capacity < 8 * expand:
            # The compacting ring needs room for at least two append
            # windows so a compaction always leaves space for the next one.
            raise ValueError(
                f"frontier_capacity ({frontier_capacity}) must be >= "
                f"8*expand ({8 * expand})"
            )
        self.puzzle = puzzle
        self.cp = cp if cp is not None else compile_puzzle(puzzle)
        self.tables = (
            tables
            if tables is not None
            else build_rgd_tables(puzzle, self.cp, max_depth=max_depth)
        )
        self.expand = expand
        self.frontier_capacity = frontier_capacity
        self.visited_bits = visited_bits
        self.history_capacity = history_capacity
        self.max_depth = max_depth
        self.use_novelty = use_novelty
        self.lazy = lazy

    # ------------------------------------------------------------------ init

    def init_state(self) -> SearchState:
        # One fused program: op-by-op construction dispatches ~15 tiny
        # programs, each costing seconds of one-time compile latency on the
        # axon platform (measured: 22 s per puzzle).
        return _init_state_jit(
            self.cp,
            self.tables,
            self.config,
            self.frontier_capacity,
            self.visited_bits,
            self.history_capacity,
            bool(self.puzzle.is_goal_state(self.puzzle.initial_state)),
        )

    # ------------------------------------------------------------------- cfg

    @property
    def config(self) -> SearchConfig:
        return SearchConfig(
            expand=self.expand,
            history_capacity=self.history_capacity,
            max_depth=self.max_depth,
            use_novelty=self.use_novelty,
            lazy=self.lazy,
        )

    # ----------------------------------------------------------------- solve

    # Depth escalation is capped to bound recompiles (matches the
    # required_depth cap; deeper instances exist only outside the
    # published benchmark).
    MAX_ESCALATED_DEPTH = 3

    def solve(
        self,
        time_limit: Optional[float] = None,
        max_expansions: Optional[int] = None,
        chunk: int = 128,
        escalate_depth: bool = True,
    ) -> Optional[List[int]]:
        """Searches for a plan.  Returns the action list, None if the search
        space is exhausted (no solution), or raises TimeoutError on budget
        exhaustion.

        DEPTH ESCALATION: the compiled RGD depth is chosen from the initial
        state (:func:`required_depth`), but a searched state can need a
        deeper pushing chain (e.g. a goal object crossing an agent-wall
        region only a tool can reach).  Such states score INF and are
        ordered last — the search stays complete — but when the BEST
        frontier entry is INF-scored (the heuristic has no guidance left)
        and INF states flagged as depth-limited exist, the search restarts
        at depth+1 (reference counterpart: the unbounded ``fewest_tools``
        iteration per state, recursive_graph_distance.cc:101-112).
        """
        deadline = None if time_limit is None else time.monotonic() + time_limit
        while True:
            try:
                return self._solve_at_depth(
                    deadline, max_expansions, chunk, escalate_depth
                )
            except _EscalateDepth:
                self._escalate()

    def _escalate(self) -> None:
        """Rebuilds tables/config one pushing depth deeper (depth-0 tables
        only carry the agent's distance block, so they must be rebuilt)."""
        new_depth = self.max_depth + 1
        if self.max_depth == 0:
            self.tables = build_rgd_tables(
                self.puzzle, self.cp, max_depth=new_depth
            )
        self.max_depth = new_depth

    def _solve_at_depth(
        self,
        deadline: Optional[float],
        max_expansions: Optional[int],
        chunk: int,
        escalate_depth: bool,
    ) -> Optional[List[int]]:
        """One full search at the current compiled depth.

        The chunk loop is PIPELINED: the next chunk is enqueued before the
        previous chunk's status is read back, so the ~25 ms D2H round-trip
        of the axon tunnel overlaps device compute instead of stalling it
        (post-solve/exhaustion chunks are no-ops, see :func:`run_chunk`).
        """
        s = self.init_state()
        if self.puzzle.is_goal_state(self.puzzle.initial_state):
            return []
        cfg = self.config

        s_prev = run_chunk(self.cp, self.tables, cfg, s, chunk)
        stat_prev = search_status(s_prev)
        while True:
            # s_prev is DONATED into s_next; every later read (solve
            # backtrack included) must use s_next — identical contents, the
            # post-solve chunk is a no-op.
            s_next = run_chunk(self.cp, self.tables, cfg, s_prev, chunk)
            stat_next = search_status(s_next)
            stat = np.asarray(stat_prev)  # sync point for chunk k-1
            solved, _, min_key, cursor, expansions, evictions, n_deeper = (
                int(stat[i]) for i in (0, 1, 2, 3, 4, 5, 7)
            )
            if solved:
                s = s_next
                break
            if min_key >= EMPTY:
                # INF-scored states are ordered last but never pruned, so
                # an eviction-free exhaustion is a complete search at ANY
                # depth: truly no solution.
                if evictions == 0:
                    return None
                # Capacity evictions pruned states that cannot be
                # re-generated from an empty frontier: inconclusive.
                raise TimeoutError("frontier exhausted after evictions")
            # Best frontier entry is INF-scored: no heuristic guidance left
            # at this depth, but deeper chains could score flagged states —
            # restart one depth deeper (a guidance fix, not a completeness
            # fix).
            if (
                escalate_depth
                and n_deeper > 0
                and self.max_depth < self.MAX_ESCALATED_DEPTH
                and ((min_key >> 15) & 0x1FFF) >= 8190
            ):
                raise _EscalateDepth
            if deadline is not None and time.monotonic() > deadline:
                raise TimeoutError("time budget exhausted")
            if max_expansions is not None and expansions >= max_expansions:
                raise TimeoutError("expansion budget exhausted")
            if cursor >= self.history_capacity - 8 * self.expand:
                raise TimeoutError("history capacity exhausted")
            s_prev, stat_prev = s_next, stat_next

        return reconstruct_plan(s)


def _append_history(s: SearchState, cfg: SearchConfig, is_new, phist4, actions):
    """Appends the new children's (parent, action) records to the history.

    Returns (hist_parent, hist_action, hist_cursor, hist_idx)."""
    offs = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    hist_idx = jnp.where(is_new, s.hist_cursor + offs, 0)
    write_idx = jnp.where(is_new, hist_idx, cfg.history_capacity - 1)
    hist_parent = s.hist_parent.at[write_idx].set(
        jnp.where(is_new, phist4, s.hist_parent[write_idx])
    )
    hist_action = s.hist_action.at[write_idx].set(
        jnp.where(is_new, actions, s.hist_action[write_idx])
    )
    n_new = jnp.sum(is_new.astype(jnp.int32))
    hist_cursor = jnp.minimum(s.hist_cursor + n_new, cfg.history_capacity - 8)
    return hist_parent, hist_action, hist_cursor, hist_idx


def _append_frontier(s: SearchState, B: int, h, children, hist_idx, lo, hi, visited):
    """Writes the 4B scored children into free space at the append cursor.

    The frontier is a COMPACTING ring: the region at and beyond the cursor
    is always EMPTY (holes before the cursor come only from selection,
    which frees slots), so an append is one contiguous
    ``dynamic_update_slice`` per array and never evicts anything.  When the
    next window would overflow the capacity, ONE sort-compaction gathers
    the valid entries to the front in key order, reclaims every hole, and
    — only if the frontier is genuinely over the keep-bound — drops the
    WORST tail (the previous sorted-merge design paid that full-F gather
    rebuild every iteration; here it amortizes over the ~F/4 appends
    between compactions).  Dropped entries are DELETED from the visited
    set so they can be re-generated later (the reference frontier is
    unbounded; without this, an evicted state on the only path to the goal
    would be lost forever) — and because drops happen only when the
    frontier is truly over capacity, an eviction-free exhaustion remains a
    complete no-solution proof.

    Returns (new_states, new_h, new_hist, new_lo, new_hi, new_cursor,
    visited, n_evicted)."""
    nb = h.shape[0]  # 4B
    F = s.frontier_h.shape[0]
    keep = F - max(nb, F // 4)  # best entries retained by an over-full compact

    def compact(args):
        fh, fstates, fhist, flo, fhi, vis = args
        order = jnp.argsort(fh)  # ascending; EMPTY slots sort last
        fh = fh[order]
        fstates = fstates[order]
        fhist = fhist[order]
        flo = flo[order]
        fhi = fhi[order]
        n_valid = jnp.sum((fh < EMPTY).astype(jnp.int32))
        # Over-capacity tail: worst-first eviction + un-visit.
        drop = (fh < EMPTY) & (jnp.arange(F, dtype=jnp.int32) >= keep)
        vis = probe_delete(vis, flo, fhi, drop)
        fh = jnp.where(drop, np.int32(EMPTY), fh)
        n_evicted = jnp.sum(drop.astype(jnp.int32))
        cursor = jnp.minimum(n_valid, keep).astype(jnp.int32)
        return fh, fstates, fhist, flo, fhi, vis, cursor, n_evicted

    def no_compact(args):
        fh, fstates, fhist, flo, fhi, vis = args
        return (fh, fstates, fhist, flo, fhi, vis, s.ring_cursor,
                jnp.int32(0))

    fh, fstates, fhist, flo, fhi, visited, c, n_evicted = jax.lax.cond(
        s.ring_cursor + nb > F,
        compact,
        no_compact,
        (s.frontier_h, s.frontier_states, s.frontier_hist, s.frontier_lo,
         s.frontier_hi, visited),
    )

    new_h = jax.lax.dynamic_update_slice(fh, h, (c,))
    new_states = jax.lax.dynamic_update_slice(fstates, children, (c, 0, 0))
    new_hist = jax.lax.dynamic_update_slice(fhist, hist_idx, (c,))
    new_lo = jax.lax.dynamic_update_slice(flo, lo, (c,))
    new_hi = jax.lax.dynamic_update_slice(fhi, hi, (c,))
    return new_states, new_h, new_hist, new_lo, new_hi, c + nb, visited, n_evicted


def _select_frontier(s: SearchState, B: int):
    """Picks the B best frontier entries with the TPU's hardware
    approximate-top-k unit (keys bitcast to float32 — exact ordering, see
    the key-layout comment at EMPTY) and frees their slots.

    Returns (parents, parent_hist, sel_valid, frontier_h)."""
    kf = jax.lax.bitcast_convert_type(s.frontier_h, jnp.float32)
    _, idx = jax.lax.approx_min_k(kf, B)
    sel_valid = s.frontier_h[idx] < EMPTY
    parents = s.frontier_states[idx]
    parent_hist = s.frontier_hist[idx]
    frontier_h = s.frontier_h.at[idx].set(
        jnp.where(sel_valid, EMPTY, s.frontier_h[idx])
    )
    return parents, parent_hist, sel_valid, frontier_h


def _iterate(cp, t, cfg: SearchConfig, s: SearchState) -> SearchState:
        B, N = cfg.expand, cp.n
        F = s.frontier_h.shape[0]

        # 1. select the B best frontier entries (hardware approx top-k over
        # the unsorted ring; selected slots are freed).
        parents, parent_hist, sel_valid, sel_frontier_h = _select_frontier(s, B)
        s = dataclasses.replace(s, frontier_h=sel_frontier_h)

        # 2. expand all 4 actions (action-block order, static per-action
        # contact-table slices — no gathers; see ops.step.expand_children).
        actions = jnp.asarray(np.repeat(np.arange(4, dtype=np.int32), B))
        par4 = jnp.tile(parents, (4, 1, 1))  # (4B, N, 2)
        phist4 = jnp.tile(parent_hist, (4,))
        pvalid4 = jnp.tile(sel_valid, (4,))
        children = expand_children(cp, t.contacts, t.contacts_mask, parents)
        moved = jnp.any(children != par4, axis=-1)  # (4B, N)
        effective = jnp.any(moved, axis=-1) & pvalid4  # no-op moves are dups

        # 3. dedup.
        lo, hi = fingerprint(children, cp.width)
        uniq = dedup_batch(lo, hi, effective)
        is_new, visited = probe_and_insert(s.visited, lo, hi, uniq)

        # 4. history append for new children.
        hist_parent, hist_action, hist_cursor, hist_idx = _append_history(
            s, cfg, is_new, phist4, actions
        )

        # 5. goal check (first solved child wins).
        goal = jax.vmap(is_goal_state, in_axes=(None, 0))(cp, children) & is_new
        any_goal = jnp.any(goal)
        first_goal = jnp.argmax(goal)
        solved = s.solved | any_goal
        solved_hist = jnp.where(
            s.solved, s.solved_hist, jnp.where(any_goal, hist_idx[first_goal], 0)
        )

        # 6. score new children.  Novelty is always exact per child (its
        # moved mask exists only at generation); RGD is either exact per
        # child (eager) or inherited from the selected parent (lazy — B
        # evaluations instead of 4B, see SearchConfig.lazy).
        nov, novelty = novelty_score_and_update(s.novelty, children, moved, is_new)
        if cfg.lazy:
            rgd_p, deeper_p = rgd_heuristic_with_flags(
                t, parents, max_depth=cfg.max_depth
            )
            rgd = jnp.tile(rgd_p, (4,))
            deeper_flag = jnp.tile(deeper_p & sel_valid, (4,))
        else:
            rgd, deeper_flag = rgd_heuristic_with_flags(
                t, children, max_depth=cfg.max_depth
            )
        h = _priority(nov, rgd, hist_idx, cfg.use_novelty)
        h = jnp.where(is_new, h, np.int32(EMPTY))
        n_deeper = jnp.sum((deeper_flag & is_new).astype(jnp.int32))

        # 7. append into the ring frontier (age-based eviction).
        (
            new_states,
            new_h,
            new_hist,
            new_lo,
            new_hi,
            new_cursor,
            visited,
            n_evicted,
        ) = _append_frontier(s, B, h, children, hist_idx, lo, hi, visited)
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
            needs_deeper=s.needs_deeper + n_deeper,
        )

@partial(jax.jit, static_argnames=("cfg", "chunk"), donate_argnames=("s",))
def run_chunk(cp, tables, cfg: SearchConfig, s: SearchState, chunk: int = 32) -> SearchState:
    """Runs up to ``chunk`` iterations (solve/exhaustion turn the remaining
    iterations into no-ops).

    The carried state ``s`` is DONATED: XLA aliases the output buffers onto
    the input's, so a deeply pipelined chunk queue (search/fleet.py keeps
    several chunks in flight per lane) holds ONE resident SearchState per
    lane instead of one per queued chunk (~70 MB each at the default
    capacities).  Callers must not reuse ``s`` after passing it here — read
    status/history from the RETURNED state (bit-identical once the chunk
    no-ops).

    The trip count is FIXED: on the axon TPU platform a ``while_loop`` whose
    condition depends on carried data costs ~19 ms per iteration (vs ~10 us
    with a counter-only bound — measured; the trip decision appears to leave
    the device).  The stop conditions are instead evaluated on device inside
    the body, gating the iteration through ``lax.cond``; results are
    bit-identical to the data-dependent while_loop."""

    def body(i, s):
        active = (
            (~s.solved)
            & (jnp.min(s.frontier_h) < EMPTY)
            & (s.hist_cursor < cfg.history_capacity - 8 * cfg.expand)
        )
        return jax.lax.cond(
            active, lambda s: _iterate(cp, tables, cfg, s), lambda s: s, s
        )

    s = jax.lax.fori_loop(0, chunk, body, s)
    return s


def solve_batched(
    puzzle: Puzzle,
    mode: str = "N+RGD",
    time_limit: Optional[float] = None,
    max_depth: Optional[int] = None,
    **kwargs,
) -> Optional[List[int]]:
    """One-call batched solve.  ``max_depth`` defaults to the fewest-tools
    depth needed at the initial state (computed with the host oracle)."""
    if max_depth is None:
        max_depth = required_depth(puzzle)
    planner = BatchedPlanner(
        puzzle, max_depth=max_depth, use_novelty=(mode == "N+RGD"), **kwargs
    )
    return planner.solve(time_limit=time_limit)


def required_depth(puzzle: Puzzle, cap: int = 3) -> int:
    """Fewest-tools pushing depth needed at the initial state (host oracle),
    capped; used to pick the static depth of the batched heuristic.

    The cap bounds compile cost (the depth-d trace grows ~4N^2 tool-push
    evaluations per goal per depth); depth-3 covers every published
    benchmark instance whose initial state needs three tools."""
    from pushworld_tpu.search.heuristics_host import RecursiveGraphDistance

    rgd = RecursiveGraphDistance(puzzle, fewest_tools=True)
    state = puzzle.initial_state
    worst = 0
    for k in range(puzzle.num_goals):
        for depth in range(cap + 1):
            c = rgd._goal_cost(state, k + 1, puzzle.goal_state[k], depth)
            if c != float("inf"):
                worst = max(worst, depth)
                break
        else:
            return cap
    return worst
