"""Batched Recursive Graph Distance heuristic.

Evaluates the RGD heuristic (reference: cpp/src/heuristics/
recursive_graph_distance.cc:43-252) for a whole batch of states of one
puzzle in lockstep.  The recursion over pusher chains becomes, per pushing
depth, a tensorized min over (pusher, contact offset, pusher-next-direction)
triples using precomputed structures:

- ``E[a, o, y, x]`` — feasible transitions (from :mod:`pushworld_tpu.ops.graphs`),
- ``D[o]`` — all-pairs graph distances per object,
- ``DG[o]`` — distance-to-goal fields for goal objects,
- compacted contact-offset lists per (action, pusher, pushee).

``fewest_tools`` semantics (the planner default, reference:
recursive_graph_distance.cc:101-112) are reproduced per state per goal
object: the cost at the smallest pushing depth with a finite value, trying
depths 0..max_depth.  ``max_depth`` is a static compile-time bound; the
recursion generalizes to any depth via memoized per-(skip set, depth)
pushing-cost tables (:func:`_all_dirs_cost`).  The host oracle in
:mod:`pushworld_tpu.search.heuristics_host` has no depth bound and is the
differential-test reference.
"""

from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pushworld_tpu.core.compiled import CompiledPuzzle
from pushworld_tpu.core.puzzle import Puzzle
INF = 1e9  # plain float: host code must never sync a device scalar
FINITE_THRESHOLD = 1e8

DISPLACEMENTS_NP = np.array([(-1, 0), (1, 0), (0, -1), (0, 1)], np.int32)


@dataclass(frozen=True)
class RGDTables:
    """Precomputed per-puzzle tensors for batched RGD evaluation.

    Graph distances are stored COMPACTLY: each object's all-pairs table is
    restricted to its movement graph's vertex set (cells incident to a
    feasible transition, plus the initial cell — every cell the heuristic
    ever gathers a distance for, see :func:`host_vertex_mask`) and packed
    row-major into one flat buffer.  At the large bucket profile this cuts
    the per-puzzle table from ~393 MB (dense (N, HW, HW) at the PADDED grid)
    to the intrinsic graph size (typically <= ~17 MB on the published
    benchmark).  Reference analog: the lazy per-position ``PathDistances``
    objects (domain_transition_graph.cc:266-300) never materialize all
    HW^2 pairs either.
    """

    E: jax.Array  # bool (4, N, H, W)
    Dflat: jax.Array  # uint16 (cap,) packed per-object R_o x R_o blocks (65535 = INF)
    vidx: jax.Array  # int32 (rows, HW) flat cell -> compact vertex index, -1 = not a vertex
    doff: jax.Array  # int32 (rows,) start offset of object o's block in Dflat
    dstride: jax.Array  # int32 (rows,) R_o (row stride of object o's block)
    DG: jax.Array  # f32 (N, H, W) distance-to-goal fields (goal rows only)
    contacts: jax.Array  # int16 (4, N, N, C, 2) rel offsets (rx, ry)
    contacts_mask: jax.Array  # bool (4, N, N, C)
    # Agent-row (pusher = 0) contacts compacted to their own, much smaller
    # pad: the depth-0 pushing cost (the hot path of every heuristic call)
    # only ever gathers agent contacts, and the agent's contact lists are
    # 4-16x shorter than the bucket-wide pairwise max on the published
    # benchmark — padding them to the pairwise cap made the depth-0 gather
    # volume (B x goals x C x 4) dominate the whole search iteration.
    contacts_a: jax.Array  # int16 (4, N, Ca, 2)
    contacts_a_mask: jax.Array  # bool (4, N, Ca)
    # Fused depth-0 contact table: cvidx_a[a, o, p_flat, c] is the AGENT
    # graph's compact vertex index of contact cell p + contacts_a[a, o, c]
    # when the agent can feasibly push there (E[a, agent] holds and the
    # contact is in bounds), else -1.  Folds the e-gather, bounds masking
    # and vidx gather of the depth-0 pushing cost into ONE gather, leaving
    # exactly two gathers (cvidx_a, Dflat) per (state, contact) on the
    # hottest path of the batched search.
    cvidx_a: jax.Array  # int16 (4, N, HW, Ca) — vertex ids < HW <= 32767
    goal_pos: jax.Array  # int32 (N, 2)
    goal_mask: jax.Array  # bool (N,)
    n_real: jax.Array  # int32 scalar — actual number of movables
    # static (bucket-shape metadata; shared across puzzles in a bucket)
    n: int
    max_goals: int
    height: int
    width: int
    cmax: int
    cmax_agent: int


jax.tree_util.register_dataclass(
    RGDTables,
    data_fields=[
        "E", "Dflat", "vidx", "doff", "dstride", "DG", "contacts",
        "contacts_mask", "contacts_a", "contacts_a_mask", "cvidx_a",
        "goal_pos", "goal_mask", "n_real",
    ],
    meta_fields=["n", "max_goals", "height", "width", "cmax", "cmax_agent"],
)


def _movement_graphs_host(puzzle: Puzzle, cp: CompiledPuzzle) -> np.ndarray:
    """E (4, N, H, W) bool via the native fixpoint (Python worklist
    fallback when the native library is unavailable)."""
    N = cp.n
    n = puzzle.num_movables
    E = np.zeros((4, N, cp.height, cp.width), bool)
    try:
        from pushworld_tpu.native import bridge

        E[:, :n] = bridge.build_graphs_native(puzzle, cp).astype(bool)
        return E
    except Exception:
        from pushworld_tpu.search.heuristics_host import MovementGraphs

        graphs = MovementGraphs(puzzle, cp)
        disp = [(-1, 0), (1, 0), (0, -1), (0, 1)]
        for o, edges in enumerate(graphs.edges):
            for p, succs in edges.items():
                for q in succs:
                    a = disp.index((q[0] - p[0], q[1] - p[1]))
                    E[a, o, p[1], p[0]] = True
        return E


def dflat_required(
    puzzle: Puzzle, cp: CompiledPuzzle, max_depth: Optional[int] = None
) -> int:
    """Packed-distance-buffer entries :func:`build_rgd_tables` will need
    (sum of R_o^2 over built objects) — used by bucket grouping to pick a
    shared ``dflat_cap`` before building tables."""
    from pushworld_tpu.ops.graphs import host_vertex_mask

    E_np = _movement_graphs_host(puzzle, cp)
    n_built = 1 if max_depth == 0 else min(cp.n, puzzle.num_movables)
    total = 0
    for o in range(n_built):
        init = puzzle.initial_state[o]
        vm = host_vertex_mask(E_np[:, o], init[1] * cp.width + init[0])
        total += int(vm.sum()) ** 2
    return max(total, 1)


def build_rgd_tables(
    puzzle: Puzzle,
    cp: CompiledPuzzle,
    cmax_pad: Optional[int] = None,
    max_goals: Optional[int] = None,
    max_depth: Optional[int] = None,
    dflat_cap: Optional[int] = None,
    cmax_agent_pad: Optional[int] = None,
) -> RGDTables:
    """Builds all precomputed tensors (one-time per puzzle).

    ``cmax_pad`` / ``max_goals`` / ``dflat_cap`` pad the contact lists, goal
    loop bound and packed distance buffer to bucket-wide values so puzzles
    in one bucket share compiled kernels.

    ``max_depth`` (when given) bounds the pushing depth the tables will be
    used at: depth 0 only ever gathers the AGENT's distances (the gathers
    on tool rows exist only in the depth >= 1 trace), so only the agent's
    compact block is built.  Rows for bucket-padding objects (>= n_real)
    have empty vertex sets and gather INF always (they are never gathered
    with finite contacts anyway)."""
    N, H, W = cp.n, cp.height, cp.width
    HW = H * W
    if HW > np.iinfo(np.int16).max:
        # cvidx_a narrows vertex ids to int16 (ids < HW); a larger grid
        # would silently wrap them into wrong heuristic values.  The
        # benchmark max is 47x54 (SURVEY §6) — far below this cap.
        raise ValueError(
            f"grid H*W={HW} exceeds int16 vertex-id capacity "
            f"({np.iinfo(np.int16).max}); cvidx_a would overflow"
        )

    # One-time precompute runs entirely on host: the native C worklist for
    # the movement-graph fixpoint and C BFS for distances.  The device
    # kernels (ops/graphs.py) compute identical results (differentially
    # tested) but compile pathologically slowly on some TPU toolchains.
    from pushworld_tpu.ops.graphs import (
        host_distance_to_targets,
        host_graph_distances_compact,
        host_vertex_mask,
    )

    # Compact per-object distance blocks (uint16; 65535 encodes infinity).
    n_rows = 1 if max_depth == 0 else N
    n_built = 1 if max_depth == 0 else min(N, puzzle.num_movables)
    E_np = _movement_graphs_host(puzzle, cp)
    vidx = np.full((n_rows, HW), -1, np.int32)
    doff = np.zeros((n_rows,), np.int32)
    dstride = np.zeros((n_rows,), np.int32)
    blocks = []
    off = 0
    for o in range(n_built):
        init = puzzle.initial_state[o]
        vm = host_vertex_mask(E_np[:, o], init[1] * W + init[0])
        verts = np.nonzero(vm)[0]
        R = len(verts)
        vidx[o, verts] = np.arange(R, dtype=np.int32)
        doff[o] = off
        dstride[o] = R
        Dc = host_graph_distances_compact(E_np[:, o], verts)
        blocks.append(
            np.where(Dc >= FINITE_THRESHOLD, 65535, Dc).astype(np.uint16).reshape(-1)
        )
        off += R * R
    cap = dflat_cap if dflat_cap is not None else max(off, 1)
    if cap < off:
        raise ValueError(f"dflat_cap={cap} < required {off}")
    Dflat_np = np.full((cap,), 65535, np.uint16)
    if off:
        Dflat_np[:off] = np.concatenate(blocks)
    Dflat = jnp.asarray(Dflat_np)

    DG_list = []
    for o in range(N):
        k = o - 1
        if 0 <= k < puzzle.num_goals:
            g = puzzle.goal_state[k]
            DG_list.append(host_distance_to_targets(E_np[:, o], g[1] * W + g[0]))
        else:
            DG_list.append(np.full((H, W), float(INF), np.float32))
    DG = jnp.asarray(np.stack(DG_list))
    E = jnp.asarray(E_np)

    # Compact contact offsets from the dense push tables.
    push = np.asarray(cp.push)  # (4, pusher, pushee, K, K)
    delta = cp.delta
    counts = push.reshape(4, N, N, -1).sum(-1)
    cmax = max(1, int(counts.max()))
    if cmax_pad is not None:
        if cmax_pad < cmax:
            raise ValueError(f"cmax_pad={cmax_pad} < required {cmax}")
        cmax = cmax_pad
    contacts = np.zeros((4, N, N, cmax, 2), np.int16)
    contacts_mask = np.zeros((4, N, N, cmax), bool)
    for a in range(4):
        for q in range(N):
            for o in range(N):
                ys, xs = np.nonzero(push[a, q, o])
                m = len(ys)
                if m:
                    contacts[a, q, o, :m, 0] = xs - delta
                    contacts[a, q, o, :m, 1] = ys - delta
                    contacts_mask[a, q, o, :m] = True

    # Agent-row contacts under their own (small) pad for the depth-0 path.
    cmax_agent = max(1, int(counts[:, 0, :].max()))
    if cmax_agent_pad is not None:
        if cmax_agent_pad < cmax_agent:
            raise ValueError(
                f"cmax_agent_pad={cmax_agent_pad} < required {cmax_agent}"
            )
        cmax_agent = cmax_agent_pad
    contacts_a = np.zeros((4, N, cmax_agent, 2), np.int16)
    contacts_a_mask = np.zeros((4, N, cmax_agent), bool)
    for a in range(4):
        for o in range(N):
            ys, xs = np.nonzero(push[a, 0, o])
            m = len(ys)
            if m:
                contacts_a[a, o, :m, 0] = xs - delta
                contacts_a[a, o, :m, 1] = ys - delta
                contacts_a_mask[a, o, :m] = True

    # Fused depth-0 contact table (see RGDTables.cvidx_a).  vidx0_e[a] is
    # the agent's vertex index where its transition in direction a is
    # feasible, else -1; shifting it by each contact offset turns the
    # per-contact (E gather + bounds mask + vidx gather) into one table.
    vidx0 = vidx[0].reshape(H, W)
    cvidx_a = np.full((4, N, HW, cmax_agent), -1, np.int16)
    ys_g, xs_g = np.mgrid[0:H, 0:W]
    for a in range(4):
        vidx0_e = np.where(E_np[a, 0], vidx0, -1)  # (H, W)
        for o in range(N):
            for ci in range(cmax_agent):
                if not contacts_a_mask[a, o, ci]:
                    continue
                rx, ry = contacts_a[a, o, ci]
                cy = ys_g + ry
                cx = xs_g + rx
                ok = (cy >= 0) & (cy < H) & (cx >= 0) & (cx < W)
                vals = np.where(
                    ok, vidx0_e[np.clip(cy, 0, H - 1), np.clip(cx, 0, W - 1)], -1
                )
                cvidx_a[a, o, :, ci] = vals.reshape(-1)

    return RGDTables(
        E=E,
        Dflat=Dflat,
        vidx=jnp.asarray(vidx),
        doff=jnp.asarray(doff),
        dstride=jnp.asarray(dstride),
        DG=DG,
        contacts=jnp.asarray(contacts),
        contacts_mask=jnp.asarray(contacts_mask),
        contacts_a=jnp.asarray(contacts_a),
        contacts_a_mask=jnp.asarray(contacts_a_mask),
        cvidx_a=jnp.asarray(cvidx_a),
        goal_pos=jnp.asarray(cp.goal_pos),
        goal_mask=jnp.asarray(cp.goal_mask),
        n_real=np.int32(puzzle.num_movables),
        n=N,
        max_goals=max_goals if max_goals is not None else puzzle.num_goals,
        height=H,
        width=W,
        cmax=cmax,
        cmax_agent=cmax_agent,
    )


def _gather_D(t: RGDTables, q, u_flat, v_flat) -> jax.Array:
    """Graph distance dist(u -> v) in object ``q``'s movement graph, read
    from the compact packed tables.  ``q`` / ``u_flat`` / ``v_flat``
    broadcast together; cells outside the graph's vertex set are INF."""
    iu = t.vidx[q, u_flat]
    iv = t.vidx[q, v_flat]
    ok = (iu >= 0) & (iv >= 0)
    idx = t.doff[q] + jnp.maximum(iu, 0) * t.dstride[q] + jnp.maximum(iv, 0)
    d = t.Dflat[jnp.where(ok, idx, 0)]
    return jnp.where(
        ok & (d != np.uint16(65535)), d.astype(jnp.float32), np.float32(INF)
    )


def _flat(t: RGDTables, pos: jax.Array) -> jax.Array:
    """(..., 2) int position -> flat index y*W + x."""
    return pos[..., 1] * t.width + pos[..., 0]


def _gather_E(t: RGDTables, a, o, pos):
    """E[a, o, pos] with bounds masking.  a/o/pos broadcast together."""
    x = pos[..., 0]
    y = pos[..., 1]
    ok = (x >= 0) & (x < t.width) & (y >= 0) & (y < t.height)
    xc = jnp.clip(x, 0, t.width - 1)
    yc = jnp.clip(y, 0, t.height - 1)
    return t.E[a, o, yc, xc] & ok


def _agent_push_cost(t: RGDTables, states, o, a, p):
    """Depth-0 pushing cost: the agent realizes pushee ``o``'s transition
    p -> p + d_a.  Returns (B,) f32 (includes the +1 push action cost).

    o, a: static ints; p: (B, 2).

    The contact-vertex lookup ``cvidx_a[a, o, p_flat]`` is computed as a
    ONE-HOT MATMUL instead of a (B, Ca) multi-dim gather: XLA lowers such
    table gathers at ~30 ns/element on this platform and the term
    dominated the lazy search iteration (round-4 profile, Caged Key
    Ca=40).  The one-hot position matrix times the f32 table is an exact
    MXU GEMM (vertex ids < 2**15 are f32-exact).  One flat Dflat gather
    per (state, contact) remains.

    The agent graph is symmetric (adjacent valid placements), so
    dist(A -> c) is read as Dflat[row A, col c]; the agent-at-contact case
    falls out of the zero diagonal (the agent's position is always inside
    its own vertex set — the initial cell is included explicitly and search
    only moves along feasible transitions).
    """
    HW = t.width * t.height
    A_flat = _flat(t, states[:, 0, :])  # (B,)
    iA = t.vidx[0, A_flat]  # (B,)
    p_flat = jnp.clip(_flat(t, p), 0, HW - 1)
    P = (
        p_flat[:, None] == jnp.arange(HW, dtype=p_flat.dtype)[None, :]
    ).astype(jnp.float32)  # (B, HW) exact one-hot
    iv_f = jnp.dot(
        P, t.cvidx_a[a, o].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )  # (B, Ca)
    iv = iv_f.astype(jnp.int32)
    ok = (iv >= 0) & (iA >= 0)[:, None]
    idx = t.doff[0] + iA[:, None] * t.dstride[0] + jnp.maximum(iv, 0)
    d = t.Dflat[jnp.where(ok, idx, 0)]
    v = jnp.where(
        ok & (d != np.uint16(65535)), d.astype(jnp.float32), np.float32(INF)
    )
    return 1.0 + jnp.min(v, axis=1)


def _tool_push_cost(t: RGDTables, states, o, a, p, skip_mask, inner_cost_fn):
    """Depth-d (d >= 1) pushing cost: some tool q (not skipped) realizes
    pushee ``o``'s transition p -> p + d_a.

    inner_cost_fn(q_axis_states, a_prime) -> (B, N, 4) costs of realizing
    each candidate pusher q's own first transition Q -> Q + d_{a'} at depth
    d-1 (with o added to the skip set by the caller).

    Returns (B,) f32.
    """
    B = states.shape[0]
    N = t.n
    HW = t.width * t.height
    d_a = DISPLACEMENTS_NP[a]

    Q = states  # (B, N, 2) candidate pusher positions (per object)
    rel = t.contacts[a, :, o]  # (N, C, 2) pusher q at pushee + rel
    mask = t.contacts_mask[a, :, o]  # (N, C)
    c = p[:, None, None, :] + rel[None, :, :, :]  # (B, N, C, 2)
    q_idx = np.arange(N)[None, :, None]
    feasible = _gather_E(t, a, q_idx, c) & mask[None]  # (B, N, C)

    c_flat = jnp.clip(_flat(t, c), 0, HW - 1)  # (B, N, C)
    Q_flat = _flat(t, Q)  # (B, N)

    # Pusher next positions P' = Q + d_{a'} for each direction a'.
    disp = DISPLACEMENTS_NP  # (4, 2)
    P_next = Q[:, :, None, :] + disp[None, None, :, :]  # (B, N, 4, 2)
    next_ok = _gather_E(t, np.arange(4)[None, None, :], np.arange(N)[None, :, None], Q[:, :, None, :])
    # next_ok: (B, N, 4) — E[a', q, Q]: q's transition in direction a' feasible.
    P_next_flat = jnp.clip(_flat(t, P_next), 0, HW - 1)  # (B, N, 4)

    # dist_q(P', c) for every (q, a', contact), from q's compact block;
    # indices: q, P'_flat (B,N,4,1), c_flat (B,N,1,C).
    dist = _gather_D(
        t,
        np.arange(N)[None, :, None, None],
        P_next_flat[:, :, :, None],
        c_flat[:, :, None, :],
    )  # (B, N, 4, C)

    # Simultaneous push: contact == Q and a' == a.
    same_pos = jnp.all(c == Q[:, :, None, :], axis=-1)  # (B, N, C)
    simultaneous = same_pos[:, :, None, :] & (np.arange(4)[None, None, :, None] == a)
    base = jnp.where(simultaneous, 0.0, dist + 1.0)  # (B, N, 4, C)
    base = jnp.where(feasible[:, :, None, :], base, INF)
    base = jnp.where(next_ok[:, :, :, None], base, INF)
    base_min = jnp.min(base, axis=3)  # (B, N, 4) best contact per (q, a')

    inner = inner_cost_fn(Q, None)  # (B, N, 4): cost of q's move in dir a'

    total = base_min + inner  # (B, N, 4)
    # Valid pushers: movables 1..n_real-1, not the pushee, not skipped.
    rng_n = np.arange(N)
    valid_q = (rng_n >= 1) & (rng_n < t.n_real) & (rng_n != o)
    valid_q = valid_q[None, :] & ~skip_mask  # (B, N)
    total = jnp.where(valid_q[:, :, None], total, INF)
    return jnp.min(total, axis=(1, 2))


def _push_cost_all_dirs_depth0(t: RGDTables, states):
    """(B, N, 4): depth-0 cost (agent pushes) of object q's transition
    Q -> Q + d_{a'} for every movable q and direction a', where Q is q's
    position in each state.  Feasibility of the transition itself is NOT
    included (callers mask with E)."""
    B, N = states.shape[0], t.n
    HW = t.width * t.height
    A_flat = _flat(t, states[:, 0, :])  # (B,)
    iA = t.vidx[0, A_flat]  # (B,)

    Q_flat = jnp.clip(_flat(t, states), 0, HW - 1)  # (B, N)
    # Fused table: vertex indices of every (a, pushee, contact) at each
    # pushee position; -1 where pushing is infeasible (see cvidx_a).
    # Read via a ONE-HOT MATMUL per object (exact f32 GEMM on the MXU)
    # instead of a (4, N, B, Ca) multi-dim gather — the same rewrite as
    # _agent_push_cost (gathers at ~30 ns/element dominated the depth>=1
    # inner table).
    Ca = t.cmax_agent
    P = (
        Q_flat[:, :, None] == jnp.arange(HW, dtype=Q_flat.dtype)[None, None, :]
    ).astype(jnp.float32)  # (B, N, HW)
    iv_f = jnp.einsum(
        "bnh,anhc->anbc",
        P,
        t.cvidx_a.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )  # (4, N, B, Ca)
    iv = iv_f.astype(jnp.int32)
    ok = (iv >= 0) & (iA >= 0)[None, None, :, None]
    idx = t.doff[0] + iA[None, None, :, None] * t.dstride[0] + jnp.maximum(iv, 0)
    d = t.Dflat[jnp.where(ok, idx, 0)]
    v = jnp.where(
        ok & (d != np.uint16(65535)), d.astype(jnp.float32), np.float32(INF)
    )
    out = 1.0 + jnp.min(v, axis=3)  # (4, N, B)
    return jnp.transpose(out, (2, 1, 0))  # (B, N, 4)


@partial(jax.jit, static_argnames=("max_depth",))
def rgd_heuristic_with_flags(
    t: RGDTables, states: jax.Array, max_depth: int = 1
) -> Tuple[jax.Array, jax.Array]:
    """Like :func:`rgd_heuristic` but also returns a per-state bool flag:
    True when some goal object's cost is INF at ``max_depth`` although its
    graph distance to the goal is finite — i.e. the ONLY reason the value
    is infinite is that no pushing chain exists within the compiled depth,
    so evaluating at a greater depth could yield a finite value.  States
    whose goals are graph-unreachable (dead ends) do NOT set the flag (no
    depth fixes those).  Drives the planner's depth-escalation policy
    (reference counterpart: the unbounded ``fewest_tools`` iteration,
    recursive_graph_distance.cc:101-112).
    """
    return _rgd_impl(t, states, max_depth)


@partial(jax.jit, static_argnames=("max_depth",))
def rgd_heuristic(t: RGDTables, states: jax.Array, max_depth: int = 1) -> jax.Array:
    """Fewest-tools RGD estimate for a batch of states.

    Args:
        t: precomputed tables.
        states: (B, N, 2) int32.
        max_depth: maximum pushing depth (static).  Any depth is supported
            (the reference iterates to n-2, recursive_graph_distance.cc:
            101-112); trace size grows ~4N^2 tool-push evaluations per goal
            per extra depth, so production routing caps depth by profile
            (see search.batched.required_depth).

    Returns:
        (B,) float32; unreachable goals yield values >= 1e9.

    REACHABLE-STATE REQUIREMENT: states must be reachable from the puzzle's
    initial state (the states a search generates).  The compact distance
    tables only cover each object's movement-graph vertex set plus its
    initial cell (see :func:`pushworld_tpu.ops.graphs.host_vertex_mask`);
    an agent position outside that set gathers INF here where the host
    oracle would still return a finite contact-adjacent cost.  Synthetic
    (non-reachable) states must use the host oracle instead.
    """
    return _rgd_impl(t, states, max_depth)[0]


def _rgd_impl(
    t: RGDTables, states: jax.Array, max_depth: int
) -> Tuple[jax.Array, jax.Array]:
    """Shared trace: returns (total cost, needs-deeper flag) per state."""
    B = states.shape[0]
    total = jnp.asarray(np.zeros((B,), np.float32))
    needs_deeper = jnp.asarray(np.zeros((B,), bool))
    # Memoized per-(skip set, depth) pushing-cost tables, shared across
    # goals/directions within one trace (the reference memoizes the same
    # quantity per state in its PushingCostCache,
    # recursive_graph_distance.cc:176-252; here whole-batch tables are
    # reused across the traced expression instead).
    cache: dict = {}

    for k in range(t.max_goals):
        o = k + 1
        p = states[:, o, :]  # (B, 2)
        goal = t.goal_pos[o]
        at_goal = jnp.all(p == goal[None, :], axis=-1)
        finite_dg = jnp.asarray(np.zeros((states.shape[0],), bool))

        per_depth: List[jax.Array] = []
        for depth in range(max_depth + 1):
            cost_dirs = []
            for a in range(4):
                e_ok = _gather_E(t, a, o, p)  # (B,)
                eff = p + DISPLACEMENTS_NP[a][None, :]
                effc = jnp.stack(
                    [jnp.clip(eff[:, 0], 0, t.width - 1), jnp.clip(eff[:, 1], 0, t.height - 1)],
                    axis=-1,
                )
                goal_dist = t.DG[o, effc[:, 1], effc[:, 0]]
                if depth == 0:
                    # Some feasible first transition leads toward the goal:
                    # the cost can only be INF for pushing-chain reasons.
                    finite_dg = finite_dg | (
                        e_ok & (goal_dist < FINITE_THRESHOLD)
                    )
                if depth == 0:
                    pc = _agent_push_cost(t, states, o, a, p)
                else:
                    inner_tbl = _all_dirs_cost(t, states, (o,), depth - 1, cache)

                    def inner(Q, _, _tbl=inner_tbl):
                        return _tbl

                    skip = np.zeros((B, t.n), bool)
                    pc = _tool_push_cost(t, states, o, a, p, skip, inner)
                cost_dirs.append(jnp.where(e_ok, goal_dist + pc, INF))
            per_depth.append(jnp.minimum(
                jnp.minimum(cost_dirs[0], cost_dirs[1]),
                jnp.minimum(cost_dirs[2], cost_dirs[3]),
            ))

        # fewest tools: first finite depth (depths beyond n_real - 2 are
        # invalid for this puzzle — reference iterates depth < n - 1).
        cost = jnp.asarray(np.full((B,), INF, np.float32))
        for d, d_cost in enumerate(per_depth):
            d_cost = jnp.where(d <= t.n_real - 2, d_cost, INF)
            cost = jnp.where(cost < FINITE_THRESHOLD, cost, d_cost)
        cost = jnp.where(at_goal, 0.0, cost)
        # Deeper pushing could fix this goal's INF iff the goal is
        # graph-reachable and deeper chains exist (reference iterates
        # depths 0..n-2, recursive_graph_distance.cc:101-112).
        needs_deeper = needs_deeper | (
            t.goal_mask[o]
            & ~at_goal
            & finite_dg
            & (cost >= FINITE_THRESHOLD)
            & (np.int32(max_depth) < t.n_real - 2)
        )
        # Objects without a goal contribute nothing.
        cost = jnp.where(t.goal_mask[o], jnp.minimum(cost, INF), 0.0)
        total = total + cost

    return total, needs_deeper


def _all_dirs_cost(
    t: RGDTables,
    states: jax.Array,
    skip_objs: Tuple[int, ...],
    depth: int,
    cache: dict,
):
    """(B, N, 4): cost of object q's transition Q -> Q + d_{a'} at pushing
    depth ``depth``, for every candidate q and direction a', with the
    chain-exclusion set ``skip_objs`` (objects already being pushed up the
    chain; the reference forbids reusing them,
    recursive_graph_distance.cc:114-174).

    Feasibility of the transition itself is NOT included (callers mask
    with E).  Tables are memoized per (skip set, depth): within one trace
    the same table is needed by every (goal, direction) pair that shares a
    chain prefix, which keeps the depth-3 trace polynomial (4N + 4N^2
    tool-push evaluations per goal instead of 16N^2+)."""
    key = (frozenset(skip_objs), depth)
    if key in cache:
        return cache[key]
    if depth == 0:
        # Agent pushes: the skip set never contains the agent (reference
        # semantics — only movable tools enter the chain), so all depth-0
        # tables coincide.
        out = cache.get(("depth0",))
        if out is None:
            out = _push_cost_all_dirs_depth0(t, states)
            cache[("depth0",)] = out
    else:
        B, N = states.shape[0], t.n
        skip = np.zeros((B, N), bool)
        for s in skip_objs:
            skip[:, s] = True
        cols = []
        for q in range(N):
            inner_tbl = _all_dirs_cost(
                t, states, tuple(sorted(set(skip_objs) | {q})), depth - 1, cache
            )

            def inner(Qs, _, _tbl=inner_tbl):
                return _tbl

            pq = states[:, q, :]
            per_dir = [
                _tool_push_cost(t, states, q, a_prime, pq, skip, inner)
                for a_prime in range(4)
            ]
            cols.append(jnp.stack(per_dir, axis=1))  # (B, 4)
        out = jnp.stack(cols, axis=1)  # (B, N, 4)
    cache[key] = out
    return out
