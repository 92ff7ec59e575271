"""Feasible-movement reachability and graph distances as tensor fixpoints.

Device-side re-derivation of the reference's feasible movement graphs and
path distances (reference: cpp/src/heuristics/domain_transition_graph.cc):

- :func:`build_reachability` — the mutual fixpoint "object o can make move
  (p -> p+d_a) iff p is reachable, the move is not statically blocked, and
  some other object has a feasible transition that pushes o" becomes a
  Jacobi iteration over dense boolean tensors.  The pusher-support term is a
  2-D convolution: with transitions ``E[q, a]`` as input channels and the
  pairwise push tables as (pushee, pusher, K, K) kernels, one conv per
  action computes "is any feasible pusher transition in contact" for every
  pushee and position — this rides the MXU.
- :func:`goal_distance_field` / :func:`all_pairs_distances` — BFS distances
  on the movement graphs become wavefront relaxations (shifted boolean
  min-plus steps under ``lax.while_loop``), replacing the reference's lazy
  incremental BFS objects (domain_transition_graph.cc:218-300).

All functions take a single (unbatched) :class:`CompiledPuzzle`.
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pushworld_tpu.core.compiled import CompiledPuzzle

# Displacements indexed by action: (dx, dy).
DISPLACEMENTS = ((-1, 0), (1, 0), (0, -1), (0, 1))

INF = 1e9  # plain float: host code must never sync a device scalar


def _shift2d(x: jax.Array, dx: int, dy: int, fill=False) -> jax.Array:
    """Shifts the last two axes (y, x) of ``x`` so that
    out[..., y, x] = x[..., y + dy, x + dx] (out-of-range -> fill)."""
    H, W = x.shape[-2], x.shape[-1]
    out = x
    if dy:
        out = jnp.roll(out, -dy, axis=-2)
        if dy > 0:
            out = out.at[..., H - dy :, :].set(fill)
        else:
            out = out.at[..., : -dy, :].set(fill)
    if dx:
        out = jnp.roll(out, -dx, axis=-1)
        if dx > 0:
            out = out.at[..., :, W - dx :].set(fill)
        else:
            out = out.at[..., :, : -dx].set(fill)
    return out


@partial(jax.jit, static_argnames=("max_iters",))
def build_reachability(cp: CompiledPuzzle, max_iters: int = 512):
    """Computes the feasible-movement fixpoint.

    Returns:
        E: bool (4, N, H, W) — E[a, o, y, x]: the transition of object o at
           (x, y) one cell in direction a is feasible.
        reached: bool (N, H, W) — position is reachable for the object.
    """
    N, H, W = cp.n, cp.height, cp.width
    sb = jnp.asarray(cp.static_block)  # (4, N, H, W)
    push = jnp.asarray(cp.push)  # (4, N, N, K, K) [a, pusher, pushee]
    K = push.shape[-1]
    delta = cp.delta

    init_onehot = jnp.zeros((N, H, W), jnp.bool_)
    init_onehot = init_onehot.at[
        jnp.arange(N), cp.init_state[:, 1], cp.init_state[:, 0]
    ].set(jnp.asarray(cp.obj_mask))

    obj_mask = jnp.asarray(cp.obj_mask)

    # Conv kernels: for each action a, kernel[o, q, ky, kx] = push[a, q, o,
    # delta + ry, delta + rx] where the pusher sits at pushee_pos + (rx, ry).
    # pushed_support[o, a, p] = OR_{q, rel} push[a, q, o, rel] & E[q, a, p+rel]
    # = conv2d(E[:, a], kernel[a]) with input channels q, output channels o.
    # Cross-correlation orientation: out[o, y, x] = sum_{q, ky, kx}
    # in[q, y + ky - delta, x + kx - delta] * w[o, q, ky, kx].
    kernels = jnp.transpose(push, (0, 3, 4, 1, 2))  # (4, K, K, q, o) temp
    kernels = jnp.transpose(kernels, (0, 4, 3, 1, 2))  # (4, o, q, K, K)
    kernels_f = kernels.astype(jnp.float32)

    dn = jax.lax.conv_dimension_numbers((N, N, H, W), (N, N, K, K), ("NCHW", "OIHW", "NCHW"))

    def pushed_support(E):
        # E: (4, N, H, W) bool.  For each action, conv over channels.
        def one_action(E_a, k_a):
            out = jax.lax.conv_general_dilated(
                E_a.astype(jnp.float32)[None],  # (1, q, H, W)
                k_a,  # (o, q, K, K)
                window_strides=(1, 1),
                padding=[(delta, delta), (delta, delta)],
                dimension_numbers=dn,
            )[0]
            return out > 0.5
        return jax.vmap(one_action)(E, kernels_f)  # (4, N, H, W)

    def body(carry):
        E, reached, _, i = carry
        support = pushed_support(E)
        # Agent (object 0) needs no pusher.
        support = support.at[:, 0].set(True)
        E_new = reached[None] & ~sb & support
        E_new = E_new & obj_mask[None, :, None, None]
        # reached grows by transition endpoints.
        arrive = reached
        for a, (dx, dy) in enumerate(DISPLACEMENTS):
            arrive = arrive | _shift2d(E_new[a], -dx, -dy)
        changed = jnp.any(E_new != E) | jnp.any(arrive != reached)
        return E_new, arrive, changed, i + 1

    def cond(carry):
        # The explicit iteration cap both bounds the monotone fixpoint and
        # sidesteps a pathological XLA:TPU compile for counter-less loops.
        return carry[2] & (carry[3] < max_iters)

    E0 = jnp.zeros((4, N, H, W), jnp.bool_)
    carry = (E0, init_onehot, np.bool_(True), np.int32(0))
    E, reached, _, _ = jax.lax.while_loop(cond, body, carry)
    return E, reached


def _conv_orientation_note():
    """Kernel orientation: pushed_support[o, a, (x, y)] must OR over
    E[q, a, (x + rx, y + ry)] & push[a, q, o, delta + ry, delta + rx].
    ``conv_general_dilated`` with OIHW kernels computes a correlation with
    kernel index (ky, kx) mapping to input offset (ky - delta, kx - delta),
    so kernel[o, q, ky, kx] = push[a, q, o, ky, kx] directly."""


def host_graph_distances(E_o: np.ndarray, sources: np.ndarray = None) -> np.ndarray:
    """All-pairs distances D[s, t] on one object's movement graph, computed
    on host with scipy's C BFS (the tables are built once per puzzle; the
    device wavefront version below compiles pathologically slowly on some
    TPU toolchains, so the host path is the default for table building).

    Args:
        E_o: bool (4, H, W) numpy — feasible transitions.
        sources: optional bool (H*W,) mask restricting BFS sources (rows for
            other sources are all-INF).

    Returns:
        float32 (H*W, H*W); unreachable pairs = INF (1e9).
    """
    import scipy.sparse as sp
    import scipy.sparse.csgraph as csgraph

    E_o = np.asarray(E_o)
    H, W = E_o.shape[-2:]
    HW = H * W
    rows = []
    cols = []
    for a, (dx, dy) in enumerate(DISPLACEMENTS):
        ys, xs = np.nonzero(E_o[a])
        src = ys * W + xs
        dst = (ys + dy) * W + (xs + dx)
        ok = (xs + dx >= 0) & (xs + dx < W) & (ys + dy >= 0) & (ys + dy < H)
        rows.append(src[ok])
        cols.append(dst[ok])
    rows = np.concatenate(rows) if rows else np.zeros(0, np.int64)
    cols = np.concatenate(cols) if cols else np.zeros(0, np.int64)

    out = np.full((HW, HW), float(INF), np.float32)
    np.fill_diagonal(out, 0.0)
    if len(rows) == 0:
        return out
    adj = sp.csr_matrix(
        (np.ones(len(rows), np.int8), (rows, cols)), shape=(HW, HW)
    )
    active = np.zeros((HW,), bool)
    active[rows] = True
    active[cols] = True
    if sources is not None:
        active &= np.asarray(sources).reshape(-1)
    idx = np.nonzero(active)[0]
    if len(idx) == 0:
        return out
    d = csgraph.shortest_path(adj, method="D", unweighted=True, indices=idx)
    d = np.where(np.isfinite(d), d, float(INF)).astype(np.float32)
    out[idx] = d
    return out


def host_vertex_mask(E_o: np.ndarray, init_flat: int) -> np.ndarray:
    """Vertex set of one object's movement graph: cells incident to at
    least one feasible transition (as source or target), plus the object's
    initial cell (an object parked where it can never move again still has
    a position the search can observe).

    Every position the RGD kernels ever look up a graph distance for is in
    this set: distance gathers are masked by transition feasibility
    (contact cells are sources, pusher-next cells are targets), and state
    positions are reachable only through feasible transitions from the
    initial position.  This is what makes the compact distance tables of
    :func:`host_graph_distances_compact` lossless (VERDICT round 1, task 3;
    reference analog: the lazy per-position ``PathDistances`` objects of
    domain_transition_graph.cc:266-300 never materialize all HW^2 pairs
    either).

    Args:
        E_o: bool (4, H, W) — feasible transitions of one object.
        init_flat: the object's initial cell as a flat y*W+x index.

    Returns:
        bool (H*W,) vertex mask.
    """
    E_o = np.asarray(E_o)
    H, W = E_o.shape[-2:]
    v = np.zeros((H, W), bool)
    for a, (dx, dy) in enumerate(DISPLACEMENTS):
        src = E_o[a].astype(bool)
        v |= src
        ys, xs = np.nonzero(src)
        ty, tx = ys + dy, xs + dx
        ok = (tx >= 0) & (tx < W) & (ty >= 0) & (ty < H)
        v[ty[ok], tx[ok]] = True
    v = v.reshape(-1)
    v[init_flat] = True
    return v


def host_graph_distances_compact(
    E_o: np.ndarray, verts: np.ndarray
) -> np.ndarray:
    """All-pairs distances restricted to the graph's vertex set.

    Args:
        E_o: bool (4, H, W) — feasible transitions of one object.
        verts: int (R,) flat cell indices (from :func:`host_vertex_mask`).

    Returns:
        float32 (R, R) with D[i, j] = dist(verts[i] -> verts[j]);
        unreachable pairs = INF (1e9).
    """
    import scipy.sparse as sp
    import scipy.sparse.csgraph as csgraph

    E_o = np.asarray(E_o)
    H, W = E_o.shape[-2:]
    HW = H * W
    R = len(verts)
    inv = np.full((HW,), -1, np.int64)
    inv[verts] = np.arange(R)

    rows = []
    cols = []
    for a, (dx, dy) in enumerate(DISPLACEMENTS):
        ys, xs = np.nonzero(E_o[a])
        ok = (xs + dx >= 0) & (xs + dx < W) & (ys + dy >= 0) & (ys + dy < H)
        src = inv[(ys[ok]) * W + xs[ok]]
        dst = inv[(ys[ok] + dy) * W + (xs[ok] + dx)]
        rows.append(src)
        cols.append(dst)
    rows = np.concatenate(rows) if rows else np.zeros(0, np.int64)
    cols = np.concatenate(cols) if cols else np.zeros(0, np.int64)

    out = np.full((R, R), float(INF), np.float32)
    np.fill_diagonal(out, 0.0)
    if len(rows) == 0 or R == 0:
        return out
    adj = sp.csr_matrix((np.ones(len(rows), np.int8), (rows, cols)), shape=(R, R))
    d = csgraph.shortest_path(adj, method="D", unweighted=True)
    return np.where(np.isfinite(d), d, float(INF)).astype(np.float32)


def host_distance_to_targets(E_o: np.ndarray, target_flat: int) -> np.ndarray:
    """(H, W) float32 field of graph distances from every position to one
    target (host BFS over reversed edges)."""
    from collections import deque

    E_o = np.asarray(E_o)
    H, W = E_o.shape[-2:]
    # Reversed adjacency: target <- p for each edge p -> p + d_a.
    pred = [[] for _ in range(H * W)]
    for a, (dx, dy) in enumerate(DISPLACEMENTS):
        ys, xs = np.nonzero(E_o[a])
        for y, x in zip(ys, xs):
            tx, ty = x + dx, y + dy
            if 0 <= tx < W and 0 <= ty < H:
                pred[ty * W + tx].append(y * W + x)
    dist = np.full((H * W,), float(INF), np.float32)
    dist[target_flat] = 0.0
    q = deque([target_flat])
    while q:
        t = q.popleft()
        for p in pred[t]:
            if dist[p] >= float(INF):
                dist[p] = dist[t] + 1.0
                q.append(p)
    return dist.reshape(H, W)


@partial(jax.jit, static_argnames=("max_iters",))
def distance_to_targets(
    E_o: jax.Array, targets: jax.Array, max_iters: int = 4096
) -> jax.Array:
    """Distance field d[p] = graph distance from p to the target set along
    edges p -> p + d_a (present iff E_o[a, p]).

    Args:
        E_o: bool (4, H, W) — feasible transitions of one object.
        targets: bool (H, W) — target positions (distance 0).

    Returns:
        float32 (H, W); unreachable = INF (1e9).
    """
    H, W = targets.shape

    def body(carry):
        d, _, i = carry
        best = d
        for a, (dx, dy) in enumerate(DISPLACEMENTS):
            # moving from p to p + d_a costs 1.
            cand = jnp.where(E_o[a], _shift2d(d, dx, dy, fill=INF) + 1.0, INF)
            best = jnp.minimum(best, cand)
        return best, jnp.any(best != d), i + 1

    cap = min(max_iters, H * W + 8)
    d0 = jnp.where(targets, 0.0, INF)
    d, _, _ = jax.lax.while_loop(
        lambda c: c[1] & (c[2] < cap), body, (d0, np.bool_(True), np.int32(0))
    )
    return d


@partial(jax.jit, static_argnames=())
def all_pairs_distances(E_o: jax.Array) -> jax.Array:
    """All-pairs distances D[s, t] = dist(s -> t) over one object's movement
    graph, as a wavefront sweep batched over target columns.

    Returns float32 (H*W, H*W); unreachable pairs = INF.

    Memory note: (H*W)^2 floats — ~26 MB at the benchmark maximum grid; used
    per-puzzle, not per-batch.
    """
    H, W = E_o.shape[-2:]
    HW = H * W

    # R[t, p] = dist(p -> t) computed as a relaxation: dist(p) =
    # 1 + min_a dist(p + d_a) over feasible transitions; all targets batched.
    eye = jnp.eye(HW, dtype=jnp.float32)
    d0 = jnp.where(eye > 0, 0.0, INF).reshape(HW, H, W)  # [t, y, x]

    def body(carry):
        d, _, i = carry
        best = d
        for a, (dx, dy) in enumerate(DISPLACEMENTS):
            cand = jnp.where(E_o[a][None], _shift2d(d, dx, dy, fill=INF) + 1.0, INF)
            best = jnp.minimum(best, cand)
        return best, jnp.any(best != d), i + 1

    d, _, _ = jax.lax.while_loop(
        lambda c: c[1] & (c[2] < HW + 8), body, (d0, np.bool_(True), np.int32(0))
    )
    # d[t, y, x] = dist((x, y) -> t).  Return D[s, t].
    return jnp.transpose(d.reshape(HW, HW))
