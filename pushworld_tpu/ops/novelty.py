"""Batched width-based novelty heuristic with device-resident visited tables.

Semantics follow the reference novelty heuristic (reference:
cpp/src/heuristics/novelty.cc:30-77): novelty 1 if any *moved* object is at a
never-seen position, 2 if any (moved object, other object) position pair is
unseen, else 3; the visited structures absorb every evaluated state.

TPU-first representation (v2 — replaces the scattered hash bitset, which XLA
lowered to a serial per-row loop that dominated the search iteration):

- single-object visited positions are an exact dense table ``(N, H*W)``;
- pair visits use a FACTORED hash table ``T[h(i, pi), h(j, pj)]`` over an
  ``S x S`` grid of buckets (``S = 2**(pair_bits // 2)``; same total bucket
  count as the previous flat ``2**pair_bits`` bitset).  Factoring turns both
  sides of the heuristic into MXU matmuls with NO gathers or scatters:

  * update: ``T |= sign(X^T Y + Y^T X)`` where ``X[b, k]`` one-hot-ORs the
    moved-object atoms of state ``b`` and ``Y[b, l]`` the atoms of all its
    objects — the outer-product sum marks exactly the (moved, other) pairs
    of every absorbed state, symmetrized to match the reference's unordered
    pair keys (novelty.cc:47-73);
  * query: a pair of state ``b`` is unseen iff some ``(k, l)`` with
    ``X[b, k] & Y[b, l]`` has ``T[k, l] = 0``; counting unseen columns via
    ``sum(Y) - Y @ T`` turns this into one matmul.  Self-pairs (``l = k``,
    an artifact of querying the full product set) are excluded by
    subtracting the own-column term.

  Hash collisions on the TABLE side (two pairs sharing a cell) mark MORE
  cells seen, i.e. *raise* a state's novelty from 2 to 3.  Collisions on
  the QUERY side can also lower it: when a moved and an unmoved atom of
  the same state collide into one bucket ``k``, ``X[b, k]`` is set by the
  moved atom and the unmoved atom's unseen pairs are attributed to it,
  scoring 2 where the reference scores 3.  Both directions only perturb
  search ORDER — plans remain valid (validated on reconstruction), and
  the differential test (tests/test_batched_search.py) checks the
  no-collision regime where scores are exact;
- states in one batch are scored against the tables as of the start of the
  batch, then all their updates are applied at once (lockstep semantics),
  whereas the reference scores strictly sequentially.
"""

import os
from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Pair-table size knob (read once at import; a static compile-key input).
# 24 -> 4096x4096 buckets (the shipped default; ~12% load at 10^5-state
# searches).  22 halves the table side and cuts the two novelty GEMMs 4x
# — measured on the device-iteration profile; collisions only perturb
# search order (ops docstring).
_DEFAULT_PAIR_BITS = int(os.environ.get("PW_NOVELTY_PAIR_BITS", "24"))


@dataclass(frozen=True)
class NoveltyTables:
    seen_pos: jax.Array  # bool (N, HW)
    pair_table: jax.Array  # bfloat16 (S, S), values 0/1, symmetric
    # static
    n: int
    width: int
    height: int
    pair_bits: int

    @property
    def side(self) -> int:
        return 1 << (self.pair_bits // 2)


jax.tree_util.register_dataclass(
    NoveltyTables,
    data_fields=["seen_pos", "pair_table"],
    meta_fields=["n", "width", "height", "pair_bits"],
)


def init_novelty(
    n: int, height: int, width: int, pair_bits: int = _DEFAULT_PAIR_BITS
) -> NoveltyTables:
    side = 1 << (pair_bits // 2)
    return NoveltyTables(
        seen_pos=jnp.zeros((n, height * width), jnp.bool_),
        pair_table=jnp.zeros((side, side), jnp.bfloat16),
        n=n,
        width=width,
        height=height,
        pair_bits=pair_bits,
    )


def _atom_hash(i, p, side):
    """Deterministic mix of one (object, position) atom into [0, side)."""
    h = (i.astype(jnp.uint32) * np.uint32(0x9E3779B1)) ^ (
        p.astype(jnp.uint32) * np.uint32(0xC2B2AE3D)
    )
    h = h * np.uint32(0x165667B1)
    h = h ^ (h >> 15)
    return (h & np.uint32(side - 1)).astype(jnp.int32)


@partial(jax.jit, static_argnames=())
def novelty_score_and_update(
    t: NoveltyTables,
    states: jax.Array,  # (B, N, 2) int32
    moved: jax.Array,  # (B, N) bool — which objects moved into this state
    valid: jax.Array,  # (B,) bool — score/absorb only valid entries
) -> Tuple[jax.Array, NoveltyTables]:
    """Returns ((B,) float32 novelty in {1, 2, 3}, updated tables)."""
    B, N = states.shape[0], t.n
    S = t.side
    flat = states[..., 1] * t.width + states[..., 0]  # (B, N)
    flat = jnp.clip(flat, 0, t.height * t.width - 1)

    # --- novelty 1: moved object at unseen position (exact dense table).
    pos_seen = t.seen_pos[np.arange(N)[None, :], flat]  # (B, N)
    nov1 = jnp.any(moved & ~pos_seen, axis=1)

    # --- atom one-hots over the factored bucket space.
    h = _atom_hash(jnp.asarray(np.arange(N, dtype=np.int32))[None, :], flat, S)
    iota = jnp.asarray(np.arange(S, dtype=np.int32))
    eq = h[:, :, None] == iota[None, None, :]  # (B, N, S)
    X = jnp.any(eq & moved[:, :, None], axis=1)  # (B, S) moved-side atoms
    Y = jnp.any(eq, axis=1)  # (B, S) all atoms

    # --- novelty 2: unseen (moved, other) pair — one matmul per side.
    Yf = Y.astype(jnp.bfloat16)
    ny = jnp.sum(Y.astype(jnp.float32), axis=1)  # (B,)
    Z = jnp.dot(Yf, t.pair_table, preferred_element_type=jnp.float32)  # (B, S)
    diag = jnp.diagonal(t.pair_table).astype(jnp.float32)  # (S,)
    # Exclude the own column (l = k): a moved atom always co-occurs with
    # itself in Y, and that self-pair is not a reference pair.
    self_unseen = Y.astype(jnp.float32) * (1.0 - diag)[None, :]
    unseen_cols = ny[:, None] - Z - self_unseen  # (B, S)
    nov2 = jnp.any(X & (unseen_cols > 0.5), axis=1)

    novelty = jnp.where(nov1, 1.0, jnp.where(nov2, 2.0, 3.0))

    # --- absorb: positions of moved objects + symmetric pair outer-products.
    upd_mask = moved & valid[:, None]
    seen_pos = t.seen_pos.at[np.arange(N)[None, :], flat].max(upd_mask)
    Xv = (X & valid[:, None]).astype(jnp.bfloat16)
    Yv = (Y & valid[:, None]).astype(jnp.bfloat16)
    U = jnp.dot(Xv.T, Yv, preferred_element_type=jnp.float32)  # (S, S)
    pair_table = jnp.maximum(
        t.pair_table, ((U + U.T) > 0.5).astype(jnp.bfloat16)
    )

    new_t = NoveltyTables(
        seen_pos=seen_pos,
        pair_table=pair_table,
        n=t.n,
        width=t.width,
        height=t.height,
        pair_bits=t.pair_bits,
    )
    return jnp.where(valid, novelty, 3.0), new_t
