"""Device-resident open-addressing visited set for packed search states.

The reference planner deduplicates states with a host hash set over state
vectors (reference: cpp/include/pushworld_puzzle.h:74-78 StateHash +
best_first_search.h:81-91).  Here states are fingerprinted to 64 bits
(two uint32 lanes) and stored in a linear-probing table entirely on device;
batch insertion is a fixed number of probe rounds with masked scatters.

Deletion is supported via tombstones so the planner can *un-visit* states
evicted from its bounded frontier (otherwise an evicted state could never be
re-generated, losing completeness — the reference's frontier is unbounded).
Tombstoned slots terminate neither lookups nor insertions.

Failure modes and their effect on the search (all benign for greedy search):
- fingerprint collision (~2^-64 per pair): a genuinely new state is treated
  as visited — probability negligible for <= 10^8 states;
- probe exhaustion or same-round slot race: an insert may be lost, so a
  state might be re-expanded later (wasted work only);
- duplicate keys within one batch are pre-deduplicated by sort.
"""

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class HashSet:
    key_lo: jax.Array  # uint32 (capacity,)
    key_hi: jax.Array  # uint32 (capacity,)
    capacity_bits: int


jax.tree_util.register_dataclass(
    HashSet, data_fields=["key_lo", "key_hi"], meta_fields=["capacity_bits"]
)

N_PROBES = 8


def init_hashset(capacity_bits: int = 20) -> HashSet:
    cap = 2 ** capacity_bits
    return HashSet(
        key_lo=jnp.zeros((cap,), jnp.uint32),
        key_hi=jnp.zeros((cap,), jnp.uint32),
        capacity_bits=capacity_bits,
    )


def fingerprint(states: jax.Array, width: int) -> Tuple[jax.Array, jax.Array]:
    """64-bit fingerprints of packed states.

    states: (..., N, 2) int32 -> (lo, hi) uint32 arrays of shape (...,).
    Uses an FxHash-style fold over per-object packed positions in two lanes
    with different multipliers.  The all-zero fingerprint is reserved as the
    empty-slot sentinel and remapped.
    """
    flat = (states[..., 1] * width + states[..., 0]).astype(jnp.uint32)  # (..., N)

    def fold(carry, mult, xorc):
        h = jnp.asarray(np.full(flat.shape[:-1], carry, np.uint32))
        n = flat.shape[-1]
        for i in range(n):
            h = (jnp.bitwise_xor(h, flat[..., i] + np.uint32(xorc))) * np.uint32(mult)
            h = jnp.bitwise_xor(h, h >> 13)
        return h

    lo = fold(0x811C9DC5, 0x01000193, 0x9E3779B9)
    hi = fold(0xCBF29CE4, 0x85EBCA6B, 0x27D4EB2F)
    # Avoid the empty (0, 0) and tombstone (~0, ~0) sentinels.
    zero = (lo == 0) & (hi == 0)
    lo = jnp.where(zero, np.uint32(1), lo)
    tomb = (lo == np.uint32(0xFFFFFFFF)) & (hi == np.uint32(0xFFFFFFFF))
    lo = jnp.where(tomb, np.uint32(0xFFFFFFFE), lo)
    return lo, hi


@partial(jax.jit, static_argnames=())
def dedup_batch(lo: jax.Array, hi: jax.Array, valid: jax.Array) -> jax.Array:
    """Marks the first occurrence of each (lo, hi) in the batch.

    Returns a bool mask which is True for entries that are the batch's first
    occurrence of their key (invalid entries -> False)."""
    # No uint64 on TPU: lexsort the two uint32 lanes (invalid entries pushed
    # to the end with the all-ones key).
    lo2 = jnp.where(valid, lo, np.uint32(0xFFFFFFFF))
    hi2 = jnp.where(valid, hi, np.uint32(0xFFFFFFFF))
    order = jnp.lexsort((lo2, hi2))
    s_lo = lo2[order]
    s_hi = hi2[order]
    first_sorted = jnp.concatenate(
        [
            jnp.asarray(np.ones((1,), bool)),
            (s_lo[1:] != s_lo[:-1]) | (s_hi[1:] != s_hi[:-1]),
        ]
    )
    first = jnp.zeros_like(first_sorted).at[order].set(first_sorted)
    return first & valid


@partial(jax.jit, static_argnames=())
def probe_and_insert(
    hs: HashSet, lo: jax.Array, hi: jax.Array, valid: jax.Array
) -> Tuple[jax.Array, HashSet]:
    """Tests membership and inserts new keys.

    Args:
        hs: the table.
        lo, hi: (B,) uint32 key lanes.
        valid: (B,) bool — only valid entries are tested/inserted.

    Returns:
        (is_new, updated table): is_new[b] True iff the key was not present
        (and is now inserted).  Within-batch duplicates must be removed
        beforehand (see :func:`dedup_batch`).
    """
    cap_mask = np.uint32(2 ** hs.capacity_bits - 1)
    slot = ((lo ^ (hi * np.uint32(0x9E3779B1))) & cap_mask).astype(jnp.int32)

    found = jnp.zeros_like(valid)
    inserted = jnp.zeros_like(valid)
    remaining = valid

    key_lo, key_hi = hs.key_lo, hs.key_hi
    # Out-of-range index + mode="drop" discards writes of non-attempting lanes.
    dummy = np.int32(2 ** hs.capacity_bits)
    for _ in range(N_PROBES):
        cur_lo = key_lo[slot]
        cur_hi = key_hi[slot]
        match = remaining & (cur_lo == lo) & (cur_hi == hi)
        found = found | match
        remaining = remaining & ~match
        free = ((cur_lo == 0) & (cur_hi == 0)) | (
            (cur_lo == np.uint32(0xFFFFFFFF)) & (cur_hi == np.uint32(0xFFFFFFFF))
        )
        attempt = remaining & free
        # Write this round's attempts, then verify (same-slot races between
        # different keys leave exactly one winner; losers keep probing).
        w = jnp.where(attempt, slot, dummy)
        key_lo = key_lo.at[w].set(lo, mode="drop")
        key_hi = key_hi.at[w].set(hi, mode="drop")
        won = attempt & (key_lo[slot] == lo) & (key_hi[slot] == hi)
        inserted = inserted | won
        remaining = remaining & ~won
        slot = (slot + 1) & cap_mask.astype(jnp.int32)

    # Keys neither found nor inserted (probe exhaustion) are still reported
    # new so the search explores them; they may be re-visited later.
    is_new = valid & ~found
    return is_new, HashSet(key_lo=key_lo, key_hi=key_hi, capacity_bits=hs.capacity_bits)


@partial(jax.jit, static_argnames=())
def probe_delete(
    hs: HashSet, lo: jax.Array, hi: jax.Array, valid: jax.Array
) -> HashSet:
    """Removes keys from the table (tombstoning their slots).

    Used to un-visit states evicted from the bounded search frontier so they
    can be re-generated later.  Missing keys are ignored."""
    cap_mask = np.uint32(2 ** hs.capacity_bits - 1)
    slot = ((lo ^ (hi * np.uint32(0x9E3779B1))) & cap_mask).astype(jnp.int32)
    dummy = np.int32(2 ** hs.capacity_bits)
    key_lo, key_hi = hs.key_lo, hs.key_hi
    remaining = valid
    for _ in range(N_PROBES):
        cur_lo = key_lo[slot]
        cur_hi = key_hi[slot]
        match = remaining & (cur_lo == lo) & (cur_hi == hi)
        w = jnp.where(match, slot, dummy)
        key_lo = key_lo.at[w].set(np.uint32(0xFFFFFFFF), mode="drop")
        key_hi = key_hi.at[w].set(np.uint32(0xFFFFFFFF), mode="drop")
        remaining = remaining & ~match
        slot = (slot + 1) & cap_mask.astype(jnp.int32)
    return HashSet(key_lo=key_lo, key_hi=key_hi, capacity_bits=hs.capacity_bits)
