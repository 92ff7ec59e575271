"""Pallas TPU kernel for the wavefront distance transform.

The XLA wavefront in :mod:`pushworld_tpu.ops.graphs` round-trips the
distance field through HBM on every ``lax.while_loop`` iteration (each
iteration is its own fusion).  This kernel keeps the feasibility masks and
the distance field resident in VMEM for the *entire* relaxation — one HBM
read of the inputs, one HBM write of the result — and runs the 4-neighbor
min-plus stencil on the VPU with roll + iota-mask shifts (no gathers, no
unaligned concatenations).

Semantics (identical to ``ops.graphs.distance_to_targets``, which itself
replaces the reference's lazy incremental BFS, reference:
cpp/src/heuristics/domain_transition_graph.cc:218-300):

    d[p] = graph distance from p to the target set along edges
           p -> p + d_a present iff E[a, p];  unreachable = INF (1e9).

The grid is one program per field: each (4, H, W) feasibility stack plus
its (H, W) seed field fits VMEM comfortably at benchmark sizes
(<= 47x54 cells -> padded (56, 128) f32 = 172 KB for all five planes).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pushworld_tpu.ops.graphs import DISPLACEMENTS, INF


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _wavefront_kernel(max_iters: int, e_ref, d0_ref, out_ref):
    """One program = one tile of TB fields, relaxed in lockstep so the VPU
    is fed full (TB, H, W) planes.  e_ref: (TB, 4, H, W) f32 in {0, 1};
    d0_ref/out_ref: (TB, H, W) f32."""
    e = e_ref[:]
    d0 = d0_ref[:]
    H, W = d0.shape[-2:]

    row = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)

    def shifted(x, dx, dy):
        # out[..., y, x] = x[..., y + dy, x + dx]; out-of-range -> INF.
        # roll + iota masks: every op is a full-tile VPU op (rolls by one
        # along sublanes/lanes; no unaligned slices).
        out = x
        if dy:
            out = jnp.roll(out, -dy, axis=-2)
            out = jnp.where((row + dy >= 0) & (row + dy < H), out, INF)
        if dx:
            out = jnp.roll(out, -dx, axis=-1)
            out = jnp.where((col + dx >= 0) & (col + dx < W), out, INF)
        return out

    def body(carry):
        d, _, i = carry
        best = d
        for a, (dx, dy) in enumerate(DISPLACEMENTS):
            cand = jnp.where(e[:, a] > 0.5, shifted(d, dx, dy) + 1.0, INF)
            best = jnp.minimum(best, cand)
        return best, jnp.any(best != d), i + 1

    def cond(carry):
        # Iteration counter capped in cond: counter-less while loops
        # compile pathologically on some TPU toolchains (see CLAUDE.md).
        return carry[1] & (carry[2] < max_iters)

    d, _, _ = jax.lax.while_loop(
        cond, body, (d0, jnp.bool_(True), jnp.int32(0))
    )
    out_ref[:] = d


@partial(jax.jit, static_argnames=("max_iters", "interpret"))
def distance_fields_pallas(
    E: jax.Array,
    d0: jax.Array,
    max_iters: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Batched wavefront distance fields, fused in VMEM.

    Args:
        E: (B, 4, H, W) bool/uint8 — feasible transitions per field.
        d0: (B, H, W) float32 — seed field (0 at targets, INF elsewhere).
        max_iters: relaxation cap; 0 -> H*W + 8 (the diameter bound).
        interpret: run the Pallas interpreter (differential tests on CPU).

    Returns:
        (B, H, W) float32 distance fields; unreachable = INF.
    """
    B, _, H, W = E.shape
    Hp = _round_up(max(H, 8), 8)
    Wp = _round_up(max(W, 128), 128)
    cap = int(max_iters) if max_iters else H * W + 8

    # Tile of fields per program: large enough to feed the VPU full
    # planes, small enough that the 5 resident planes stay well under
    # VMEM (TB * 5 * Hp * Wp * 4 bytes; 16 * 5 * 56 * 128 * 4 = 2.3 MB).
    TB = 16
    Bp = _round_up(B, TB)

    e = jnp.zeros((Bp, 4, Hp, Wp), jnp.float32)
    e = e.at[:B, :, :H, :W].set(E.astype(jnp.float32))
    d = jnp.full((Bp, Hp, Wp), INF, jnp.float32)
    d = d.at[:B, :H, :W].set(d0.astype(jnp.float32))

    out = pl.pallas_call(
        partial(_wavefront_kernel, cap),
        out_shape=jax.ShapeDtypeStruct((Bp, Hp, Wp), jnp.float32),
        grid=(Bp // TB,),
        in_specs=[
            pl.BlockSpec((TB, 4, Hp, Wp), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, Hp, Wp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, Hp, Wp), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(e, d)
    return out[:B, :H, :W]


def distance_to_targets_pallas(
    E_o: jax.Array, targets: jax.Array, interpret: bool = False
) -> jax.Array:
    """Drop-in Pallas twin of ``ops.graphs.distance_to_targets`` for one
    field: E_o (4, H, W) bool, targets (H, W) bool -> (H, W) float32."""
    d0 = jnp.where(targets, 0.0, INF)
    return distance_fields_pallas(
        E_o[None], d0[None], interpret=interpret
    )[0]
