"""Device-side observation rendering for batched rollouts.

The reference environments return pixel observations rendered on host per
step (reference: python3/src/pushworld/puzzle.py:426-469 via
utils/env_utils.py:44-91).  For on-chip RL pipelines this module renders
cell-resolution observations directly from compiled-puzzle tensors + states
under jit/vmap: no host round-trip per step.

Two formats:
- :func:`render_cells_rgb` — (H, W, 3) uint8 fill-color image at one pixel
  per cell (the reference's border strokes are a host-rendering concern;
  `Puzzle.render` remains the pixel-exact renderer).
- :func:`render_cells_onehot` — (H, W, C) float32 semantic channels
  [wall, agent-wall, agent, goal-object, movable, goal], the natural input
  encoding for on-chip policies.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pushworld_tpu.core.compiled import CompiledPuzzle
from pushworld_tpu.core.puzzle import Colors

# Channel indices for the one-hot format.
C_WALL, C_AGENT_WALL, C_AGENT, C_GOAL_OBJ, C_MOVABLE, C_GOAL = range(6)
NUM_CHANNELS = 6

_PALETTE = np.array(
    [
        [255, 255, 255],  # empty
        list(Colors.WALL),
        list(Colors.AGENT_WALL),
        list(Colors.AGENT),
        list(Colors.GOAL_OBJECT),
        list(Colors.MOVABLE),
        list(Colors.GOAL_BORDER),  # goal cells drawn with the goal outline color
    ],
    np.uint8,
)


def compile_render_tables(puzzle, cp: CompiledPuzzle):
    """Static render tensors for one puzzle.

    Returns a dict of numpy arrays:
        base: (H, W) int8 cell classes for static content (0 empty, 1 wall,
              2 agent-wall, 6 goal).
        obj_cells: (N, C, 2) int16 per-movable cell offsets; obj_mask (N, C).
        obj_class: (N,) int8 cell class per movable (3 agent / 4 goal-obj /
              5 movable).
    """
    H, W, N = cp.height, cp.width, cp.n
    base = np.zeros((H, W), np.int8)
    for k in range(puzzle.num_goals):
        gx, gy = puzzle.goal_state[k]
        for cx, cy in puzzle.goal_cells[k]:
            base[gy + cy, gx + cx] = 6
    for x, y in puzzle.agent_wall_cells:
        base[y, x] = 2
    for x, y in puzzle.wall_cells:
        base[y, x] = 1

    cmax = max(len(c) for c in puzzle.movable_cells)
    obj_cells = np.zeros((N, cmax, 2), np.int16)
    obj_mask = np.zeros((N, cmax), bool)
    obj_class = np.zeros((N,), np.int8)
    for i, cells in enumerate(puzzle.movable_cells):
        for j, (cx, cy) in enumerate(sorted(cells)):
            obj_cells[i, j] = (cx, cy)
            obj_mask[i, j] = True
        obj_class[i] = 3 if i == 0 else (4 if i <= puzzle.num_goals else 5)
    return {
        "base": base,
        "obj_cells": obj_cells,
        "obj_mask": obj_mask,
        "obj_class": obj_class,
    }


@partial(jax.jit, static_argnames=())
def render_cells_class(tables, state: jax.Array) -> jax.Array:
    """(H, W) int8 cell-class grid for one state (N, 2)."""
    base = jnp.asarray(tables["base"])
    H, W = base.shape
    cells = jnp.asarray(tables["obj_cells"])  # (N, C, 2)
    mask = jnp.asarray(tables["obj_mask"])  # (N, C)
    cls = jnp.asarray(tables["obj_class"])  # (N,)

    # Masked (padding) cells are routed OUT OF BOUNDS so the scatter drops
    # them (JAX's default scatter mode).  The previous where(mask, vals,
    # grid[ys, xs]) trick wrote the OLD value at the object's own position
    # for every masked duplicate — and scatter duplicates have no defined
    # winner, so on puzzles with multi-cell objects the agent could vanish
    # from the rendered grid (caught by the batched-renderer differential
    # test).
    xs = jnp.where(mask, state[:, None, 0] + cells[..., 0], W)  # (N, C)
    ys = jnp.where(mask, state[:, None, 1] + cells[..., 1], H)
    vals = jnp.broadcast_to(cls[:, None], xs.shape)
    # Draw in movable order: later (higher-index) objects should not
    # overwrite the agent, so scatter-max with agent class highest is wrong;
    # instead scatter in reverse precedence: plain scatter, agent last.
    grid = base
    grid = grid.at[ys, xs].set(vals.astype(jnp.int8), mode="drop")
    # Re-draw the agent on top (matches reference draw order of movables
    # before goals but with agent first in state order).
    grid = grid.at[ys[0], xs[0]].set(cls[0].astype(jnp.int8), mode="drop")
    return grid


def render_cells_rgb(tables, state: jax.Array) -> jax.Array:
    """(H, W, 3) uint8 fill-color observation."""
    grid = render_cells_class(tables, state)
    return jnp.asarray(_PALETTE)[grid]


def render_cells_onehot(tables, state: jax.Array) -> jax.Array:
    """(H, W, NUM_CHANNELS) float32 semantic observation."""
    grid = render_cells_class(tables, state)
    onehot = jax.nn.one_hot(jnp.maximum(grid.astype(jnp.int32) - 1, -1), NUM_CHANNELS)
    # class 0 (empty) maps to all-zero channels via the -1 trick above.
    return onehot


@jax.jit
def render_cells_onehot_batched(tables, states: jax.Array) -> jax.Array:
    """(B, H, W, NUM_CHANNELS) float32 semantic observations for a state
    batch (B, N, 2) — gather/scatter-free.

    The scalar path (:func:`render_cells_class`) scatters each movable's
    cells into the grid; under ``vmap`` XLA serializes those scatters per
    state, which made the observation write the dominant term of the
    batched env step.  Here occupancy is computed as one-hot outer-product
    MATMULS (the same rewrite recipe as ops/novelty.py): for each dynamic
    class c, ``occ_c = Y_c @ X`` with ``Y[b, r, y] / X[b, r, x]`` the
    one-hot row/column indicators of every movable cell r — batched GEMMs
    on the MXU, no memory-op serialization.  Channel semantics match the
    scalar renderer exactly FOR VALID STATES (movable cells in bounds):
    movables paint over agent-wall and goal base cells; walls are never
    covered; movables never overlap each other.
    """
    base = jnp.asarray(tables["base"])  # (H, W) int8
    H, W = base.shape
    cells = jnp.asarray(tables["obj_cells"])  # (N, C, 2) int16
    mask = jnp.asarray(tables["obj_mask"])  # (N, C)
    cls = jnp.asarray(tables["obj_class"])  # (N,)
    B = states.shape[0]
    N, C = mask.shape
    R = N * C

    xs = (states[:, :, None, 0] + cells[None, :, :, 0]).reshape(B, R)
    ys = (states[:, :, None, 1] + cells[None, :, :, 1]).reshape(B, R)
    valid = mask.reshape(R)[None, :]  # (B, R)

    # One-hot row/column indicators (out-of-range coordinates one-hot to
    # zero, so invalid cells simply draw nothing).
    Y = (
        (ys[:, :, None] == jnp.arange(H, dtype=ys.dtype)[None, None, :])
        & valid[:, :, None]
    ).astype(jnp.bfloat16)  # (B, R, H)
    X = (
        xs[:, :, None] == jnp.arange(W, dtype=xs.dtype)[None, None, :]
    ).astype(jnp.bfloat16)  # (B, R, W)

    cls_r = jnp.repeat(cls, C)  # (R,)
    occ = []
    for c in (3, 4, 5):  # agent, goal-object, movable
        Yc = Y * (cls_r == c).astype(jnp.bfloat16)[None, :, None]
        cnt = jnp.einsum(
            "brh,brw->bhw", Yc, X, preferred_element_type=jnp.float32
        )
        occ.append(cnt > 0.5)
    occ_agent, occ_gobj, occ_mov = occ
    occ_any = occ_agent | occ_gobj | occ_mov

    chan = [
        jnp.broadcast_to(base == 1, (B, H, W)),  # wall (never covered)
        (base == 2)[None] & ~occ_any,  # agent-wall (movables paint over)
        occ_agent,
        occ_gobj,
        occ_mov,
        (base == 6)[None] & ~occ_any,  # goal cells (movables paint over)
    ]
    return jnp.stack(chan, axis=-1).astype(jnp.float32)
