#!/usr/bin/env python
"""Decomposes the device search's per-iteration cost on the real chip.

Times run_chunk (the production program) on one hard benchmark instance,
then re-times it with individual components knocked out (monkeypatched to
cheap stand-ins before the jit trace), and sweeps the expand width.
Reports ms/iteration and device expansions/s per variant, plus the native
serial planner's expansions/s on the same instance for comparison.

Env:
  PW_PUZZLE   "level3/Snack Feast" style key (default: a level3 miss)
  PW_CHUNK    iterations per dispatch (default 128)
  PW_REPS     timed dispatches per variant (default 3)
  PW_VARIANTS comma list to run (default all)
"""
import faulthandler
import json
import os
import sys
import time

faulthandler.dump_traceback_later(
    int(os.environ.get("PW_HANG_DUMP_S", "600")), repeat=True
)
HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.join(os.path.dirname(HERE), ".jax_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

from pushworld_tpu import config
from pushworld_tpu.core.compiled import compile_puzzle, compute_delta
from pushworld_tpu.core.puzzle import Puzzle
from pushworld_tpu.ops.rgd import build_rgd_tables, dflat_required
from pushworld_tpu.search.planner import (
    _CMAX_AGENT_LADDER,
    _CMAX_LADDER,
    _DFLAT_LADDER,
    _GOALS_LADDER,
    _pad,
    _profile_for,
    warm_transfers_async,
)
from pushworld_tpu.utils.filesystem import get_puzzle_file_paths

warm_transfers_async()

KEY = os.environ.get("PW_PUZZLE", "level3/Snack Feast")
CHUNK = int(os.environ.get("PW_CHUNK", "128"))
REPS = int(os.environ.get("PW_REPS", "3"))

level, _, name = KEY.partition("/")
paths = get_puzzle_file_paths(os.path.join(config.BENCHMARK_PUZZLES_PATH, level))
puzzle = Puzzle.from_file(paths[name])

from pushworld_tpu.search import batched as B

prof = _profile_for(
    puzzle.num_movables, max(puzzle.height, puzzle.width), compute_delta(puzzle)
)
cp = compile_puzzle(puzzle, prof[0], prof[1], prof[1], prof[2])
depth = B.required_depth(puzzle)
dflat = _pad(_DFLAT_LADDER, dflat_required(puzzle, cp, depth))
counts = np.asarray(cp.push).reshape(4, prof[0], prof[0], -1).sum(-1)
cagent = _pad(_CMAX_AGENT_LADDER, max(1, int(counts[:, 0, :].max())))
cmax = _pad(_CMAX_LADDER, max(1, int(counts.max())))
goals = _pad(_GOALS_LADDER, puzzle.num_goals)
print(
    f"# {KEY}: profile={prof} depth={depth} dflat={dflat} cagent={cagent} "
    f"cmax={cmax} goals={goals}",
    flush=True,
)
tables = build_rgd_tables(
    puzzle, cp, cmax_pad=cmax, max_goals=goals, max_depth=depth,
    dflat_cap=dflat, cmax_agent_pad=cagent,
)

# Baseline component implementations (restored between variants).
ORIG = dict(
    rgd_heuristic=B.rgd_heuristic,
    rgd_heuristic_with_flags=B.rgd_heuristic_with_flags,
    novelty_score_and_update=B.novelty_score_and_update,
    probe_and_insert=B.probe_and_insert,
    probe_delete=B.probe_delete,
    dedup_batch=B.dedup_batch,
    fingerprint=B.fingerprint,
    step=B.step,
    expand_children=B.expand_children,
    is_goal_state=B.is_goal_state,
    _append_frontier=B._append_frontier,
    _append_history=B._append_history,
)


def _stub_rgd(t, states, max_depth=0):
    # Cheap data-dependent stand-in (can't be constant-folded).
    return jnp.sum(states[:, 0, :], axis=-1).astype(jnp.float32)


def _stub_rgd_flags(t, states, max_depth=0):
    h = _stub_rgd(t, states, max_depth)
    return h, jnp.zeros(h.shape, bool)


def _stub_merge(s, Bx, h, children, hist_idx, lo, hi, visited):
    F = s.frontier_h.shape[0]
    nb = 4 * Bx
    new_h = jnp.roll(s.frontier_h, -nb).at[-nb:].set(h)
    new_states = jnp.roll(s.frontier_states, -nb, axis=0).at[-nb:].set(children)
    new_hist = jnp.roll(s.frontier_hist, -nb).at[-nb:].set(hist_idx)
    new_lo = jnp.roll(s.frontier_lo, -nb).at[-nb:].set(lo)
    new_hi = jnp.roll(s.frontier_hi, -nb).at[-nb:].set(hi)
    return (new_states, new_h, new_hist, new_lo, new_hi, s.ring_cursor,
            visited, jnp.int32(0))


def _stub_history(s, cfg, is_new, phist4, actions):
    hist_idx = jnp.cumsum(is_new.astype(jnp.int32)) + s.hist_cursor - 1
    return s.hist_parent, s.hist_action, s.hist_cursor + 1, hist_idx


def _stub_step(cp, state, action):
    import numpy as _np

    disp = jnp.asarray(_np.array([(-1, 0), (1, 0), (0, -1), (0, 1)], _np.int32))
    return state + disp[action][None, :]


def _stub_expand(cp, contacts, contacts_mask, parents):
    import numpy as _np

    disp = jnp.asarray(_np.array([(-1, 0), (1, 0), (0, -1), (0, 1)], _np.int32))
    return jnp.concatenate(
        [parents + disp[a][None, None, :] for a in range(4)], axis=0
    )


def _vec_step(cp, state, action):
    # Candidate optimization: transitive closure by vector iteration
    # (n-1 vec-mat steps) instead of matrix squaring (log n mat-mat).
    from pushworld_tpu.ops.step import DISPLACEMENTS, _push_matrix

    x = state[..., 0]
    y = state[..., 1]
    idx = np.arange(cp.n)
    blocked_static = cp.static_block[action, idx, y, x]
    m = _push_matrix(cp, state, action).astype(jnp.float32)
    r0 = np.zeros((cp.n,), np.float32)
    r0[0] = 1.0
    r = jnp.asarray(r0)
    for _ in range(cp.n - 1):
        r = jnp.minimum(1.0, r + r @ m)
    pushed = r > 0.5
    movable_blocked = jnp.any(pushed[1:] & blocked_static[1:])
    nothing_moves = blocked_static[0] | movable_blocked
    moved = pushed & ~nothing_moves & cp.obj_mask
    disp = jnp.asarray(DISPLACEMENTS)[action]
    return state + disp[None, :] * moved[:, None].astype(jnp.int32)


def _stub_novelty(tables_, states, moved, is_new):
    nov = jnp.where(jnp.any(moved, axis=-1), 1, 3).astype(jnp.int32)
    return nov, tables_


def _stub_probe_insert(hs, lo, hi, valid):
    return valid, hs


def _stub_probe_delete(hs, lo, hi, valid):
    return hs


def _stub_dedup(lo, hi, valid):
    return valid


def _stub_goal(cp_, states):
    return jnp.zeros((), bool)


VARIANTS = {
    "full": {},
    "no_rgd": {
        "rgd_heuristic": _stub_rgd,
        "rgd_heuristic_with_flags": _stub_rgd_flags,
    },
    "no_novelty": {"novelty_score_and_update": _stub_novelty},
    "no_hashset": {
        "probe_and_insert": _stub_probe_insert,
        "probe_delete": _stub_probe_delete,
    },
    "no_dedup": {"dedup_batch": _stub_dedup},
    "no_goalcheck": {"is_goal_state": _stub_goal},
    "heuristics_only": {  # rgd+novelty+step kept; bookkeeping stubbed
        "probe_and_insert": _stub_probe_insert,
        "probe_delete": _stub_probe_delete,
        "dedup_batch": _stub_dedup,
    },
    "bookkeeping_only": {  # hash/dedup/merge kept; scoring stubbed
        "rgd_heuristic": _stub_rgd,
        "rgd_heuristic_with_flags": _stub_rgd_flags,
        "novelty_score_and_update": _stub_novelty,
    },
    # Finer decomposition within the bookkeeping path (scoring stubbed in
    # all of these so deltas isolate one component).
    "bk_no_merge": {
        "rgd_heuristic": _stub_rgd,
        "rgd_heuristic_with_flags": _stub_rgd_flags,
        "novelty_score_and_update": _stub_novelty,
        "_append_frontier": _stub_merge,
    },
    "bk_no_history": {
        "rgd_heuristic": _stub_rgd,
        "rgd_heuristic_with_flags": _stub_rgd_flags,
        "novelty_score_and_update": _stub_novelty,
        "_append_history": _stub_history,
    },
    "bk_no_step": {
        "rgd_heuristic": _stub_rgd,
        "rgd_heuristic_with_flags": _stub_rgd_flags,
        "novelty_score_and_update": _stub_novelty,
        "expand_children": _stub_expand,
    },
    "bk_no_hashset": {
        "rgd_heuristic": _stub_rgd,
        "rgd_heuristic_with_flags": _stub_rgd_flags,
        "novelty_score_and_update": _stub_novelty,
        "probe_and_insert": _stub_probe_insert,
        "probe_delete": _stub_probe_delete,
    },
    "bk_no_dedup": {
        "rgd_heuristic": _stub_rgd,
        "rgd_heuristic_with_flags": _stub_rgd_flags,
        "novelty_score_and_update": _stub_novelty,
        "dedup_batch": _stub_dedup,
    },
    "vec_step": {"step": _vec_step},  # full pipeline, vector-closure step
}

only = os.environ.get("PW_VARIANTS")
if only:
    names = [v.strip() for v in only.split(",")]
else:
    names = list(VARIANTS)

EXPANDS = [int(x) for x in os.environ.get("PW_EXPANDS", "256").split(",")]


def time_variant(vname: str, expand: int):
    for k, v in ORIG.items():
        setattr(B, k, v)
    for k, v in VARIANTS[vname].items():
        setattr(B, k, v)
    # Same shapes + config => same jit cache key across variants: drop the
    # in-memory trace cache so each variant really compiles its own program
    # (the persistent disk cache is keyed on HLO and stays valid).
    B.run_chunk.clear_cache()
    B._init_state_jit.clear_cache()
    try:
        planner = B.BatchedPlanner(
            puzzle, cp=cp, tables=tables, expand=expand,
            frontier_capacity=1 << 15, visited_bits=21,
            history_capacity=1 << 21, max_depth=depth, use_novelty=True,
            lazy=os.environ.get("PW_LAZY", "0") == "1",
        )
        cfg = planner.config
        print(f"# [{vname} x{expand}] init_state...", flush=True)
        s = planner.init_state()
        print(f"# [{vname} x{expand}] first chunk (compile)...", flush=True)
        t0 = time.monotonic()
        s = B.run_chunk(cp, tables, cfg, s, CHUNK)
        np.asarray(B.search_status(s))
        compile_and_first = time.monotonic() - t0
        times = []
        for _ in range(REPS):
            t0 = time.monotonic()
            s = B.run_chunk(cp, tables, cfg, s, CHUNK)
            stat = np.asarray(B.search_status(s))
            times.append(time.monotonic() - t0)
        best = min(times)
        it_ms = best / CHUNK * 1e3
        print(
            json.dumps(
                {
                    "variant": vname,
                    "expand": expand,
                    "chunk_s": round(best, 3),
                    "iter_ms": round(it_ms, 2),
                    "expansions_per_s": int(expand * CHUNK / best),
                    "first_chunk_s": round(compile_and_first, 1),
                    "iters_done": int(stat[6]),
                    "solved": bool(stat[0]),
                }
            ),
            flush=True,
        )
    finally:
        for k, v in ORIG.items():
            setattr(B, k, v)


for expand in EXPANDS:
    for vname in names:
        time_variant(vname, expand)

# Native planner expansions/s on the same instance for scale.
try:
    from pushworld_tpu.native.bridge import _load, solve_native

    t0 = time.monotonic()
    try:
        solve_native(puzzle, compiled=cp, mode="N+RGD", time_limit=5.0)
    except TimeoutError:
        pass
    # out_expansions isn't returned by the wrapper; re-call with max_expansions
    # budget instead: time a bounded run.
    t0 = time.monotonic()
    try:
        solve_native(
            puzzle, compiled=cp, mode="N+RGD", time_limit=None,
            max_expansions=2_000_000,
        )
    except TimeoutError:
        pass
    dt = time.monotonic() - t0
    print(
        json.dumps(
            {"variant": "native_serial", "expansions_per_s": int(2_000_000 / dt)}
        ),
        flush=True,
    )
except Exception as e:
    print(f"# native comparison failed: {e}", flush=True)
