"""Multi-process (multi-host) benchmark planning.

The reference has no distributed runtime (SURVEY.md §2e); its benchmark
harness is a sequential single-process loop (reference:
python3/src/pushworld/benchmark_rgd.py:70-84).  Here the natural axis —
independent puzzles — is sharded across *processes* (one per host /
TPU slice), each of which runs the local fleet/planner on its own devices;
per-puzzle results are exchanged at the end with a JSON all-gather over the
jax.distributed KV store (tiny payloads; no device collectives needed for
an embarrassingly parallel workload).

Launch (same command on every host):

    PW_COORDINATOR=host0:12345 PW_NUM_PROCESSES=4 PW_PROCESS_ID=<i> \
        python -m pushworld_tpu.scripts.benchmark_distributed <puzzles_dir>

or rely on the TPU metadata auto-detection built into
``jax.distributed.initialize()``.
"""

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

from pushworld_tpu.core.puzzle import Puzzle
from pushworld_tpu.search.planner import PlanResult

__all__ = [
    "initialize_from_env",
    "shard_puzzles",
    "plan_puzzles_distributed",
]


def initialize_from_env() -> Tuple[int, int]:
    """Initializes jax.distributed from PW_* env vars (or JAX's own
    auto-detection when they are absent).  Returns (process_id, n_processes).
    Safe to call when already initialized or single-process."""
    import jax

    coord = os.environ.get("PW_COORDINATOR")
    if coord:
        nproc = int(os.environ["PW_NUM_PROCESSES"])
        pid = int(os.environ["PW_PROCESS_ID"])
        jax.distributed.initialize(
            coordinator_address=coord, num_processes=nproc, process_id=pid
        )
    else:
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single-process
    return jax.process_index(), jax.process_count()


def shard_puzzles(
    named_puzzles: Sequence[Tuple[str, Puzzle]],
    process_id: int,
    n_processes: int,
) -> List[Tuple[str, Puzzle]]:
    """Deterministic difficulty-balanced shard.

    Instances are ordered by a difficulty proxy (movable count, grid area)
    and dealt round-robin, so every process receives an interleaved slice
    of the difficulty distribution and all processes finish within about
    one per-puzzle budget of each other.  (A name-ordered round-robin can
    hand one process most of the budget-burning misses — the skewed
    process then outlives the others by minutes, which trips the
    coordination service's cross-process barrier timeout at the result
    exchange/shutdown.)"""
    order = sorted(
        range(len(named_puzzles)),
        key=lambda i: (
            named_puzzles[i][1].num_movables,
            named_puzzles[i][1].height * named_puzzles[i][1].width,
            named_puzzles[i][0],
        ),
    )
    return [
        named_puzzles[j]
        for k, j in enumerate(order)
        if k % n_processes == process_id
    ]


def _result_to_json(name: str, r: PlanResult) -> str:
    return json.dumps(
        {
            "puzzle": name,
            "plan": r.plan,
            "planning_time": r.planning_time,
            "failure_reason": r.failure_reason,
            "solver": r.solver,
        }
    )


def _results_from_json(blob: str) -> Dict[str, PlanResult]:
    out = {}
    for rec in json.loads(blob):
        d = json.loads(rec)
        out[d["puzzle"]] = PlanResult(
            plan=d["plan"],
            planning_time=d["planning_time"],
            failure_reason=d["failure_reason"],
            solver=d.get("solver", ""),
        )
    return out


def plan_puzzles_distributed(
    named_puzzles: Sequence[Tuple[str, Puzzle]],
    mode: str = "N+RGD",
    time_limit: Optional[float] = 60.0,
    use_fleet: bool = True,
    **kwargs,
) -> Dict[str, PlanResult]:
    """Plans the full set across all processes; every process returns the
    COMPLETE result dict (per-puzzle results are exchanged through the
    coordinator's KV store — kilobytes, not device traffic)."""
    import jax

    pid, nproc = jax.process_index(), jax.process_count()
    local = shard_puzzles(named_puzzles, pid, nproc)

    if use_fleet:
        from pushworld_tpu.search.fleet import plan_puzzles_fleet

        local_results = plan_puzzles_fleet(
            local, mode=mode, time_limit=time_limit, **kwargs
        )
    else:
        from pushworld_tpu.search.planner import plan_puzzles

        local_results = plan_puzzles(
            local, mode=mode, time_limit=time_limit, **kwargs
        )

    if nproc == 1:
        return local_results

    # Exchange results with the PUBLIC cross-process API: serialize each
    # process's result dict to bytes and process_allgather them (two tiny
    # collectives: lengths, then max-length-padded payloads).  Payloads are
    # kilobytes, so riding the device collective path costs nothing and
    # avoids any private coordinator-client API.
    import numpy as np
    from jax.experimental import multihost_utils

    blob = json.dumps(
        [_result_to_json(n, r) for n, r in local_results.items()]
    ).encode()
    lens = np.asarray(
        multihost_utils.process_allgather(np.int32(len(blob)))
    ).reshape(-1)
    buf = np.zeros((int(lens.max()),), np.uint8)
    buf[: len(blob)] = np.frombuffer(blob, np.uint8)
    all_bufs = np.asarray(multihost_utils.process_allgather(buf))

    merged: Dict[str, PlanResult] = {}
    for other in range(nproc):
        other_blob = bytes(all_bufs[other][: int(lens[other])]).decode()
        merged.update(_results_from_json(other_blob))
    return merged
