"""Multi-process benchmark CLI: every process runs the same command; the
puzzle set is sharded round-robin across processes and each process prints
(and optionally writes) the COMPLETE merged results.

    PW_COORDINATOR=host0:12345 PW_NUM_PROCESSES=4 PW_PROCESS_ID=<i> \
        python -m pushworld_tpu.scripts.benchmark_distributed <puzzles_dir>

The reference has no distributed runtime (its harness is a sequential
single-process loop, reference: python3/src/pushworld/benchmark_rgd.py:70-84);
this is the SURVEY §2e scale-out axis.
"""

import argparse
import json
import os
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("puzzles_dir", help="directory of .pwp puzzles")
    ap.add_argument("--mode", default="N+RGD", choices=["RGD", "N+RGD"])
    ap.add_argument("--time-limit", type=float, default=60.0)
    ap.add_argument("--no-fleet", action="store_true",
                    help="per-puzzle planner instead of the fleet executor")
    ap.add_argument("--native-workers", type=int, default=None,
                    help="host planner threads per process (default: CPU "
                         "count; pin to 1 for scaling-efficiency runs)")
    ap.add_argument("--out", default=None,
                    help="write merged results as JSON to this path")
    ap.add_argument("--platform", default=None,
                    help="force a JAX platform (e.g. cpu) before "
                         "distributed init — some TPU plugins ignore the "
                         "JAX_PLATFORMS env var")
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from pushworld_tpu.core.puzzle import Puzzle
    from pushworld_tpu.parallel.distributed import (
        initialize_from_env,
        plan_puzzles_distributed,
    )
    from pushworld_tpu.utils.filesystem import get_puzzle_file_paths

    pid, nproc = initialize_from_env()
    paths = get_puzzle_file_paths(args.puzzles_dir)
    named = [(n, Puzzle.from_file(paths[n])) for n in sorted(paths)]

    kwargs = {}
    if args.native_workers is not None:
        kwargs["native_workers"] = args.native_workers

    import time

    t0 = time.monotonic()
    results = plan_puzzles_distributed(
        named, mode=args.mode, time_limit=args.time_limit,
        use_fleet=not args.no_fleet, **kwargs,
    )
    wall = time.monotonic() - t0
    doc = {
        "process_id": pid,
        "n_processes": nproc,
        "solved": sum(1 for r in results.values() if r.failure_reason is None),
        "count": len(results),
        "wall_s": round(wall, 3),
        "results": {
            n: {
                "plan": r.plan,
                "planning_time": r.planning_time,
                "failure_reason": r.failure_reason,
                "solver": r.solver,
            }
            for n, r in sorted(results.items())
        },
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(doc, f)
    print(
        json.dumps(
            {
                k: doc[k]
                for k in (
                    "process_id", "n_processes", "solved", "count", "wall_s"
                )
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
