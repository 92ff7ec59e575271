#!/usr/bin/env python
"""Populates scripts_dev/baseline_cache.json for bench.py.

Runs the reference C++ planner sequentially under the reference protocol
(rlimit CPU + 30 GB AS) on the given set spec/budget and records the
result keyed by (set spec, budget, reference binary hash).  bench.py
reads this cache so the official capture never re-races the ~10-minute
sequential baseline inside the driver's wall-clock budget (the round-3
capture timed out doing exactly that).

Usage: python scripts_dev/populate_baseline_cache.py [SPEC] [BUDGET]
"""

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import bench  # noqa: E402  (repo-root bench.py; jax-free helpers)


def main():
    spec = sys.argv[1] if len(sys.argv) > 1 else "level1:12,level2:18,level3:18,level4:6"
    budget = float(sys.argv[2]) if len(sys.argv) > 2 else 20.0
    if not bench.build_reference_planner():
        print("reference planner unavailable", file=sys.stderr)
        sys.exit(1)
    named, paths = bench.load_set(spec)
    solved, wall = bench.run_reference_baseline(named, paths, budget)
    entry = bench.baseline_cache_store(spec, budget, solved, wall)
    print(json.dumps(entry))


if __name__ == "__main__":
    main()
