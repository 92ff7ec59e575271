"""Fleet executor tests (CPU; the device worker is forced where exercised).

Reference analog: the benchmark harness solves puzzles strictly
sequentially (benchmark_rgd.py:70-84); the fleet is this framework's
scheduler replacement, so the contract tested here is result-for-result
parity with per-puzzle solving plus correct failure classification.
"""

import os

import pytest

from pushworld_tpu import config
from pushworld_tpu.core.puzzle import Puzzle
from pushworld_tpu.search.fleet import plan_puzzles_fleet
from pushworld_tpu.utils.filesystem import get_puzzle_file_paths


def _benchmark_set(level, count):
    root = os.path.join(config.BENCHMARK_PUZZLES_PATH, level)
    if not os.path.isdir(root):
        pytest.skip("benchmark dataset unavailable")
    paths = get_puzzle_file_paths(root)
    names = sorted(paths)[:count]
    return [(n, Puzzle.from_file(paths[n])) for n in names]


def test_fleet_native_workers_solve_and_validate():
    named = _benchmark_set("level1", 8)
    results = plan_puzzles_fleet(
        named, time_limit=30.0, native_workers=2, device_worker=False
    )
    assert set(results) == {n for n, _ in named}
    for name, puzzle in named:
        r = results[name]
        assert r.failure_reason is None, (name, r.failure_reason)
        assert r.plan == [] or puzzle.is_valid_plan(r.plan)
        assert r.solver in ("native", "host")


def test_fleet_device_worker_participates(puzzles_dir):
    named = _benchmark_set("level1", 6)
    results = plan_puzzles_fleet(
        named,
        time_limit=60.0,
        native_workers=0,
        device_worker="force",
        group_size=2,
        device_claim_delay=0.0,
    )
    assert set(results) == {n for n, _ in named}
    for name, puzzle in named:
        r = results[name]
        assert r.failure_reason is None, (name, r.failure_reason)
        assert r.plan == [] or puzzle.is_valid_plan(r.plan)
    # With no native workers the device claims every full group (the
    # sub-group remainder drains on the main thread).
    solvers = {results[n].solver for n, _ in named}
    assert "device" in solvers, solvers


def test_fleet_no_solution_classification(puzzles_dir):
    p = Puzzle.from_file(os.path.join(puzzles_dir, "no_solution.pwp"))
    results = plan_puzzles_fleet(
        [("ns", p)], time_limit=30.0, native_workers=1, device_worker=False
    )
    assert results["ns"].failure_reason == "no solution"
    assert results["ns"].plan is None


def test_fleet_work_stealing_no_loss_no_hang():
    # Host worker + forced device contend for a small set; the steal
    # channel (device lanes reclaimable by idle hosts) must neither lose
    # nor duplicate instances, and the run must terminate.
    named = _benchmark_set("level1", 7)
    results = plan_puzzles_fleet(
        named,
        time_limit=60.0,
        native_workers=1,
        device_worker="force",
        group_size=4,
        device_claim_delay=0.0,
        device_mode="claim",
    )
    assert set(results) == {n for n, _ in named}
    for name, puzzle in named:
        r = results[name]
        assert r.failure_reason is None, (name, r.failure_reason)
        assert r.plan == [] or puzzle.is_valid_plan(r.plan)


def test_fleet_shadow_mode_no_loss_no_hang():
    # Shadow mode: the device duplicates host-owned instances; every
    # instance must still get exactly one result, nothing may hang, and
    # every reported plan must validate (first SUCCESS wins the record).
    named = _benchmark_set("level1", 7)
    results = plan_puzzles_fleet(
        named,
        time_limit=60.0,
        native_workers=1,
        device_worker="force",
        group_size=4,
        device_claim_delay=0.0,
        device_mode="shadow",
    )
    assert set(results) == {n for n, _ in named}
    for name, puzzle in named:
        r = results[name]
        assert r.failure_reason is None, (name, r.failure_reason)
        assert r.plan == [] or puzzle.is_valid_plan(r.plan)


def test_native_cancel_flag_releases_worker():
    # The cooperative cancel flag must abort a native solve promptly.
    import threading
    import time as _time

    import numpy as np

    from pushworld_tpu.native import bridge

    if not bridge.is_available():
        pytest.skip("native planner unavailable")
    # A known budget-burner (stable 60 s miss) so the solve cannot finish
    # before the cancel fires.
    root = os.path.join(config.BENCHMARK_PUZZLES_PATH, "level3")
    if not os.path.isdir(root):
        pytest.skip("benchmark dataset unavailable")
    paths = get_puzzle_file_paths(root)
    if "Caged Key" not in paths:
        pytest.skip("instance unavailable")
    puzzle = Puzzle.from_file(paths["Caged Key"])
    cancel = np.zeros(1, np.int32)
    t = threading.Timer(0.3, lambda: cancel.__setitem__(0, 1))
    t.start()
    t0 = _time.monotonic()
    with pytest.raises(TimeoutError):
        bridge.solve_native(
            puzzle, mode="N+RGD", time_limit=60.0, cancel=cancel
        )
    assert _time.monotonic() - t0 < 10.0
