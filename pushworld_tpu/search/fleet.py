"""Heterogeneous fleet executor: benchmark-set planning throughput.

The reference benchmark harness runs planner subprocesses strictly
sequentially on one core (reference: python3/src/pushworld/benchmark_rgd.py:
70-84).  This framework's unit of value is *throughput*: a work-stealing
scheduler drives

  - N host worker threads running the native serial planner (the ctypes
    call releases the GIL, so workers overlap fully), popping puzzles from
    the FRONT of a shared queue, and
  - one device worker running the group-vmapped batched search
    (:func:`pushworld_tpu.parallel.sharded.solve_group`), claiming batches
    from the BACK of the queue so it never contends with the host workers
    for the same instance.

Every puzzle gets the reference protocol's per-puzzle budget for its single
attempt (time limit per attempt; failures are classified exactly like the
reference harness: time limit / no solution / memory error / invalid plan).
"""

import os
import threading
import time
from collections import deque
from typing import Dict, List, Optional, Sequence, Tuple

from pushworld_tpu.core.puzzle import Puzzle
from pushworld_tpu.search.planner import PlanResult

__all__ = ["plan_puzzles_fleet"]


def _classify(puzzle: Puzzle, plan: Optional[List[int]], dt: float) -> PlanResult:
    if plan is None:
        return PlanResult(None, dt, "no solution")
    if plan == [] or puzzle.is_valid_plan(plan):
        return PlanResult(plan, dt, None)
    return PlanResult(plan, dt, "invalid plan")


def plan_puzzles_fleet(
    named_puzzles: Sequence[Tuple[str, Puzzle]],
    mode: str = "N+RGD",
    time_limit: Optional[float] = 60.0,
    native_workers: Optional[int] = None,
    device_worker: bool = True,
    group_size: int = 16,
    device_claim_delay: float = 2.0,
    progress: bool = False,
    **group_kwargs,
) -> Dict[str, PlanResult]:
    """Solves a set of puzzles with the heterogeneous fleet.

    ``native_workers`` defaults to the host CPU count.  The device worker is
    used when JAX reports an accelerator backend (or ``device_worker`` is
    forced truthy via the string "force" for tests).  It claims a group only
    after ``device_claim_delay`` seconds AND while the queue holds more than
    the host workers' reserve — on easy sets the host workers drain the
    queue before the device ever engages (per-instance native solves are
    milliseconds; device engagement costs tunnel transfers), while on hard
    sets the device takes whole groups off the back in parallel.
    """
    if native_workers is None:
        native_workers = max(1, os.cpu_count() or 1)

    try:
        from pushworld_tpu.native import bridge

        native_ok = bridge.is_available()
    except Exception:
        native_ok = False

    use_device = bool(device_worker)
    if device_worker != "force":
        import jax

        use_device = use_device and (
            jax.default_backend() != "cpu" or not native_ok
        )

    results: Dict[str, PlanResult] = {}
    lock = threading.Lock()
    dq: deque = deque(named_puzzles)
    # Host workers keep at least this many instances for themselves; the
    # device claims groups beyond the reserve.
    reserve = 2 * native_workers if native_ok else 0

    def record(name: str, r: PlanResult) -> None:
        with lock:
            results[name] = r
        if progress:
            status = "ok" if r.failure_reason is None else r.failure_reason
            print(f"  {name}: {status} ({r.planning_time:.2f}s)", flush=True)

    def native_loop() -> None:
        while True:
            with lock:
                if not dq:
                    return
                name, puzzle = dq.popleft()
            t0 = time.monotonic()
            try:
                plan = bridge.solve_native(
                    puzzle, mode=mode, time_limit=time_limit
                )
                r = _classify(puzzle, plan, time.monotonic() - t0)
                r.solver = "native"
                record(name, r)
            except TimeoutError:
                record(name, PlanResult(None, time.monotonic() - t0, "time limit"))
            except MemoryError:
                record(name, PlanResult(None, time.monotonic() - t0, "memory error"))
            except Exception as e:  # pragma: no cover - defensive
                record(name, PlanResult(None, time.monotonic() - t0, f"error: {e}"))

    def host_fallback_loop() -> None:
        # No native library: the host oracle planner fills in (slow; used
        # only in minimal environments).
        from pushworld_tpu.search.host_planner import solve_host

        while True:
            with lock:
                if not dq:
                    return
                name, puzzle = dq.popleft()
            t0 = time.monotonic()
            try:
                plan = solve_host(puzzle, mode=mode, time_limit=time_limit)
                r = _classify(puzzle, plan, time.monotonic() - t0)
                r.solver = "host"
                record(name, r)
            except TimeoutError:
                record(name, PlanResult(None, time.monotonic() - t0, "time limit"))

    def device_loop() -> None:
        from pushworld_tpu.core.compiled import compute_delta
        from pushworld_tpu.parallel.sharded import solve_group
        from pushworld_tpu.search.batched import required_depth
        from pushworld_tpu.search.planner import _profile_for

        # Device memory budget for the stacked distance tables; lanes per
        # sub-group are snapped to powers of two so only a handful of
        # program shapes ever compile.
        table_budget = float(
            os.environ.get("PW_DEVICE_TABLE_BUDGET_GB", "4")
        ) * 1e9

        def lanes_for(profile, depth):
            n, dim = profile[0], profile[1]
            rows = 1 if depth == 0 else n
            bytes_per_lane = rows * (dim * dim) ** 2 * 2  # uint16 D tables
            lanes = max(1, int(table_budget // max(bytes_per_lane, 1)))
            lanes = min(lanes, group_size)
            # snap down to a power of two
            p = 1
            while p * 2 <= lanes:
                p *= 2
            return p

        start = time.monotonic()
        while True:
            with lock:
                remaining = len(dq)
            if remaining == 0:
                return
            if (
                remaining - reserve < 2
                or time.monotonic() - start < device_claim_delay
            ):
                time.sleep(0.05)
                continue
            with lock:
                avail = len(dq) - reserve
                if avail < 2:
                    continue
                group = [dq.pop() for _ in range(min(group_size, avail))]
            group.reverse()
            # Partition the claim by (shape profile, RGD depth): lanes of a
            # sub-group share one compiled program and one table footprint.
            subs = {}
            for name, p in group:
                prof = _profile_for(
                    p.num_movables, max(p.height, p.width), compute_delta(p)
                )
                subs.setdefault((prof, required_depth(p)), []).append((name, p))
            processed = set()
            try:
                for (prof, depth), sub in subs.items():
                    lanes = lanes_for(prof, depth)
                    for i in range(0, len(sub), lanes):
                        chunk_named = sub[i : i + lanes]
                        rs = solve_group(
                            chunk_named,
                            mode=mode,
                            time_limit=time_limit,
                            max_depth=depth,
                            pad_group_to=lanes,
                            **group_kwargs,
                        )
                        for name, _ in chunk_named:
                            r = rs[name]
                            r.solver = "device"
                            record(name, r)
                            processed.add(name)
            except Exception:
                # Give the unprocessed rest of the claim back to the host
                # workers.
                with lock:
                    dq.extend(g for g in group if g[0] not in processed)
                return

    threads: List[threading.Thread] = []
    if native_ok:
        for _ in range(native_workers):
            threads.append(threading.Thread(target=native_loop, daemon=True))
    else:
        threads.append(threading.Thread(target=host_fallback_loop, daemon=True))
    if use_device:
        threads.append(threading.Thread(target=device_loop, daemon=True))
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # Anything still queued (device gave a group back after host workers
    # exited) is finished here on the main thread.
    while dq:
        name, puzzle = dq.popleft()
        t0 = time.monotonic()
        try:
            if native_ok:
                plan = bridge.solve_native(puzzle, mode=mode, time_limit=time_limit)
            else:
                from pushworld_tpu.search.host_planner import solve_host

                plan = solve_host(puzzle, mode=mode, time_limit=time_limit)
            record(name, _classify(puzzle, plan, time.monotonic() - t0))
        except TimeoutError:
            record(name, PlanResult(None, time.monotonic() - t0, "time limit"))
        except MemoryError:
            record(name, PlanResult(None, time.monotonic() - t0, "memory error"))
    return results
