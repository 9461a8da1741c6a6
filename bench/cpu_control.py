"""Pure-CPU control run: measures the SANDBOX HARDWARE's own scaling
ceiling, printed alongside the Spark scaling number in BENCH/BASELINE.md.

Spawns P independent processes each running an identical fixed-size
pure-Python/numpy workload (no Spark, no IPC, no shared state).  On ideal
hardware aggregate throughput scales linearly in P; on this box per-core
clocks droop as cores activate, so the control quantifies how much of any
Spark efficiency shortfall is silicon, not code.

Usage: python bench/cpu_control.py [--levels 4,16] [--repeats 3]
Prints one JSON line per level plus the control efficiency between the
first and last level.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time

WORK_ITERS = 2_000_000


def burn(_):
    t0 = time.perf_counter()
    acc = 0
    for i in range(WORK_ITERS):
        acc += i * i & 0xFFFF
    return time.perf_counter() - t0


def run_level(procs: int) -> float:
    """Aggregate throughput (work-units/sec) with `procs` busy processes."""
    with mp.Pool(procs) as pool:
        t0 = time.perf_counter()
        pool.map(burn, range(procs * 3))  # 3 waves per proc
        wall = time.perf_counter() - t0
    return (procs * 3) / wall


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="4,16")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]
    best = {}
    for lv in levels:
        best[lv] = max(run_level(lv) for _ in range(args.repeats))
        print(json.dumps({"procs": lv, "work_units_per_sec": round(best[lv], 2)}))
    lo, hi = levels[0], levels[-1]
    ratio = best[hi] / best[lo]
    print(
        json.dumps(
            {
                "control_speedup": round(ratio, 3),
                "control_efficiency": round(ratio / (hi / lo), 3),
                "note": "hardware ceiling: Spark cannot scale better than this",
            }
        )
    )


if __name__ == "__main__":
    main()
