#!/usr/bin/env python
"""Measure this host's raw CPU capacity curve: total throughput of a pure
numpy burn loop at several process counts.

This is the control experiment behind the scaling evidence in BENCH.md: it
bounds what ANY CPU-bound job (engine or not) can achieve going N → 4N
worker processes on this VM.  If the hardware itself delivers only k× more
work at 4N processes, a wall-clock scaling efficiency of k/4 is the
machine's ceiling, not an engine property — a real cluster adds nodes, not
SMT siblings.

Usage: python scripts/capacity_curve.py [proc counts...]   (default 2 8 32)
Prints one JSON line: {"2": iters_per_sec_total, ...}
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np

BURN_SECONDS = 8.0


def _burn(out, i):
    # xorshift-ish integer mix over a small in-cache buffer: no memory
    # bandwidth pressure, pure ALU — the most scalable workload possible
    x = np.arange(1 << 14, dtype=np.uint64)
    it = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < BURN_SECONDS:
        x ^= x << np.uint64(13)
        x ^= x >> np.uint64(7)
        x ^= x << np.uint64(17)
        it += 1
    out[i] = it


def measure(nproc: int) -> float:
    out = mp.Array("d", nproc)
    procs = [mp.Process(target=_burn, args=(out, i)) for i in range(nproc)]
    t0 = time.perf_counter()
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    wall = time.perf_counter() - t0
    return sum(out) * (1 << 14) / wall  # element-iterations/sec, all procs


def main() -> None:
    counts = [int(x) for x in sys.argv[1:]] or [2, 8, 32]
    res = {}
    for n in counts:
        res[str(n)] = round(measure(n) / 1e6, 1)  # M elem-iters/s total
    lo, hi = str(min(counts)), str(max(counts))
    res["curve"] = round(res[hi] / res[lo], 2)
    res["ideal"] = max(counts) / min(counts)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
