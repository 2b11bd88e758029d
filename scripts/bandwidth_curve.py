#!/usr/bin/env python
"""Measure this host's DRAM-bandwidth capacity curve: total bytes/s of a
big-buffer memcpy loop at several process counts.

Companion control to scripts/capacity_curve.py (pure-ALU burn): together
they bound what ANY job on this VM can achieve going N → 4N worker
processes for the two shared resources (CPU capacity, memory bandwidth).
Buffers are warmed before timing — first-touch page faults cost ~50 ms/MB
in this kernel and would otherwise consume the whole burn window.

Usage: python scripts/bandwidth_curve.py [proc counts...]  (default 2 8 16 32)
Prints one JSON line: {"2": GB_per_s_total, ...}
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np

BURN_SECONDS = 6.0
BUF_BYTES = 64 * 1024 * 1024


def _burn(out, i):
    a = np.zeros(BUF_BYTES, dtype=np.uint8)
    b = np.zeros_like(a)
    np.copyto(b, a)
    np.copyto(a, b)  # both buffers faulted before the clock starts
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < BURN_SECONDS:
        np.copyto(b, a)
        n += 1
        np.copyto(a, b)
        n += 1
    out[i] = n * a.size / (time.perf_counter() - t0)


def main() -> None:
    counts = [int(x) for x in sys.argv[1:]] or [2, 8, 16, 32]
    res: dict[int, float] = {}
    for procs in counts:
        with mp.Manager() as m:
            out = m.dict()
            ps = [mp.Process(target=_burn, args=(out, i))
                  for i in range(procs)]
            for p in ps:
                p.start()
            for p in ps:
                p.join()
            res[procs] = round(sum(out.values()) / 1e9, 2)
    print(json.dumps({str(k): v for k, v in res.items()}))


if __name__ == "__main__":
    main()
