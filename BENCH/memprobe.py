"""Memory-bandwidth probe (no Spark): STREAM-like numpy triad at N vs 4N
processes.  The busy-loop CPU probe in scaling.py is register-only — it shows
whether CORES are available; this one shows whether the single box's MEMORY
BUS can feed 4N of them.  Parse/canonicalize/dedup are string/memory-heavy,
so if this probe caps below 1.0, that cap applies to any memory-bound
workload on the box — and is exactly the resource a multi-executor cluster
scales per-node (each node brings its own memory channels).

Usage: python BENCH/memprobe.py [lo hi]   (default 4 16)
Prints one JSON line: {"lo": .., "hi": .., "GBps": {...}, "efficiency": ..}
"""

from __future__ import annotations

import json
import multiprocessing
import sys
import time

import numpy as np

ARR_MB = 128
SECS = 3.0


def _triad(out) -> None:
    n = ARR_MB * 1024 * 1024 // 8
    a = np.ones(n)
    b = np.ones(n)
    c = np.empty(n)
    t_end = time.monotonic() + SECS
    it = 0
    while time.monotonic() < t_end:
        np.multiply(b, 2.0, out=c)
        np.add(c, a, out=c)
        it += 1
    # triad reads a+b, writes c (+read-for-ownership): ~4 arrays moved/iter
    out.put(it * 4 * ARR_MB / 1024.0)  # GB moved


def run(n: int) -> float:
    q: multiprocessing.Queue = multiprocessing.Queue()
    ps = [multiprocessing.Process(target=_triad, args=(q,)) for _ in range(n)]
    t0 = time.monotonic()
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return round(total / (time.monotonic() - t0), 2)


def main() -> None:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    res = {str(n): run(n) for n in (lo, hi)}
    eff = round(res[str(hi)] / (res[str(lo)] * (hi / lo)), 3)
    print(json.dumps({"lo": lo, "hi": hi, "GBps": res, "efficiency": eff}))


if __name__ == "__main__":
    main()
