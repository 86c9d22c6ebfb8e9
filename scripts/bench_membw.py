"""Box memory-bandwidth ceiling — context for BENCH.md's scaling numbers.

The two-parallelism scaling proxy (local[N] vs local[4N], pinned with
taskset) shares ONE machine's DRAM controllers. If N pinned cores can
already pull a large fraction of the box's total achievable bandwidth,
then a byte-heavy job (html scan, lz4 decode of the cached corpus, Arrow
batches) is capped well below 4x from N->4N threads no matter how
perfectly it parallelizes — while a real N->4N *executor* fleet
multiplies DRAM bandwidth with nodes. This measures the ceiling
directly: P processes, each pinned to core i, stream-copy a buffer far
bigger than LLC; the reported figure per level is the SUM of per-process
copy bandwidth (read+write bytes).

Usage: python scripts/bench_membw.py [P ...]   (default: 1 4 8 16 32)
Writes BENCH_membw.json.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

BUF_MB = 256
SECS = 4.0


def _worker(core: int, q) -> None:
    os.sched_setaffinity(0, {core})
    src = np.ones(BUF_MB * 1024 * 1024 // 8, dtype=np.int64)
    dst = np.empty_like(src)
    # warm-up touch (page faults out of the timed loop)
    np.copyto(dst, src)
    n = 0
    t0 = time.monotonic()
    while time.monotonic() - t0 < SECS:
        np.copyto(dst, src)
        n += 1
    dt = time.monotonic() - t0
    q.put(2 * n * src.nbytes / dt)  # read + write


def run(p: int) -> float:
    q: mp.Queue = mp.Queue()
    procs = [mp.Process(target=_worker, args=(i, q)) for i in range(p)]
    for pr in procs:
        pr.start()
    vals = [q.get() for _ in procs]
    for pr in procs:
        pr.join()
    return sum(vals) / 1e9


def main() -> int:
    levels = [int(a) for a in sys.argv[1:]] or [1, 4, 8, 16, 32]
    out = {}
    for p in levels:
        gbps = run(p)
        out[str(p)] = round(gbps, 1)
        print(f"{p} procs: {gbps:.1f} GB/s aggregate", flush=True)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH_membw.json"), "w") as f:
        json.dump({"buf_mb": BUF_MB, "secs_per_level": SECS, "gbps_by_procs": out}, f, indent=2)
    print("wrote BENCH_membw.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
