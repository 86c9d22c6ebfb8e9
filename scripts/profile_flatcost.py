"""Decompose the frontier round's parallelism-independent cost c.

PROFILE.md's model fit gives c ≈ 12 s/round at 6M URLs. This script
measures the driver-serial ingredients DIRECTLY so the floor is pinned to
named constants instead of a fit residual:

1. per-job driver latency — time N trivial actions (spark.range(1)
   count) back-to-back; multiplied by the round's job count this is the
   pure scheduling floor;
2. jobs + stages in one kernel round — counted via the status tracker
   around an isolated kernel invocation (setup excluded by reading the
   tracker before/after the timed section is not possible from outside
   the kernel, so the whole call is counted and the setup jobs are
   listed separately at 50k where work ≈ 0);
3. Bloom build + broadcast — timed as state setup vs the probe's
   contribution to the round (the probe is map-side JVM expressions);
4. Python-worker warm-up — first vs second invocation of a trivial
   mapInArrow stage (worker pool reuse makes this a once-per-session
   cost, but AQE can re-plan UDF stages per round).

Usage: python scripts/profile_flatcost.py [n_urls]
Prints one JSON line. Run solo (CLAUDE.md: never run a second Spark
session while measuring).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _timed(fn, n=5):
    walls = []
    for _ in range(n):
        t0 = time.monotonic()
        fn()
        walls.append(time.monotonic() - t0)
    return walls


def main() -> None:
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_hosts = max(n_urls // 500, 100)
    import bench
    from crawler_spark.benchmarks import frontier_round_kernel

    spark = bench.make_spark(32)
    sc = spark.sparkContext
    out: dict = {"n_urls": n_urls}

    # 1. pure per-job driver latency (empty work)
    spark.range(1).count()  # JIT
    walls = _timed(lambda: spark.range(1).count(), 10)
    out["empty_job_sec"] = round(min(walls), 4)

    # 4. Python-worker warm-up (trivial Arrow stage, cold vs warm)
    import pandas as pd

    def ident(it):
        for b in it:
            yield b

    df = spark.range(0, 32, 1, 32)
    walls = _timed(lambda: df.mapInArrow(ident, "id long").count(), 3)
    out["arrow_stage_cold_sec"] = round(walls[0], 3)
    out["arrow_stage_warm_sec"] = round(min(walls[1:]), 3)

    # 2+3. count jobs/stages across one kernel call (setup + round), at a
    # size where scalable work ≈ 0 — the wall IS the flat cost
    frontier_round_kernel(spark, n_urls=max(n_urls // 10, 10_000), n_hosts=max(n_hosts // 10, 100))
    tracker = sc.statusTracker()
    j0 = set(tracker.getJobIdsForGroup(None) or [])
    t0 = time.monotonic()
    r = frontier_round_kernel(spark, n_urls=n_urls, n_hosts=n_hosts)
    out["kernel_call_wall_sec"] = round(time.monotonic() - t0, 3)
    j1 = set(tracker.getJobIdsForGroup(None) or [])
    new_jobs = sorted(j1 - j0)
    out["jobs_in_call"] = len(new_jobs)
    stages = 0
    for j in new_jobs:
        info = tracker.getJobInfo(j)
        if info:
            stages += len(info.stageIds)
    out["stages_in_call"] = stages
    out["round_wall_sec"] = r["round_wall_sec"]
    out["canary_sec"] = r.get("canary_sec")
    out["job_floor_sec"] = round(out["jobs_in_call"] * out["empty_job_sec"], 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
