"""Per-stage wall decomposition of one frontier-round kernel run.

Runs warm-up (1/10 size) + ONE measured round at bench.py's kernel point
with the Spark UI enabled, then dumps every stage of the measured window
from the REST API (duration, task time, shuffle bytes, name) sorted by
duration. Usage: python scripts/profile_stages.py [n_urls]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 6_000_000
    n_hosts = max(n_urls // 500, 1_000)
    import bench
    from crawler_spark.benchmarks import frontier_round_kernel

    os.environ.setdefault("BENCH_UI", "1")
    from pyspark.sql import SparkSession

    # bench session + UI
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("stage-profile")
        .config("spark.sql.shuffle.partitions", "128")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "50000")
        .config("spark.rdd.compress", "true")
        .config("spark.driver.memory", "64g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    frontier_round_kernel(spark, n_urls=n_urls // 10, n_hosts=n_hosts // 10)
    t_mark = time.time() * 1000.0
    res = frontier_round_kernel(spark, n_urls=n_urls, n_hosts=n_hosts)
    print(json.dumps(res))

    ui = spark.sparkContext.uiWebUrl
    app = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages?status=complete")
    )
    rows = []
    for s in stages:
        sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
        if not sub:
            continue
        # REST timestamps are GMT ('...T03:02:19.123GMT') — parse as UTC
        # (timegm), NOT mktime/local, or the t_mark window filter shifts by
        # the host's UTC offset and drops/pollutes the measured stages.
        # Keep the .%f milliseconds: t_mark has ms resolution, so a
        # seconds-truncated parse can slip a stage across the window edge.
        import calendar

        def _ms(tstr):
            ms = calendar.timegm(time.strptime(tstr[:19], "%Y-%m-%dT%H:%M:%S")) * 1000
            if len(tstr) > 19 and tstr[19] == "." and tstr[20:23].isdigit():
                ms += int(tstr[20:23].ljust(3, "0"))
            return ms

        t0 = _ms(sub)
        if t0 < t_mark - 1000:
            continue
        comp = s.get("completionTime")
        t1 = _ms(comp) if comp else t0
        rows.append(
            {
                "stage": s["stageId"],
                "wall_s": round((t1 - t0) / 1000, 1),
                "task_s": round(s.get("executorRunTime", 0) / 1000, 1),
                "tasks": s.get("numCompleteTasks"),
                "sh_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
                "sh_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
                "name": (s.get("name") or "")[:70],
            }
        )
    rows.sort(key=lambda r: -r["wall_s"])
    for r in rows[:25]:
        print(json.dumps(r))
    print(
        json.dumps(
            {
                "n_stages": len(rows),
                "sum_stage_wall_s": round(sum(r["wall_s"] for r in rows), 1),
                "round_wall_s": res["round_wall_sec"],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
