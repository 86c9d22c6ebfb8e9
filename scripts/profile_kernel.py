"""Stage-level profile of the frontier-round kernel at one parallelism.

Breaks the timed region of crawler_spark.benchmarks.frontier_round_kernel
into separately-materialized stages so a non-scaling stage is visible when
comparing local[8] vs local[32]. Run under taskset like bench_scaling.py:

    taskset -c 0-7  python scripts/profile_kernel.py 8  [n_urls]
    taskset -c 0-31 python scripts/profile_kernel.py 32 [n_urls]

Prints one JSON line per measured pass (first pass is warm-up).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark import StorageLevel  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from bench import make_spark  # noqa: E402
from crawler_spark.benchmarks import FETCH_BUCKETS, synth_frontier, synth_pages  # noqa: E402
from crawler_spark.frontier.canon import (  # noqa: E402
    canon_expr,
    flat_outlinks,
    host_bucket_expr,
    host_expr,
    url_hash_expr,
)
from crawler_spark.frontier.politeness import apply_politeness_budget  # noqa: E402
from crawler_spark.frontier.seen import BloomState, filter_unseen  # noqa: E402
from crawler_spark.scheduler import _dedup_candidates  # noqa: E402


def main() -> int:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_urls = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    n_buckets, budget, seen_every = 32, 512, 3
    # host count scales with n_urls exactly as in bench_scaling.py so the
    # politeness cap admits the same fraction of the frontier at any size
    n_hosts = max(n_urls // 500, 1000)
    spark = make_spark(cpus)
    raw = synth_frontier(spark, n_urls, n_hosts)
    # mirror the kernel's corpus staging: bucketed layout + DISK_ONLY (lz4)
    pages = synth_pages(raw, links_per_page=12, filler_words=60).repartition(
        FETCH_BUCKETS, "url_canon"
    )
    seen = (
        raw.filter(F.pmod("id", F.lit(seen_every)) == 0)
        .select(F.lower(F.regexp_replace("url", ":443", "")).alias("url_canon"))
        .withColumn("host", host_expr(F.col("url_canon")))
        .withColumn("bucket", host_bucket_expr(F.col("host"), n_buckets))
        .withColumn("url_hash", url_hash_expr(F.col("url_canon")))
        .select("url_hash", "bucket", "url_canon")
    )
    bloom_state = BloomState(n_buckets, 1 << 22)
    bloom = bloom_state.merge(bloom_state.empty(spark), seen.select("bucket", "url_hash"))
    bloom.persist().count()
    seen.persist().count()
    pages.persist(StorageLevel.DISK_ONLY)
    pages.count()

    for attempt in range(3):
        stages = {}

        def mat(name, df, level=None):
            t0 = time.monotonic()
            # html-bearing stages must stage serialized+compressed like the
            # kernel's corpus: 24M pages as deserialized JVM strings would
            # be a GC wall that belongs to the measurement error, not the job
            df.persist(level or StorageLevel.MEMORY_AND_DISK_DESER)
            n = df.count()
            stages[name] = {"sec": round(time.monotonic() - t0, 2), "rows": n}
            return df

        t_all = time.monotonic()
        cands = raw.select(
            canon_expr(F.col("url")).alias("url_canon"),
            F.lit(0).alias("priority"),
            F.col("id").alias("first_occ_a"),
            F.lit(0).cast("long").alias("first_occ_b"),
        )
        cands = mat("canon", cands)
        dd = mat("dedup", _dedup_candidates(cands, n_buckets))
        fresh = mat("bloom+anti", filter_unseen(dd, seen, bloom, bloom_state))
        frontier = fresh.select(
            "url_canon", "host", "bucket", "url_hash", "priority",
            F.lit(0).alias("round_added"), F.col("first_occ_a").alias("seq"),
        )
        sched, _deferred = apply_politeness_budget(
            frontier,
            spark.createDataFrame([], "host string, max_fetches_per_round int"),
            budget,
            cap=budget,
        )
        sched = mat("politeness", sched)
        # co-partitioned shuffled-hash semi join, exactly as the kernel plans it
        fetched = pages.join(
            sched.select("url_canon").repartition(FETCH_BUCKETS, "url_canon").hint("shuffle_hash"),
            "url_canon",
            "left_semi",
        )
        fetched = mat("fetch", fetched.select("url_canon", "html"), StorageLevel.DISK_ONLY)
        out = flat_outlinks(fetched, ["url_canon"])
        t0 = time.monotonic()
        n = out.count()
        stages["outlinks"] = {"sec": round(time.monotonic() - t0, 2), "rows": n}
        total = round(time.monotonic() - t_all, 2)
        for df in (cands, dd, fresh, sched, fetched):
            df.unpersist()
        print(json.dumps({"attempt": attempt, "cpus": cpus, "n_urls": n_urls,
                          "total": total, "stages": stages}), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
