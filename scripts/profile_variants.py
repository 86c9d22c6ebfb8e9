"""A/B kernel-variant profiler for the frontier-round flat-cost hunt.

Runs ONE variant of the frontier-round kernel per invocation at 6M URLs /
12,000 hosts (bench.py's exact kernel point), warm-up at 1/10 size then
best-of-3, and prints one JSON line. `ab:x,y` mode interleaves two arms
in ONE process (same JVM warmth, 4 alternating pairs) — sequential
whole-process comparisons are noise-dominated on this VM (CLAUDE.md).

    python scripts/profile_variants.py <variant|ab:x,y> [n_urls]

Variants:
  base    frontier_round_kernel as committed — since the round-2 change
          this already uses the ONE-PASS unseen filter (single anti-join
          carrying the probe verdict in its condition)
  union   the pre-round-2 two-branch form (definitely-new ∪ anti-joined
          maybe), kept inline here as the regression comparison arm; the
          union re-executes the dedup aggregate + probe UDF per branch,
          which the one-pass form removed (measured base 16.1s vs
          one-pass 13.6-14.7s at the 6M point when the union form was
          still `base`)
  noaqe   base with spark.sql.adaptive.enabled=false for the arm's runs
          (toggled around each call, so it works inside ab: mode)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import functions as F


def _union_round(spark, n_urls: int, n_hosts: int) -> dict:
    """The pre-round-2 kernel: identical dataflow except the unseen filter
    is the two-branch union form (recomputes dedup + probe per branch)."""
    from crawler_spark import benchmarks as B
    from crawler_spark.frontier.canon import (
        canon_expr,
        flat_outlinks,
        host_bucket_expr,
        host_expr,
        url_hash_expr,
    )
    from crawler_spark.frontier.politeness import apply_politeness_budget
    from crawler_spark.frontier.seen import BloomState
    from crawler_spark.scheduler import _dedup_candidates

    n_buckets, budget, seen_every = 32, 512, 3
    raw = B.synth_frontier(spark, n_urls, n_hosts)
    pages = B.synth_pages(raw, links_per_page=12, filler_words=60).repartition(
        B.FETCH_BUCKETS, "url_canon"
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
    bloom.persist()
    bloom.count()
    seen.persist()
    seen.count()
    pages.persist(StorageLevel.DISK_ONLY)
    pages.count()

    t0 = time.monotonic()
    cands = raw.select(
        canon_expr(F.col("url")).alias("url_canon"),
        F.lit(0).alias("priority"),
        F.col("id").alias("first_occ_a"),
        F.lit(0).cast("long").alias("first_occ_b"),
    )
    cands = _dedup_candidates(cands, n_buckets)
    probed = bloom_state.probe_broadcast(cands, bloom)
    # the historical two-branch form under test
    definitely_new = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
    survivors = maybe.join(seen.select("url_canon"), ["url_canon"], "left_anti")
    fresh = definitely_new.unionByName(survivors)
    frontier = fresh.select(
        "url_canon",
        "host",
        "bucket",
        "url_hash",
        "priority",
        F.lit(0).alias("round_added"),
        F.col("first_occ_a").alias("seq"),
    )
    scheduled, _deferred = apply_politeness_budget(
        frontier,
        spark.createDataFrame([], "host string, max_fetches_per_round int"),
        budget,
        cap=budget,
    )
    scheduled.persist()
    fetched = pages.join(
        scheduled.select("url_canon")
        .repartition(B.FETCH_BUCKETS, "url_canon")
        .hint("shuffle_hash"),
        "url_canon",
        "left_semi",
    )
    outlinks = flat_outlinks(fetched.select("url_canon", "html"), ["url_canon"])
    n_outlinks = outlinks.count()
    n_scheduled = scheduled.count()
    wall = time.monotonic() - t0
    scheduled.unpersist()
    seen.unpersist()
    pages.unpersist()
    bloom.unpersist()
    return {
        "n_urls": n_urls,
        "urls_scheduled": n_scheduled,
        "outlinks": n_outlinks,
        "round_wall_sec": round(wall, 3),
        "urls_scheduled_per_sec": round(n_scheduled / wall, 1),
    }


def _r2probe_round(spark, n_urls: int, n_hosts: int) -> dict:
    """The round-2 kernel as the regression arm for round 3's two changes:
    (a) host/bucket/url_hash derived PRE-dedup and first()-carried through
    the admission exchange, and (b) the broadcast Bloom probe as an
    Arrow/pandas UDF — whose ArrowEvalPython node hides partitioning from
    the planner and forces a full candidates re-exchange before the exact
    anti-join (the 269 MB the r3 JVM-expression probe removes)."""
    from pyspark.sql.types import BooleanType

    from crawler_spark import benchmarks as B
    from crawler_spark.frontier.canon import (
        canon_expr,
        flat_outlinks,
        host_bucket_expr,
        host_expr,
        url_hash_expr,
    )
    from crawler_spark.frontier.politeness import apply_politeness_budget
    from crawler_spark.frontier.seen import BloomState, _test_bits

    n_buckets, budget, seen_every = 32, 512, 3
    raw = B.synth_frontier(spark, n_urls, n_hosts)
    pages = B.synth_pages(raw, links_per_page=12, filler_words=60).repartition(
        B.FETCH_BUCKETS, "url_canon"
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
    bloom.persist()
    bloom.count()
    seen.persist()
    seen.count()
    pages.persist(StorageLevel.DISK_ONLY)
    pages.count()

    n_bits = bloom_state.n_bits
    t0 = time.monotonic()
    cands = raw.select(
        canon_expr(F.col("url")).alias("url_canon"),
        F.lit(0).alias("priority"),
        F.col("id").alias("first_occ_a"),
        F.lit(0).cast("long").alias("first_occ_b"),
    )
    # (a) r2 shape: derive pre-dedup, first() through the exchange
    cands = (
        cands.withColumn("host", host_expr(F.col("url_canon")))
        .withColumn("bucket", host_bucket_expr(F.col("host"), n_buckets))
        .withColumn("url_hash", url_hash_expr(F.col("url_canon")))
    )
    deduped = (
        cands.groupBy("url_canon")
        .agg(
            F.min(F.struct("first_occ_a", "first_occ_b", "priority")).alias("f"),
            F.first("host").alias("host"),
            F.first("bucket").alias("bucket"),
            F.first("url_hash").alias("url_hash"),
        )
        .select(
            "url_canon", "host", "bucket", "url_hash",
            F.col("f.priority").alias("priority"),
            F.col("f.first_occ_a").alias("first_occ_a"),
            F.col("f.first_occ_b").alias("first_occ_b"),
        )
    )
    # (b) r2 shape: Arrow/pandas broadcast probe
    rows = bloom.collect()
    bitmaps = {
        int(r["bucket"]): np.frombuffer(bytes(r["bitmap"]), dtype=np.uint64)
        for r in rows
        if r["bitmap"] is not None
    }
    bc = spark.sparkContext.broadcast(bitmaps)

    @F.pandas_udf(BooleanType())
    def _probe_udf(bucket: pd.Series, url_hash: pd.Series) -> pd.Series:
        bms = bc.value
        out = np.zeros(len(bucket), dtype=bool)
        b_np = bucket.to_numpy()
        h_np = url_hash.to_numpy(dtype=np.int64)
        for b in np.unique(b_np):
            bm = bms.get(int(b))
            if bm is None or len(bm) == 0:
                continue
            mask = b_np == b
            out[mask] = _test_bits(bm, h_np[mask], n_bits)
        return pd.Series(out)

    probed = deduped.withColumn(
        "maybe_seen", _probe_udf(F.col("bucket"), F.col("url_hash"))
    )
    seen_keys = seen.select("url_canon")
    fresh = probed.join(
        seen_keys,
        (probed["url_canon"] == seen_keys["url_canon"]) & probed["maybe_seen"],
        "left_anti",
    ).drop("maybe_seen")
    frontier = fresh.select(
        "url_canon", "host", "bucket", "url_hash", "priority",
        F.lit(0).alias("round_added"),
        F.col("first_occ_a").alias("seq"),
    )
    scheduled, _deferred = apply_politeness_budget(
        frontier,
        spark.createDataFrame([], "host string, max_fetches_per_round int"),
        budget,
        cap=budget,
    )
    scheduled.persist()
    fetched = pages.join(
        scheduled.select("url_canon")
        .repartition(B.FETCH_BUCKETS, "url_canon")
        .hint("shuffle_hash"),
        "url_canon",
        "left_semi",
    )
    outlinks = flat_outlinks(fetched.select("url_canon", "html"), ["url_canon"])
    n_outlinks = outlinks.count()
    n_scheduled = scheduled.count()
    wall = time.monotonic() - t0
    scheduled.unpersist()
    seen.unpersist()
    pages.unpersist()
    bloom.unpersist()
    return {
        "n_urls": n_urls,
        "urls_scheduled": n_scheduled,
        "outlinks": n_outlinks,
        "round_wall_sec": round(wall, 3),
        "urls_scheduled_per_sec": round(n_scheduled / wall, 1),
    }


def run_variant(spark, variant: str, n_urls: int, n_hosts: int) -> dict:
    from crawler_spark.benchmarks import frontier_round_kernel

    if variant == "union":
        return _union_round(spark, n_urls, n_hosts)
    if variant == "r2probe":
        return _r2probe_round(spark, n_urls, n_hosts)
    if variant == "countjob":
        # pre-r4 arm: scheduled persisted + separate count() job instead of
        # the Observation riding the outlinks job
        return frontier_round_kernel(
            spark, n_urls=n_urls, n_hosts=n_hosts, obs_scheduled=False
        )
    if variant == "noaqe":
        prev = spark.conf.get("spark.sql.adaptive.enabled")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            return frontier_round_kernel(spark, n_urls=n_urls, n_hosts=n_hosts)
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", prev)
    if variant != "base":
        raise SystemExit(f"unknown variant {variant!r} (base|union|r2probe|noaqe|countjob)")
    return frontier_round_kernel(spark, n_urls=n_urls, n_hosts=n_hosts)


def main() -> None:
    variant = sys.argv[1] if len(sys.argv) > 1 else "base"
    n_urls = int(sys.argv[2]) if len(sys.argv) > 2 else 6_000_000
    n_hosts = max(n_urls // 500, 1_000)
    import bench

    spark = bench.make_spark(32)
    if variant.startswith("ab:"):
        # interleaved paired comparison in ONE process: same JVM warmth for
        # both arms, 4 alternating pairs, report per-arm walls + mins
        a, b = variant[3:].split(",")
        for v in (a, b):
            run_variant(spark, v, max(n_urls // 10, 10_000), max(n_hosts // 10, 100))
        walls = {a: [], b: []}
        for _ in range(4):
            for v in (a, b):
                walls[v].append(run_variant(spark, v, n_urls, n_hosts)["round_wall_sec"])
        print(json.dumps({"ab": [a, b], "walls": walls,
                          "min": {v: min(w) for v, w in walls.items()}}))
        spark.stop()
        return
    run_variant(spark, variant, max(n_urls // 10, 10_000), max(n_hosts // 10, 100))
    runs = [run_variant(spark, variant, n_urls, n_hosts) for _ in range(3)]
    best = min(runs, key=lambda r: r["round_wall_sec"])
    best["variant"] = variant
    best["walls"] = [r["round_wall_sec"] for r in runs]
    print(json.dumps(best))
    spark.stop()


if __name__ == "__main__":
    main()
