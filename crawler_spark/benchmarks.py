"""Scale-oriented benchmark kernels (north-rule metric).

BASELINE.json's headline metric is *URLs-scheduled/sec + frontier-round
wall-time* with *scaling efficiency >= 0.8 from N to 4N executors*. The
sandbox has no multi-node cluster, so (per BASELINE.md) the scaling
criterion is evidenced by running the SAME kernel on the SAME input at two
parallelism levels (local[8] vs local[32]) and comparing throughput.

The kernel below is one full frontier round over a Spark-generated
synthetic frontier — every stage of the real scheduler
(crawler_spark.scheduler.crawl) in its per-round dataflow:

    generate urls -> canonicalize (Arrow UDF) -> host/bucket/xxhash64
      -> first-occurrence dedup -> Bloom probe + exact anti-join vs seen
      -> per-host politeness window -> fetch-as-join against pages
      -> outlink extraction (Arrow UDF) + posexplode

Input is generated *distributed* (spark.range + column exprs, no
driver-side pandas) so the kernel scales to arbitrary n_urls; it is a pure
function of n_urls/n_hosts (no wall clock, no rand()), so two parallelism
levels see byte-identical input.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Observation, SparkSession, functions as F

from crawler_spark.frontier.canon import (
    canon_expr,
    flat_outlinks,
    host_bucket_expr,
    host_expr,
    url_hash_expr,
)
from crawler_spark.frontier.politeness import apply_politeness_budget
from crawler_spark.frontier.seen import BloomState, filter_unseen
from crawler_spark.scheduler import _dedup_candidates

# deterministic pseudo-uniform in [0, 1): Knuth multiplicative hash mod a
# prime — same value for a given id at any parallelism.
_MIX = 2654435761
_PRIME = 1000003


def _u(col):
    return (F.pmod(col * F.lit(_MIX), F.lit(_PRIME))).cast("double") / F.lit(float(_PRIME))


def synth_frontier(spark: SparkSession, n_urls: int, n_hosts: int) -> DataFrame:
    """Raw (uncanonicalized) URL batch with Zipf-ish host skew.

    Hosts are drawn as floor(n_hosts * u^2): quadratic density → host 0 is
    ~hot like a real crawl frontier. URLs carry uppercase scheme/host and an
    explicit default port so canonicalization does real work per row.
    """
    df = spark.range(n_urls).withColumn("host_id", (F.lit(n_hosts) * _u(F.col("id")) * _u(F.col("id"))).cast("long"))
    return df.select(
        F.col("id"),
        F.col("host_id"),
        F.format_string(
            "HTTPS://H%d.Example.com:443/p/%d?x=%d", F.col("host_id"), F.col("id"), F.pmod(F.col("id"), F.lit(7))
        ).alias("url"),
    )


def synth_pages(urls: DataFrame, links_per_page: int = 3, filler_words: int = 60) -> DataFrame:
    """Corpus for fetch-as-join: one html body per canonical URL mixing
    relative, absolute same-host, and cross-host outlinks plus filler prose
    (Common-Crawl-ish pages carry tens of links in KBs of html — page
    richness sets the Python-CPU : shuffle-byte ratio of the round)."""
    link_exprs = []
    fmt_parts = []
    for j in range(links_per_page):
        kind = j % 3
        if kind == 0:
            fmt_parts.append('<a href="/p/%d">n</a> ')
            link_exprs.append(F.col("id") + F.lit(j + 1))
        elif kind == 1:
            fmt_parts.append('<a href="https://h%d.example.com/p/%d">s</a> ')
            link_exprs.append(F.col("host_id"))
            link_exprs.append(F.col("id") + F.lit(j + 1))
        else:
            fmt_parts.append('<a href="https://h%d.example.com/">x</a> ')
            link_exprs.append(F.pmod(F.col("id") + F.lit(j), F.lit(97)))
    filler = " ".join(f"word{w}" for w in range(filler_words))
    fmt = "<html><body>" + "".join(fmt_parts) + "<p>body %d " + filler + "</p></body></html>"
    return urls.select(
        F.lower(F.regexp_replace("url", ":443", "")).alias("url_canon"),
        F.format_string(fmt, *link_exprs, F.col("id")).alias("html"),
    )


# Bucket count of the stored corpus: a property of the TABLE, not of the
# cluster size — both parallelism levels read the same 128-bucket layout,
# exactly as two differently-sized clusters would read the same Iceberg
# table (bucket(url_canon, 128) partition transform).
FETCH_BUCKETS = 128

# I/O canary probe sizing: 16 × 4 MiB fsync'd chunks = 64 MiB per probe.
_IO_PROBE_CHUNK_MIB = 4
_IO_PROBE_CHUNKS = 16


def io_probe_sec() -> float:
    """Fixed fsync'd-WRITE probe (r5): 64 MiB of fixed pseudo-random bytes
    written in 16 chunks, each fsync'd to the device, then removed.

    Why a write, not the "small staged-parquet scan" the r4 verdict
    sketched: with 128 GiB of RAM every re-read of a fixed probe file is
    served from page cache after the first attempt — a scan probe would go
    blind to disk contention the moment it warmed up. fsync cannot be
    served from cache: it blocks until the device (shared with the noisy
    neighbors that r4's CPU-quiet 17.6–42.2 s spread implicates) accepts
    the writeback, which is exactly the path the kernel's shuffle/persist
    writes stall on during an episode. The payload is fixed
    (RandomState(0), incompressible) so the probe measures the box, never
    the data. Runs single-threaded on the driver — it marks attempts, it
    is not part of any timed region."""
    import numpy as np

    buf = np.random.RandomState(0).bytes(_IO_PROBE_CHUNK_MIB * 1024 * 1024)
    d = tempfile.mkdtemp(prefix="canary_io_")
    t0 = time.monotonic()
    try:
        for i in range(_IO_PROBE_CHUNKS):
            with open(os.path.join(d, f"c{i}"), "wb") as f:
                f.write(buf)
                f.flush()
                os.fsync(f.fileno())
        return round(time.monotonic() - t0, 3)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def frontier_round_kernel(
    spark: SparkSession,
    n_urls: int = 1_000_000,
    n_hosts: int = 2_000,
    seen_every: int = 3,
    budget: int = 512,
    n_buckets: int = 32,
    use_bloom: bool = True,
    links_per_page: int = 12,
    filler_words: int = 60,
    obs_scheduled: bool = True,
) -> dict:
    """One frontier round at scale; returns timings + throughput.

    ``seen_every``: every k-th generated URL is pre-marked seen (exercises
    the Bloom prefilter + exact anti-join on a realistic revisit rate).
    ``links_per_page``/``filler_words`` control page richness (real pages
    carry tens of links in KBs of html).
    """
    raw = synth_frontier(spark, n_urls, n_hosts)
    # The corpus is persisted hash-partitioned by url_canon — the local-mode
    # stand-in for an Iceberg table STORED with a bucket(url_canon, 128)
    # layout: bucketing is paid once at write time and reused by every
    # round, so it belongs to setup, not to the timed round.
    pages = synth_pages(
        raw, links_per_page=links_per_page, filler_words=filler_words
    ).repartition(FETCH_BUCKETS, "url_canon")

    # pre-seen state: every k-th URL, already canonical
    seen = (
        raw.filter(F.pmod("id", F.lit(seen_every)) == 0)
        .select(F.lower(F.regexp_replace("url", ":443", "")).alias("url_canon"))
        .withColumn("host", host_expr(F.col("url_canon")))
        .withColumn("bucket", host_bucket_expr(F.col("host"), n_buckets))
        .withColumn("url_hash", url_hash_expr(F.col("url_canon")))
        .select("url_hash", "bucket", "url_canon")
    )
    bloom_state = BloomState(n_buckets, 1 << 22) if use_bloom else None
    if bloom_state is not None:
        bloom = bloom_state.merge(bloom_state.empty(spark), seen.select("bucket", "url_hash"))
        bloom.persist()
        bloom.count()
    else:
        bloom = None
    seen.persist()
    seen.count()
    # DISK_ONLY (→ spark.local.dir, lz4 via spark.rdd.compress), NOT the
    # default deserialized MEMORY_AND_DISK: the corpus as raw JVM strings is
    # ~2 KiB/page (UTF-16 + object headers) — at 24M pages that is ~50 GB
    # inside a 64 GB heap, and the whole round becomes a GC/memory-capacity
    # wall that flatlines the local[32] leg (BENCH_scaling_24M.json eff
    # 0.27 before this change). Compressed-serialized blocks model the real
    # deployment — executors re-reading a compressed Iceberg/parquet corpus
    # — and turn the re-read into decompression CPU, which scales with
    # cores. The layout (128 url_canon hash buckets) is unchanged.
    pages.persist(StorageLevel.DISK_ONLY)
    pages.count()

    # Kernel-embedded canary (r4): a FIXED pure-CPU probe (64M string-hash
    # xor, no I/O, no shuffle read) timed inside every attempt, so kernel
    # numbers can be canary-normalized across rounds exactly like suite
    # numbers — this VM's baseline speed drifts ~1.3x between days and
    # whole-noise episodes swallow entire attempts (runs_wall_sec spreads
    # of 3-5x with identical plans). The workload is constant: its wall
    # time measures the box, not the engine. Valid only between equal-core
    # runs (fixed 32 tasks ÷ available slots).
    ct0 = time.monotonic()
    spark.range(0, 64_000_000, 1, 32).select(
        F.bit_xor(F.xxhash64(F.concat(F.lit("canary:"), F.col("id"))))
    ).collect()
    canary_sec = round(time.monotonic() - ct0, 3)
    # I/O-side twin (r5): fsync'd-write probe marks disk contention the
    # pure-CPU probe is blind to (BENCH_r04 attempts with quiet CPU probes
    # still spread 17.6–42.2 s). Both probes run OUTSIDE the timed round.
    canary_io_sec = io_probe_sec()

    t0 = time.monotonic()
    cands = raw.select(
        canon_expr(F.col("url")).alias("url_canon"),
        F.lit(0).alias("priority"),
        F.col("id").alias("first_occ_a"),
        F.lit(0).cast("long").alias("first_occ_b"),
    )
    # host/bucket/url_hash derived post-dedup inside _dedup_candidates —
    # the admission exchange carries only (url_canon, priority, occ)
    cands = _dedup_candidates(cands, n_buckets)
    fresh = filter_unseen(cands, seen, bloom, bloom_state)
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
        cap=budget,  # dim is static per crawl — precomputed, no per-round collect
    )
    # n_scheduled rides the outlinks job as an Observation (r4): the old
    # form persisted `scheduled` and paid a separate count() job; even
    # served from cache that is one more job in the round's flat cost c
    # (PROFILE.md) — and with the count folded in, the persist itself is
    # dead (scheduled has exactly one consumer) — so both go.
    # obs_scheduled=False keeps the pre-r4 persist+count form as the A/B
    # arm (profile_variants.py countjob).
    sched_obs = None
    if obs_scheduled:
        sched_obs = Observation()  # unnamed → unique per call (kernel re-runs in-session)
        scheduled = scheduled.observe(sched_obs, F.count(F.lit(1)).alias("n"))
    else:
        scheduled.persist()
    # Fetch-as-join, co-partitioned form: the corpus is stored bucketed by
    # url_canon (setup above), so the semi join plans as a shuffled-hash
    # join where ONLY the scheduled keys move — the html-bearing side joins
    # in place with zero exchange, and nothing serial scales with the
    # scheduled count. (The previous broadcast form collected the whole
    # scheduled set on the driver — a single-threaded build that grows with
    # frontier size: Amdahl's law caps measured N→4N efficiency exactly
    # where the north rule measures it. Broadcast remains right only when
    # the scheduled side is small; the scheduler keeps it as the small-round
    # strategy.) The shuffle_hash hint keeps Catalyst from picking
    # sort-merge, which would sort the page bodies inside every bucket.
    fetched = pages.join(
        scheduled.select("url_canon")
        .repartition(FETCH_BUCKETS, "url_canon")
        .hint("shuffle_hash"),
        "url_canon",
        "left_semi",
    )
    outlinks = flat_outlinks(fetched.select("url_canon", "html"), ["url_canon"])
    n_outlinks = outlinks.count()
    if sched_obs is not None:
        n_scheduled = int(sched_obs.get["n"] or 0)  # rode the count job above
        # CollectMetrics on a JOIN INPUT only dedupes retried result-stage
        # tasks: speculative execution or shuffle-map retries could double-
        # count rows (ADVICE r4). Local bench sessions run with speculation
        # off (Spark default), and the politeness budget bounds the true
        # count at n_hosts × budget — an observed value above that bound is
        # impossible, so fall back to the exact count() rather than report
        # an inflated urls_scheduled_per_sec.
        if n_scheduled > n_hosts * budget:
            n_scheduled = scheduled.count()
    else:
        n_scheduled = scheduled.count()  # served from cache, no recompute
    wall = time.monotonic() - t0

    if sched_obs is None:
        scheduled.unpersist()
    seen.unpersist()
    pages.unpersist()
    if bloom is not None:
        bloom.unpersist()
    return {
        "n_urls": n_urls,
        "n_hosts": n_hosts,
        "urls_scheduled": n_scheduled,
        "outlinks": n_outlinks,
        "round_wall_sec": round(wall, 3),
        "urls_scheduled_per_sec": round(n_scheduled / wall, 1),
        "urls_in_per_sec": round(n_urls / wall, 1),
        "canary_sec": canary_sec,
        "canary_io_sec": canary_io_sec,
    }
