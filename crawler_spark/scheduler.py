"""BSP crawl scheduler — frontier rounds as DataFrame jobs.

Replaces the reference's goroutine/channel pipeline
(/root/reference/collector.go:63-79, collector-url.go:19-39, pool.go) with
Bulk-Synchronous-Parallel rounds, per SURVEY.md §3/§7:

    frontier ──politeness window──▶ scheduled ──join corpus──▶ fetched
        ▲                                                        │
        │                                                outlink explode
        └── deferred ∪ (dedup → bloom+anti-join seen → robots → seq) ◀┘

Every round is checkpointed (frontier, seen, bloom, schedule, metrics) to
parquet snapshots with a manifest, so a killed job resumes exactly
(north_rule). Iceberg would slot in here as the table format; the sandbox
has no Iceberg jars, so the state store is parquet-dir snapshots with the
same append/replace semantics (see storage.py).

Scale notes (10^10-URL frontier):
* frontier/seen state is partitioned by salted host-bucket
  (pmod(xxhash64(host), n_buckets)) — joins against it co-partition, hot
  hosts spread across salt, AQE splits residual skew;
* the seen check is Bloom-prefiltered per bucket so the exact anti-join
  touches only bloom-positive candidates (crawler_spark.frontier.seen);
* the seen table is an append-only DELTA LOG (one parquet dir of newly
  admitted urls per round, manifest lists the paths) — checkpoint write
  cost per round is O(new urls), not O(total seen); Iceberg maps this to
  writeTo(seen).append();
* seq assignment needs a global total order over each round's NEW urls
  only (not the whole frontier); implemented as a two-phase rank —
  per-partition ranks + partition-size offsets — to avoid a
  single-partition window.
"""

from __future__ import annotations

import json
import logging
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession, Window, functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from crawler_spark.frontier.canon import (
    canon_expr,
    flat_outlinks,
    host_bucket_expr,
    host_expr,
    url_hash_expr,
)
from crawler_spark.frontier.politeness import (
    apply_politeness_budget,
    politeness_cap,
    robots_allowed,
)
from crawler_spark.frontier.cuckoo import CuckooState
from crawler_spark.frontier.seen import BloomState, filter_unseen

FRONTIER_SCHEMA = StructType(
    [
        StructField("url_canon", StringType()),
        StructField("host", StringType()),
        StructField("bucket", IntegerType()),
        StructField("url_hash", LongType()),
        StructField("priority", IntegerType()),
        StructField("round_added", IntegerType()),
        StructField("seq", LongType()),
    ]
)

SEEN_SCHEMA = StructType(
    [
        StructField("url_hash", LongType()),
        StructField("bucket", IntegerType()),
        StructField("url_canon", StringType()),
    ]
)


@dataclass
class CrawlConfig:
    checkpoint_dir: str
    max_rounds: int = 50
    default_budget: int = 16
    n_buckets: int = 32
    bits_per_bucket: int = 1 << 16
    use_bloom: bool = True
    # which approximate seen-filter fronts the exact anti-join when
    # use_bloom is set: "bloom" (bitmap; smallest state) or "cuckoo"
    # (fingerprint table; supports deletion → recrawl expiry without a
    # filter rebuild). Both are partitioned by host bucket and exactness
    # never depends on the choice (filter_unseen's anti-join backstop).
    seen_filter: str = "bloom"
    cuckoo_table_buckets: int = 1 << 12
    state_partitions: int = 0  # 0 → n_buckets
    # fetch-as-join strategy. "broadcast": collect+broadcast the scheduled
    # set, probe the corpus map-side — right when rounds are budget-bounded
    # SMALL (the driver-side broadcast build is serial, so it must not grow
    # with frontier size). "bucketed": the corpus is persisted
    # hash-partitioned by url_canon (the local stand-in for an Iceberg
    # table stored with a bucket(url_canon, N) transform — bucketing is
    # paid once at write time, reused every round) and the fetch is a
    # co-partitioned shuffled-hash join where ONLY the scheduled keys move;
    # nothing serial scales with the round, which is what keeps N→4N
    # efficiency at 10^6+-scheduled rounds (see BENCH.md).
    fetch_join: str = "broadcast"
    corpus_buckets: int = 128
    # compact the append-only seen delta log whenever it reaches this many
    # segments: rewrite the union into ONE bucketed snapshot and reset the
    # log. Keeps the per-round read at O(segments) directories instead of
    # O(rounds) — after R rounds an uncompacted log is R small-file dirs,
    # the classic many-snapshots death at 10^10 URLs. Amortized write cost
    # stays O(total/K per compaction); Iceberg maps this to
    # rewrite_data_files. Set very large to disable.
    seen_compact_every: int = 8


@dataclass
class CrawlResult:
    schedule: DataFrame
    seen: DataFrame
    metrics: DataFrame
    rounds: int = 0
    extra: dict = field(default_factory=dict)


def _ckpt(cfg: CrawlConfig, rnd: int, name: str) -> str:
    return os.path.join(cfg.checkpoint_dir, f"round={rnd}", name)


def _write_state(df: DataFrame, path: str, partition_cols: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)


def _manifest_path(cfg: CrawlConfig) -> str:
    return os.path.join(cfg.checkpoint_dir, "manifest.json")


def _write_manifest(cfg: CrawlConfig, state: dict) -> None:
    tmp = _manifest_path(cfg) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, _manifest_path(cfg))


def read_manifest(checkpoint_dir: str) -> dict | None:
    path = os.path.join(checkpoint_dir, "manifest.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def _prepare_seeds(spark: SparkSession, seeds: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """seeds(url, priority, seq) → frontier candidate rows in seed-seq order."""
    s = seeds.select(
        canon_expr(F.col("url")).alias("url_canon"),
        F.col("priority").cast("int").alias("priority"),
        F.col("seq").cast("long").alias("first_occ_a"),
        F.lit(0).cast("long").alias("first_occ_b"),
    )
    # within-batch first-occurrence dedup (keep smallest seed seq);
    # host/bucket/url_hash derived post-dedup inside _dedup_candidates
    return _dedup_candidates(s, cfg.n_buckets)


def _dedup_candidates(cands: DataFrame, n_buckets: int) -> DataFrame:
    """Global first-occurrence dedup within one admission batch: keep the
    occurrence with the smallest (first_occ_a, first_occ_b) — for seeds
    that's seed seq, for outlinks (parent rank, position in page).

    Input carries only (url_canon, priority, first_occ_a, first_occ_b);
    host/bucket/url_hash are derived AFTER the aggregate. They are pure
    functions of url_canon, so first()-carrying them through the groupBy
    exchange shipped ~32 redundant bytes/row (host string + two hashes +
    three first-agg buffers) for every candidate of the round — post-agg
    derivation spends a few hash/parse instructions on the (smaller)
    deduped set instead. Measured: ~30% off the admission exchange at 6M
    URLs/round."""
    deduped = (
        cands.groupBy("url_canon")
        .agg(F.min(F.struct("first_occ_a", "first_occ_b", "priority")).alias("f"))
        .select(
            "url_canon",
            F.col("f.priority").alias("priority"),
            F.col("f.first_occ_a").alias("first_occ_a"),
            F.col("f.first_occ_b").alias("first_occ_b"),
        )
    )
    deduped = deduped.withColumn("host", host_expr(F.col("url_canon")))
    return deduped.select(
        "url_canon",
        "host",
        host_bucket_expr(F.col("host"), n_buckets).alias("bucket"),
        url_hash_expr(F.col("url_canon")).alias("url_hash"),
        "priority",
        "first_occ_a",
        "first_occ_b",
    )


def _assign_seq(allowed: DataFrame, seq_offset: int, round_added: int) -> DataFrame:
    """Deterministic global seq for admitted urls, ordered by first
    occurrence — TWO-PHASE rank, no single-partition global window:

    1. range-partition + sort by the order key, so partition *p* holds a
       contiguous key range and rows are sorted within it;
    2. count rows per partition (tiny driver-side collect, one row per
       partition), prefix-sum into per-partition offsets;
    3. seq = per-partition ``row_number`` (window partitioned by
       ``spark_partition_id()`` — parallel) + that partition's offset.

    A plain ``Window.orderBy(...)`` here would funnel every row of the
    round through ONE task; at 10^8 new urls/round that task is the whole
    job. The extra count job reads the persisted DF once — cheap next to
    the round's joins.

    Ordering contract: ADMISSION order only — (first_occ_a, first_occ_b) =
    (seed seq) for seeds, (parent schedule rank, in-page position) for
    outlinks. The candidate's own priority must NOT reorder admission (it
    affects scheduling, not seq)."""
    spark = allowed.sparkSession
    nparts = spark.sparkContext.defaultParallelism
    ranged = allowed.repartitionByRange(
        nparts, "first_occ_a", "first_occ_b"
    ).sortWithinPartitions("first_occ_a", "first_occ_b")
    ranged = ranged.withColumn("_pid", F.spark_partition_id())
    ranged.persist()
    sizes = {
        r["_pid"]: r["n"]
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = {}, seq_offset
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    off_expr = F.element_at(
        F.create_map(
            *[F.lit(x) for pid in sorted(offsets) for x in (pid, offsets[pid])]
        ),
        F.col("_pid"),
    ) if offsets else F.lit(seq_offset)
    w = Window.partitionBy("_pid").orderBy("first_occ_a", "first_occ_b")
    out = ranged.select(
        "url_canon",
        "host",
        "bucket",
        "url_hash",
        "priority",
        F.lit(round_added).cast("int").alias("round_added"),
        (F.row_number().over(w).cast("long") + off_expr.cast("long") - 1).alias("seq"),
    )
    # the caller unpersists this after materializing the round's state
    out._assign_seq_cache = ranged
    # row count is a free by-product of the offsets collect — callers use it
    # instead of a second count() job over the same rows
    out._assign_seq_total = acc - seq_offset
    return out


def crawl(
    spark: SparkSession,
    pages: DataFrame,
    seeds: DataFrame,
    robots: DataFrame | None,
    politeness: DataFrame | None,
    cfg: CrawlConfig,
    resume: bool = False,
) -> CrawlResult:
    """Run the BSP crawl. ``pages(url, html, …)`` is the corpus (fetch =
    equi-join on canonical url); ``seeds(url, priority, seq)``;
    ``robots(host, disallow_prefixes)``; ``politeness(host,
    max_fetches_per_round)``."""
    nparts = cfg.state_partitions or cfg.n_buckets
    if not cfg.use_bloom:
        bloom_state = None
    elif cfg.seen_filter == "cuckoo":
        bloom_state = CuckooState(cfg.n_buckets, cfg.cuckoo_table_buckets)
    else:
        bloom_state = BloomState(cfg.n_buckets, cfg.bits_per_bucket)

    # corpus keyed by canonical url — computed once; at scale this is the
    # Iceberg pages table, already stored canonical.
    corpus = pages.withColumn("url_canon", canon_expr(F.col("url"))).select(
        "url_canon", F.col("html").cast("string").alias("html")
    )
    if cfg.fetch_join == "bucketed":
        # stored-bucketed table stand-in: partition once, reuse every round
        corpus = corpus.repartition(cfg.corpus_buckets, "url_canon").persist()

    empty_robots = robots is None
    if politeness is None:
        politeness = spark.createDataFrame(
            [], "host string, max_fetches_per_round int"
        )

    manifest = read_manifest(cfg.checkpoint_dir) if resume else None
    if manifest is not None:
        start_round = manifest["next_round"]
        seq_offset = manifest["seq_offset"]
        frontier = spark.read.parquet(manifest["frontier_path"])
        # pre-change manifests lack frontier_size → one count at resume only
        frontier_size = manifest.get("frontier_size")
        if frontier_size is None:
            frontier_size = frontier.count()
        seen_paths = manifest.get("seen_paths") or [manifest["seen_path"]]
        seen = spark.read.parquet(*seen_paths)
        bloom = (
            spark.read.parquet(manifest["bloom_path"])
            if cfg.use_bloom and manifest.get("bloom_path")
            else (bloom_state.empty(spark) if bloom_state else None)
        )
    else:
        start_round = 0
        seeds_c = _prepare_seeds(spark, seeds, cfg)
        if not empty_robots:
            allowed = robots_allowed(seeds_c, robots)
        else:
            allowed = seeds_c
        frontier = _assign_seq(allowed, 0, 0)
        # free by-product of _assign_seq's offsets collect — no count() job
        seq_offset = frontier._assign_seq_total
        seed_cache = getattr(frontier, "_assign_seq_cache", None)
        seen = seeds_c.select("url_hash", "bucket", "url_canon")
        bloom = bloom_state.empty(spark) if bloom_state else None
        if bloom_state is not None:
            bloom = bloom_state.merge(bloom, seen.select("bucket", "url_hash"))
        # round-0 checkpoint of initial state
        frontier = _snapshot(spark, frontier, _ckpt(cfg, -1, "frontier"), nparts)
        if seed_cache is not None:
            seed_cache.unpersist()
        # seen is an append-only DELTA LOG: each round writes only its newly
        # admitted urls; the live table is a multi-path read. A full-table
        # rewrite per round would be O(|seen-so-far|) — the dominant write at
        # 10^10 URLs — where the delta is O(|new this round|). With Iceberg
        # the delta write is writeTo(seen).append() on the same snapshot.
        seen = _snapshot(spark, seen, _ckpt(cfg, -1, "seen"), nparts)
        seen_paths = [_ckpt(cfg, -1, "seen")]
        if bloom is not None:
            bloom = _snapshot(spark, bloom, _ckpt(cfg, -1, "bloom"), 1)
        frontier_size = seq_offset  # every admitted seed is a frontier row
        _write_manifest(
            cfg,
            {
                "next_round": 0,
                "seq_offset": seq_offset,
                "frontier_size": frontier_size,
                "frontier_path": _ckpt(cfg, -1, "frontier"),
                "seen_paths": seen_paths,
                "bloom_path": _ckpt(cfg, -1, "bloom") if bloom is not None else None,
            },
        )

    # static per crawl — computing it inside the loop would add a driver
    # collect job per round (pure flat cost against N→4N efficiency)
    cap = politeness_cap(politeness, cfg.default_budget)

    rnd = start_round
    while rnd < cfg.max_rounds:
        # emptiness by driver arithmetic, not a per-round probe job:
        # |frontier_next| = |frontier| − |scheduled| + |admitted|, all three
        # maintained from collects the round already pays for (the
        # _assign_seq offsets collect and the metrics snapshot read)
        # <= not ==: the arithmetic assumes the corpus is unique per
        # url_canon (the pages-table contract); a violating corpus would
        # overcount n_scheduled and drift the size negative — degrade to
        # stopping rather than spinning empty rounds until max_rounds
        if frontier_size <= 0:
            if frontier_size < 0:
                # impossible under the contract — a duplicate-url_canon
                # corpus double-counted n_scheduled. Stop (don't spin empty
                # rounds), but leave an operator-visible trail: without this
                # a truncated crawl is indistinguishable from a completed one.
                logging.getLogger(__name__).warning(
                    "frontier_size=%d went negative at round %d — the pages "
                    "corpus violates the unique-url_canon contract "
                    "(duplicate rows inflate n_scheduled); stopping early",
                    frontier_size,
                    rnd,
                )
                man = read_manifest(cfg.checkpoint_dir) or {}
                man["frontier_size_negative"] = frontier_size
                man["frontier_size_negative_round"] = rnd
                _write_manifest(cfg, man)
            break

        scheduled, deferred = apply_politeness_budget(
            frontier, politeness, cfg.default_budget, cap=cap
        )
        # reused by the fetch join, the miss anti-join, AND deferred's
        # frontier∖scheduled anti-join — cache the window output once
        scheduled.persist()

        # Fetch-as-join. The scheduled set is budget-bounded (≤ hosts ×
        # max_fetches_per_round), so broadcast it and probe the html-bearing
        # corpus MAP-SIDE — the corpus, whose rows carry the page bodies, is
        # never shuffled (a sort-merge join here ships the whole corpus
        # through the shuffle every round). At warehouse scale the broadcast
        # doubles as a runtime filter pruning the Iceberg scan. Left-outer
        # semantics (miss = fetch failure) are recovered with a cheap
        # anti-join of the two small sides.
        if cfg.fetch_join == "bucketed":
            # co-partitioned shuffled-hash join against the stored-bucketed
            # corpus: only the scheduled keys shuffle, the html side joins
            # in place (see CrawlConfig.fetch_join). miss derives from the
            # PERSISTED ok so the anti-join reads the cache, not a re-join.
            sched_b = scheduled.repartition(cfg.corpus_buckets, "url_canon")
            ok = corpus.join(
                sched_b.hint("shuffle_hash"), "url_canon", "inner"
            ).withColumn("fetched", F.lit(True))
            ok.persist()
            miss_src = sched_b.join(
                ok.select("url_canon").hint("shuffle_hash"), "url_canon", "left_anti"
            )
        else:
            ok = corpus.join(F.broadcast(scheduled), "url_canon", "inner").withColumn(
                "fetched", F.lit(True)
            )
            ok.persist()
            miss_src = scheduled.join(
                F.broadcast(ok.select("url_canon")), "url_canon", "left_anti"
            )
        miss = (
            miss_src
            .withColumn("html", F.lit(None).cast("string"))
            .withColumn("fetched", F.lit(False))
        )
        fetched = ok.unionByName(miss.select(*ok.columns))
        fetched.persist()

        schedule_log = fetched.select(
            F.lit(rnd).alias("round"),
            F.col("url_canon").alias("url"),
            "host",
            "priority",
            "seq",
            "fetched",
        )
        _write_state(schedule_log, _ckpt(cfg, rnd, "schedule"))

        # outlink expansion: order key = (parent rank in schedule, position).
        # Repartition before the Arrow UDF: outlink parsing is priced per
        # row (Python regex/pandas), not per byte, so AQE's byte-targeted coalescing
        # under-parallelizes it on small rounds; the round's parent set is
        # bounded by the fetch budget, so this shuffle is cheap at any scale.
        parents = fetched.filter(F.col("fetched")).select(
            F.col("priority").alias("parent_priority"),
            F.col("seq").alias("parent_seq"),
            "url_canon",
            "html",
        ).repartition(spark.sparkContext.defaultParallelism)
        # flat mapInPandas expansion: href scan stays JVM-side, no per-page
        # list rebuild + re-explode (see frontier.canon.flat_outlinks)
        links = flat_outlinks(parents, ["parent_priority", "parent_seq"])
        # first-occurrence order across the batch follows the schedule order
        # (parent_priority, parent_seq), then in-page position — encode the
        # pair (priority, seq) into one sortable long: seq is globally unique
        # and priority orders before seq in scheduling, so keep both columns.
        cands = links.select(
            F.col("child_url").alias("url_canon"),
            F.lit(0).alias("priority"),
            (F.col("parent_priority").cast("long") * F.lit(1 << 40) + F.col("parent_seq"))
            .alias("first_occ_a"),
            F.col("pos").cast("long").alias("first_occ_b"),
        )
        # host/bucket/url_hash derived post-dedup inside _dedup_candidates —
        # the admission exchange carries only (url_canon, priority, occ)
        cands = _dedup_candidates(cands, cfg.n_buckets)

        fresh = filter_unseen(cands, seen, bloom, bloom_state)
        fresh.persist()
        if not empty_robots:
            admitted = robots_allowed(fresh, robots)
        else:
            admitted = fresh
        new_entries = _assign_seq(admitted, seq_offset, rnd + 1)

        # --- metrics (per-partition lineage counters) -----------------------
        m_sched = fetched.groupBy("bucket").agg(
            F.count("*").alias("scheduled"),
            F.sum(F.col("fetched").cast("long")).alias("fetch_ok"),
        )
        # url_sketch: per-bucket HLL of admitted URLs — mergeable lineage
        # (hll_union_agg across any rounds/buckets → distinct-URL estimate
        # with no rescan of any round's frontier; see frontier/seen.py)
        m_new = new_entries.groupBy("bucket").agg(
            F.count("*").alias("admitted"),
            F.hll_sketch_agg(F.col("url_canon"), F.lit(12)).alias("url_sketch"),
        )
        metrics = (
            m_sched.join(m_new, "bucket", "full")
            .select(
                F.lit(rnd).alias("round"),
                "bucket",
                F.coalesce("scheduled", F.lit(0)).alias("scheduled"),
                F.coalesce("fetch_ok", F.lit(0)).alias("fetch_ok"),
                F.coalesce("admitted", F.lit(0)).alias("admitted"),
                "url_sketch",
            )
        )
        # per-round scheduled total rides the metrics WRITE job as an
        # observation (CollectMetrics) — feeds the driver-side frontier-size
        # arithmetic that replaced the per-round limit(1).count() emptiness
        # probe, with zero extra jobs (previously a re-read+agg of the
        # just-written snapshot was one more tiny job per round).
        obs = Observation(f"round_{rnd}_metrics")
        metrics = metrics.observe(obs, F.sum("scheduled").alias("n_scheduled"))
        _write_state(metrics, _ckpt(cfg, rnd, "metrics"))
        n_scheduled = obs.get["n_scheduled"] or 0

        # --- next-round state -----------------------------------------------
        new_seen = fresh.select("url_hash", "bucket", "url_canon")
        frontier_next = deferred.select(*[f.name for f in FRONTIER_SCHEMA.fields]).unionByName(
            new_entries.select(*[f.name for f in FRONTIER_SCHEMA.fields])
        )
        if bloom_state is not None:
            bloom_next = bloom_state.merge(bloom, new_seen.select("bucket", "url_hash"))
        else:
            bloom_next = None

        frontier = _snapshot(spark, frontier_next, _ckpt(cfg, rnd, "frontier"), nparts)
        # append-only seen delta: write THIS round's admissions, re-read the
        # whole log (see init comment — O(new) write, not O(total))
        _snapshot(spark, new_seen, _ckpt(cfg, rnd, "seen"), nparts)
        seen_paths = seen_paths + [_ckpt(cfg, rnd, "seen")]
        if len(seen_paths) >= cfg.seen_compact_every:
            # delta-log compaction: one bucketed snapshot replaces the log
            seen = _snapshot(
                spark, spark.read.parquet(*seen_paths), _ckpt(cfg, rnd, "seen_compacted"), nparts
            )
            seen_paths = [_ckpt(cfg, rnd, "seen_compacted")]
        else:
            seen = spark.read.parquet(*seen_paths)
        if bloom_next is not None:
            bloom = _snapshot(spark, bloom_next, _ckpt(cfg, rnd, "bloom"), 1)
        n_admitted = new_entries._assign_seq_total  # from the offsets collect
        seq_offset += n_admitted
        frontier_size = frontier_size - n_scheduled + n_admitted
        fetched.unpersist()
        ok.unpersist()
        fresh.unpersist()
        scheduled.unpersist()
        cache = getattr(new_entries, "_assign_seq_cache", None)
        if cache is not None:
            cache.unpersist()

        _write_manifest(
            cfg,
            {
                "next_round": rnd + 1,
                "seq_offset": seq_offset,
                "frontier_size": frontier_size,
                "frontier_path": _ckpt(cfg, rnd, "frontier"),
                "seen_paths": seen_paths,
                "bloom_path": _ckpt(cfg, rnd, "bloom") if bloom_next is not None else None,
            },
        )
        rnd += 1

    if cfg.fetch_join == "bucketed":
        corpus.unpersist()
    schedule = spark.read.parquet(
        *[
            _ckpt(cfg, r, "schedule")
            for r in range(rnd)
            if os.path.exists(_ckpt(cfg, r, "schedule"))
        ]
    ) if rnd > 0 else spark.createDataFrame(
        [], "round int, url string, host string, priority int, seq long, fetched boolean"
    )
    metrics = spark.read.parquet(
        *[
            _ckpt(cfg, r, "metrics")
            for r in range(rnd)
            if os.path.exists(_ckpt(cfg, r, "metrics"))
        ]
    ) if rnd > 0 else spark.createDataFrame(
        [],
        "round int, bucket int, scheduled long, fetch_ok long, admitted long, "
        "url_sketch binary",
    )
    return CrawlResult(schedule=schedule, seen=seen, metrics=metrics, rounds=rnd)


def _snapshot(
    spark: SparkSession, df: DataFrame, path: str, nparts: int
) -> DataFrame:
    """Write a state snapshot partitioned by host-bucket and read it back —
    truncates lineage (the BSP barrier) and doubles as the checkpoint.
    With Iceberg this becomes ``writeTo(...).createOrReplace()`` + snapshot
    id in the manifest.

    Skew kill (SURVEY §2.5): bucket = pmod(xxhash64(host), n) — a mega-host
    occupies ONE bucket, so partitioning state by bucket alone would write
    that host's whole frontier through one task. Salting with the row's own
    ``url_hash`` spreads a hot bucket across tasks while keeping rows of a
    bucket addressable (the salt is a function of columns already in the
    row, so any reader can re-derive the layout)."""
    cols = df.columns
    if "bucket" in cols and nparts > 1:
        if "url_hash" in cols:
            df = df.repartition(nparts, "bucket", F.pmod("url_hash", F.lit(16)))
        else:
            df = df.repartition(nparts, "bucket")
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)
