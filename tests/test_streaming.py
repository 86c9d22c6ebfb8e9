"""Structured Streaming tier: incremental crawl (foreachBatch rounds fed
back through a watched directory), watermarked windowed rollups, and
cross-batch keyed state (applyInPandasWithState lifetime budget)."""

import datetime as dt
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.corpus import make_corpus
from crawler_spark.oracle import crawl_oracle
from crawler_spark.streaming import (
    StreamCrawlConfig,
    hourly_host_rollup,
    hourly_host_rollup_stream,
    stateful_host_budget,
    stream_crawl,
)


@pytest.fixture(scope="module")
def corpus():
    return make_corpus(seed=11, n_hosts=6, pages_per_host=10, n_seed_hosts=3)


def _inputs(spark, corpus):
    pages = spark.createDataFrame(corpus["pages"])
    seeds = spark.createDataFrame(corpus["seeds"])
    robots = spark.createDataFrame(corpus["robots"])
    politeness = spark.createDataFrame(corpus["politeness"])
    return pages, seeds, robots, politeness


def _oracle(corpus, max_rounds=60, default_budget=16):
    pages = {r.url: bytes(r.html).decode("utf-8") for r in corpus["pages"].itertuples()}
    seeds = [(r.url, int(r.priority), int(r.seq)) for r in corpus["seeds"].itertuples()]
    robots = {r.host: list(r.disallow_prefixes) for r in corpus["robots"].itertuples()}
    budgets = {
        r.host: int(r.max_fetches_per_round) for r in corpus["politeness"].itertuples()
    }
    return crawl_oracle(
        pages, seeds, robots, budgets, default_budget=default_budget, max_rounds=max_rounds
    )


def test_stream_crawl_drains_to_oracle_sets(spark, corpus, tmp_path_factory):
    """At drain, the streaming crawl's seen set and fetched-url set equal
    the batch oracle's: politeness only reorders rounds/batches, never
    changes the reachable closure."""
    work = str(tmp_path_factory.mktemp("stream_crawl"))
    pages, seeds, robots, politeness = _inputs(spark, corpus)
    cfg = StreamCrawlConfig(work_dir=work, default_budget=16, n_buckets=8, max_passes=60)
    res = stream_crawl(spark, pages, seeds, robots, politeness, cfg)
    oracle = _oracle(corpus)

    got_seen = {r["url_canon"] for r in res["seen"].collect()}
    assert got_seen == oracle.seen

    got_fetched = {
        r["url"] for r in res["schedule"].filter(F.col("fetched")).collect()
    }
    want_fetched = {e.url for e in oracle.schedule if e.fetched}
    assert got_fetched == want_fetched

    # every scheduled url exactly once (dedup + carry-over bookkeeping)
    n = res["schedule"].count()
    assert n == res["schedule"].select("url").distinct().count()
    assert n == len(oracle.schedule)


def test_stream_crawl_budget_never_exceeded_per_batch(spark, corpus, tmp_path_factory):
    work = str(tmp_path_factory.mktemp("stream_budget"))
    pages, seeds, robots, politeness = _inputs(spark, corpus)
    cfg = StreamCrawlConfig(work_dir=work, default_budget=3, n_buckets=8, max_passes=60)
    res = stream_crawl(spark, pages, seeds, robots, politeness, cfg)
    budgets = {
        r.host: int(r.max_fetches_per_round) for r in corpus["politeness"].itertuples()
    }
    per = (
        res["schedule"].groupBy("batch_id", "host").agg(F.count("*").alias("n")).collect()
    )
    assert per, "no batches scheduled"
    for r in per:
        assert r["n"] <= budgets.get(r["host"], 3), (r["host"], r["batch_id"], r["n"])


def test_stream_crawl_rerun_is_noop(spark, corpus, tmp_path_factory):
    """Restarting over the same work_dir re-offers only new files (the
    re-written seeds); everything is already seen → seen set unchanged."""
    work = str(tmp_path_factory.mktemp("stream_resume"))
    pages, seeds, robots, politeness = _inputs(spark, corpus)
    cfg = StreamCrawlConfig(work_dir=work, default_budget=16, n_buckets=8, max_passes=60)
    first = stream_crawl(spark, pages, seeds, robots, politeness, cfg)
    seen1 = {r["url_canon"] for r in first["seen"].collect()}
    sched1 = first["schedule"].count()
    second = stream_crawl(spark, pages, seeds, robots, politeness, cfg)
    assert {r["url_canon"] for r in second["seen"].collect()} == seen1
    assert second["schedule"].count() == sched1


def _ts(h, m=0):
    return dt.datetime(2025, 3, 1, h, m)


@pytest.fixture()
def fetch_log(spark, tmp_path_factory):
    """Tiny fetch log: (warc_ts, host) across 3 hours, written as THREE
    parquet files so maxFilesPerTrigger=1 yields three micro-batches with
    advancing watermark."""
    base = str(tmp_path_factory.mktemp("fetchlog"))
    batches = [
        [(_ts(0, 5), "a.com"), (_ts(0, 40), "a.com"), (_ts(0, 20), "b.com")],
        [(_ts(1, 10), "a.com"), (_ts(0, 55), "b.com"), (_ts(1, 30), "b.com")],
        [(_ts(4, 0), "a.com")],  # advances the watermark past hour 0+delay
        # since SPARK-40925 (3.4) late-event filtering uses the PREVIOUS
        # batch's watermark while eviction uses the current one, so the
        # late row must arrive TWO batches after the advancer to be dropped
        [(_ts(4, 30), "b.com")],
        [(_ts(0, 59), "a.com")],  # 3h31m late — beyond a 1h delay, dropped
    ]
    import time

    t0 = time.time()
    for i, rows in enumerate(batches):
        d = os.path.join(base, f"f{i}")
        spark.createDataFrame(rows, "warc_ts timestamp, host string").coalesce(
            1
        ).write.parquet(d)
        # the file source orders by modification time — pin distinct,
        # increasing mtimes so batch order is the written order
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (t0 + 60 * i, t0 + 60 * i))
    return base


def test_hourly_rollup_stream_complete_matches_batch(spark, fetch_log):
    df_batch = spark.read.parquet(*[os.path.join(fetch_log, d) for d in os.listdir(fetch_log)])
    want = {
        (r["window_start"], r["host"]): r["n_pages"]
        for r in hourly_host_rollup(df_batch).collect()
    }
    stream = spark.readStream.schema("warc_ts timestamp, host string").parquet(
        fetch_log + "/*"
    )
    q = (
        hourly_host_rollup_stream(stream)
        .writeStream.format("memory")
        .queryName("rollup_complete")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"], r["host"]): r["n_pages"]
        for r in spark.sql("select * from rollup_complete").collect()
    }
    assert got == want


def test_hourly_rollup_stream_append_drops_late(spark, fetch_log):
    """Append mode with a 1h watermark processed one file per micro-batch:
    hour-0 windows finalize once the watermark passes 01:00 (batch 3's
    04:00 event pushes it), so the 00:59 event arriving in batch 3 —
    2h59m late, beyond the 1h delay — is dropped from a.com's hour-0
    count."""
    stream = (
        spark.readStream.schema("warc_ts timestamp, host string")
        .option("maxFilesPerTrigger", 1)
        .parquet(fetch_log + "/*")
    )
    q = (
        hourly_host_rollup_stream(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("rollup_append")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"].hour, r["host"]): r["n_pages"]
        for r in spark.sql("select * from rollup_append").collect()
    }
    # hour-0 finalized WITHOUT the late 00:59 row: a.com=2 (not 3), b.com=2
    assert got[(0, "a.com")] == 2
    assert got[(0, "b.com")] == 2


def test_stateful_host_budget_lifetime_cap(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("statebudget"))
    rows1 = [("h1", f"http://h1/{i}", 0, i) for i in range(4)] + [
        ("h2", "http://h2/0", 0, 100)
    ]
    rows2 = [("h1", f"http://h1/x{i}", 0, 10 + i) for i in range(4)] + [
        ("h2", "http://h2/1", 0, 101)
    ]
    schema = "host string, url_canon string, priority int, seq long"
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(base + "/b0")
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(base + "/b1")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base + "/*")
    )
    q = (
        stateful_host_budget(stream, total_cap=5)
        .writeStream.format("memory")
        .queryName("budget_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("select * from budget_out").collect()
    per_host = {}
    for r in out:
        per_host.setdefault(r["host"], []).append(r["seq"])
    # lifetime cap across BOTH batches: h1 admits 4 then only 1 more
    assert sorted(per_host["h1"]) == [0, 1, 2, 3, 10]
    assert sorted(per_host["h2"]) == [100, 101]


def test_url_dedup_stream_drops_in_horizon_duplicates(spark, tmp_path_factory):
    """First arrival of each url_canon is emitted; a re-fetch within the
    watermark horizon is dropped; a re-fetch far beyond it re-emits (state
    for the key was evicted — burst-dedup tier, not forever-dedup)."""
    from crawler_spark.streaming import url_dedup_stream
    import time

    base = str(tmp_path_factory.mktemp("streamdedup"))
    batches = [
        [(_ts(0, 0), "u1"), (_ts(0, 1), "u2")],
        [(_ts(0, 30), "u1")],              # dup 30min later: inside 1h horizon
        [(_ts(5, 0), "adv")],              # watermark advancer
        [(_ts(6, 0), "adv2")],             # eviction lag (SPARK-40925)
        [(_ts(7, 0), "u1")],               # u1 again, hours later: re-emits
    ]
    t0 = time.time()
    for i, rows in enumerate(batches):
        d = os.path.join(base, f"f{i}")
        spark.createDataFrame(rows, "warc_ts timestamp, url_canon string").coalesce(
            1
        ).write.parquet(d)
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (t0 + 60 * i, t0 + 60 * i))
    stream = (
        spark.readStream.schema("warc_ts timestamp, url_canon string")
        .option("maxFilesPerTrigger", 1)
        .parquet(base + "/*")
    )
    q = (
        url_dedup_stream(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("stream_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = [
        (r["url_canon"], r["warc_ts"].hour)
        for r in spark.sql(
            "select * from stream_dedup order by warc_ts"
        ).collect()
    ]
    assert got.count(("u1", 0)) == 1      # 00:30 duplicate dropped
    assert ("u2", 0) in got
    assert ("u1", 7) in got               # beyond horizon: re-emitted


def test_host_budget_tws_matches_legacy_state_api(spark, tmp_path_factory):
    """The transformWithStateInPandas budget admits the same (host, seq)
    set as the applyInPandasWithState twin: lifetime cap 5 across two
    micro-batches, per-batch (priority, seq) admission order, and a
    lifetime_rank that keeps counting across batches.

    Requires google.protobuf (the TWS driver worker speaks protobuf to
    the JVM) and the RocksDB state store — skipped when the environment
    lacks them; the applyInPandasWithState twin above covers the
    semantics either way."""
    pytest.importorskip("google.protobuf")
    from crawler_spark.streaming.rollup import host_budget_tws

    base = str(tmp_path_factory.mktemp("twsbudget"))
    rows1 = [("h1", f"http://h1/{i}", 0, i) for i in range(4)] + [
        ("h2", "http://h2/0", 0, 100)
    ]
    rows2 = [("h1", f"http://h1/x{i}", 0, 10 + i) for i in range(4)] + [
        ("h2", "http://h2/1", 0, 101)
    ]
    schema = "host string, url_canon string, priority int, seq long"
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(base + "/b0")
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(base + "/b1")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base + "/*")
    )
    q = (
        host_budget_tws(stream, budget=5)
        .writeStream.format("memory")
        .queryName("tws_budget_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("select * from tws_budget_out").collect()
    per_host = {}
    ranks = {}
    for r in out:
        per_host.setdefault(r["host"], []).append(r["seq"])
        ranks[(r["host"], r["seq"])] = r["lifetime_rank"]
    assert sorted(per_host["h1"]) == [0, 1, 2, 3, 10]
    assert sorted(per_host["h2"]) == [100, 101]
    # rank continues across batches: the batch-2 admit is h1's 5th
    assert ranks[("h1", 10)] == 5


def test_fetch_parse_stream_join_matches_within_horizon(spark, tmp_path_factory):
    """Stream-stream interval join: a parse within the 1h horizon matches
    its fetch; a parse 90 min after the fetch does not (range condition),
    and a parse for a never-fetched url matches nothing. Batch twin: the
    same join as a plain DataFrame join must give the identical match set."""
    from crawler_spark.streaming.rollup import fetch_parse_stream_join

    base = str(tmp_path_factory.mktemp("ssjoin"))
    f_schema = "url string, fetch_ts timestamp"
    p_schema = "url string, parse_ts timestamp"
    t0 = "2024-01-01 00:"
    fetches = [
        ("http://a/1", f"{t0}00:00"),
        ("http://a/2", f"{t0}05:00"),
        ("http://b/1", f"{t0}10:00"),
    ]
    parses = [
        ("http://a/1", f"{t0}20:00"),   # +20min → match
        ("http://a/2", "2024-01-01 01:40:00"),  # +95min → beyond horizon
        ("http://c/1", f"{t0}30:00"),   # never fetched → no match
        ("http://b/1", f"{t0}11:00"),   # +1min → match
    ]
    import pyspark.sql.functions as SF

    fdf = spark.createDataFrame(fetches, "url string, ts string").select(
        "url", SF.col("ts").cast("timestamp").alias("fetch_ts")
    )
    pdf = spark.createDataFrame(parses, "url string, ts string").select(
        "url", SF.col("ts").cast("timestamp").alias("parse_ts")
    )
    fdf.coalesce(1).write.parquet(base + "/f/b0")
    pdf.coalesce(1).write.parquet(base + "/p/b0")

    f_stream = spark.readStream.schema(f_schema).option("maxFilesPerTrigger", 1).parquet(base + "/f/*")
    p_stream = spark.readStream.schema(p_schema).option("maxFilesPerTrigger", 1).parquet(base + "/p/*")
    q = (
        fetch_parse_stream_join(f_stream, p_stream, horizon="1 hour")
        .writeStream.format("memory")
        .queryName("fp_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r["url"], r["latency_sec"]) for r in spark.sql("select * from fp_join").collect()}
    assert got == {("http://a/1", 1200), ("http://b/1", 60)}

    # batch twin: identical match set from the same logic as a plain join
    batch = fetch_parse_stream_join(fdf, pdf, horizon="1 hour")
    assert {(r["url"], r["latency_sec"]) for r in batch.collect()} == got
