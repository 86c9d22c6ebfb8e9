"""End-to-end: Spark BSP crawl == pure-Python oracle on the synthetic corpus.

Checks the three north_rule correctness gates:
1. identical crawl schedule (round, priority, seq, url),
2. identical final URL-seen set,
3. byte-identical extracted text per url,
plus kill-and-resume equivalence from a mid-crawl checkpoint.
"""

import os

import pytest
from pyspark.sql import functions as F

from crawler_spark.corpus import make_corpus
from crawler_spark.oracle import crawl_oracle
from crawler_spark.rules.htmlpath import html_visible_text
from crawler_spark.scheduler import CrawlConfig, crawl


@pytest.fixture(scope="module")
def corpus():
    return make_corpus(seed=42, n_hosts=10, pages_per_host=12, n_seed_hosts=5)


@pytest.fixture(scope="module")
def oracle_result(corpus):
    pages = {
        r.url: bytes(r.html).decode("utf-8") for r in corpus["pages"].itertuples()
    }
    seeds = [(r.url, int(r.priority), int(r.seq)) for r in corpus["seeds"].itertuples()]
    robots = {
        r.host: list(r.disallow_prefixes) for r in corpus["robots"].itertuples()
    }
    budgets = {
        r.host: int(r.max_fetches_per_round) for r in corpus["politeness"].itertuples()
    }
    return crawl_oracle(pages, seeds, robots, budgets, default_budget=16, max_rounds=12)


def _spark_inputs(spark, corpus):
    pages = spark.createDataFrame(corpus["pages"])
    seeds = spark.createDataFrame(corpus["seeds"])
    robots = spark.createDataFrame(corpus["robots"])
    politeness = spark.createDataFrame(corpus["politeness"])
    return pages, seeds, robots, politeness


def _schedule_tuples_spark(result):
    return [
        (r["round"], r["priority"], r["seq"], r["url"], r["fetched"])
        for r in result.schedule.orderBy("round", "priority", "seq").collect()
    ]


def _schedule_tuples_oracle(oracle_result):
    out = []
    for e in oracle_result.schedule:
        out.append((e.round, e.priority, e.seq, e.url, e.fetched))
    # oracle emits rounds in order and within a round in (priority, seq) order
    return sorted(out, key=lambda t: (t[0], t[1], t[2]))


@pytest.mark.parametrize("use_bloom", [True, False])
def test_crawl_matches_oracle(spark, corpus, oracle_result, tmp_path_factory, use_bloom):
    ckpt = str(tmp_path_factory.mktemp(f"ckpt_bloom_{use_bloom}"))
    pages, seeds, robots, politeness = _spark_inputs(spark, corpus)
    cfg = CrawlConfig(
        checkpoint_dir=ckpt, max_rounds=12, default_budget=16, n_buckets=8,
        use_bloom=use_bloom,
    )
    result = crawl(spark, pages, seeds, robots, politeness, cfg)

    got = _schedule_tuples_spark(result)
    want = _schedule_tuples_oracle(oracle_result)
    assert len(got) == len(want)
    assert got == want

    got_seen = {r["url_canon"] for r in result.seen.collect()}
    assert got_seen == oracle_result.seen


def test_bucketed_fetch_join_identical(spark, corpus, oracle_result, tmp_path_factory):
    """fetch_join="bucketed" (co-partitioned shuffled-hash fetch against the
    stored-bucketed corpus) is a pure physical-strategy swap: schedule and
    seen set must match the oracle exactly like the broadcast path."""
    ckpt = str(tmp_path_factory.mktemp("ckpt_bucketed"))
    pages, seeds, robots, politeness = _spark_inputs(spark, corpus)
    cfg = CrawlConfig(
        checkpoint_dir=ckpt, max_rounds=12, default_budget=16, n_buckets=8,
        fetch_join="bucketed", corpus_buckets=16,
    )
    result = crawl(spark, pages, seeds, robots, politeness, cfg)
    assert _schedule_tuples_spark(result) == _schedule_tuples_oracle(oracle_result)
    assert {r["url_canon"] for r in result.seen.collect()} == oracle_result.seen


def test_extracted_text_byte_identical(spark, corpus):
    """input_hint invariant: extracted text per url == oracle extraction."""
    pages = spark.createDataFrame(corpus["pages"])
    from crawler_spark.rules.spark import as_text
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    @pandas_udf(StringType())
    def extract_text(html: pd.Series) -> pd.Series:
        return html.map(lambda h: html_visible_text(h if h is not None else ""))

    rows = pages.select(
        "url", "text", extract_text(as_text(F.col("html"))).alias("got")
    ).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["got"] == r["text"], r["url"]


def test_resume_from_checkpoint_identical(spark, corpus, oracle_result, tmp_path_factory):
    """Kill after round k, resume → identical schedule + seen set."""
    pages, seeds, robots, politeness = _spark_inputs(spark, corpus)

    ckpt = str(tmp_path_factory.mktemp("ckpt_resume"))
    cfg_partial = CrawlConfig(
        checkpoint_dir=ckpt, max_rounds=3, default_budget=16, n_buckets=8
    )
    partial = crawl(spark, pages, seeds, robots, politeness, cfg_partial)
    assert partial.rounds == 3

    cfg_full = CrawlConfig(
        checkpoint_dir=ckpt, max_rounds=12, default_budget=16, n_buckets=8
    )
    resumed = crawl(spark, pages, seeds, robots, politeness, cfg_full, resume=True)

    got = _schedule_tuples_spark(resumed)
    want = _schedule_tuples_oracle(oracle_result)
    assert got == want
    got_seen = {r["url_canon"] for r in resumed.seen.collect()}
    assert got_seen == oracle_result.seen


def test_metrics_and_budget_invariant(spark, corpus, tmp_path_factory):
    """Politeness: no host exceeds its budget in any round."""
    pages, seeds, robots, politeness = _spark_inputs(spark, corpus)
    ckpt = str(tmp_path_factory.mktemp("ckpt_metrics"))
    cfg = CrawlConfig(checkpoint_dir=ckpt, max_rounds=12, default_budget=16, n_buckets=8)
    result = crawl(spark, pages, seeds, robots, politeness, cfg)

    per_host = (
        result.schedule.groupBy("round", "host")
        .agg(F.count("*").alias("n"))
        .join(politeness, "host", "left")
        .withColumn("budget", F.coalesce("max_fetches_per_round", F.lit(16)))
    )
    violations = per_host.filter(F.col("n") > F.col("budget")).count()
    assert violations == 0
    assert result.metrics.count() > 0
    # lineage counters add up: sum(scheduled) == schedule rows
    total = result.metrics.agg(F.sum("scheduled")).collect()[0][0]
    assert total == result.schedule.count()
    # the mergeable distinct-URL lineage: unioning every (round, bucket)
    # sketch estimates the seen-set size without rescanning any round.
    # Admissions are exactly-once (seen filter), so exact == sum(admitted)
    # == |seen| - |seeds already counted at round 0|; just compare against
    # the true distinct count with the lg_k=12 error envelope (~1.6% RSE).
    est = (
        result.metrics.filter(F.col("url_sketch").isNotNull())
        .agg(F.hll_sketch_estimate(F.hll_union_agg("url_sketch")).alias("e"))
        .collect()[0][0]
    )
    exact = result.metrics.agg(F.sum("admitted")).collect()[0][0]
    assert abs(est - exact) / max(exact, 1) < 0.05


def test_resume_from_pre_frontier_size_manifest(spark, corpus, oracle_result, tmp_path_factory):
    """Manifests written before frontier_size existed must still resume
    (one count() fallback), and the arithmetic must pick up correctly."""
    import json

    pages, seeds, robots, politeness = _spark_inputs(spark, corpus)
    ckpt = str(tmp_path_factory.mktemp("ckpt_oldmanifest"))
    cfg = CrawlConfig(checkpoint_dir=ckpt, max_rounds=3, default_budget=16, n_buckets=8)
    crawl(spark, pages, seeds, robots, politeness, cfg)
    mpath = os.path.join(ckpt, "manifest.json")
    with open(mpath) as f:
        m = json.load(f)
    assert "frontier_size" in m
    del m["frontier_size"]  # simulate a pre-change checkpoint
    with open(mpath, "w") as f:
        json.dump(m, f)
    cfg_full = CrawlConfig(
        checkpoint_dir=ckpt, max_rounds=12, default_budget=16, n_buckets=8
    )
    resumed = crawl(spark, pages, seeds, robots, politeness, cfg_full, resume=True)
    got = _schedule_tuples_spark(resumed)
    want = _schedule_tuples_oracle(oracle_result)
    assert got == want


def test_checkpoint_layout_iceberg_migration_contract(spark, corpus, tmp_path_factory):
    """The parquet-dir checkpoint IS the Iceberg migration contract (SURVEY
    S7): pin the layout so swapping _snapshot/_write_manifest for
    writeTo().createOrReplace()/append() + catalog snapshot ids is a pure
    substitution (the sandbox has no Iceberg jars, so the CONTRACT is the
    testable artifact):

    * manifest.json carries exactly the resume keys — the stand-ins for
      catalog snapshot pointers (scheduler.py:556),
    * the seen state is an append-only DELTA LOG: one dir per round, and
      earlier deltas are byte-identical after further rounds run from a
      resume — writeTo(seen).append() semantics, never rewrite,
    * the multi-path delta-log read equals the final seen set,
    * frontier snapshots lay out rows by (bucket, url_hash%16): a slot
      never spans part files, so the layout is re-derivable from row
      columns alone — Iceberg's bucket()-transform property (the salt's
      skew-kill shape itself is plan-pinned in test_plans.py).
    """
    import glob
    import hashlib
    import json

    pages, seeds, robots, politeness = _spark_inputs(spark, corpus)
    ckpt = str(tmp_path_factory.mktemp("ckpt_layout"))
    cfg = CrawlConfig(
        checkpoint_dir=ckpt, max_rounds=3, default_budget=16, n_buckets=8,
        seen_compact_every=10_000,  # keep the raw delta log (no compaction)
    )
    result = crawl(spark, pages, seeds, robots, politeness, cfg)
    with open(os.path.join(ckpt, "manifest.json")) as f:
        man = json.load(f)
    assert set(man) == {
        "next_round", "seq_offset", "frontier_size",
        "frontier_path", "seen_paths", "bloom_path",
    }
    rounds = result.rounds
    assert rounds == 3 and man["next_round"] == rounds
    # append-only delta log: the seed snapshot (round=-1) plus one delta
    # per executed round, all present
    assert man["seen_paths"] == [
        os.path.join(ckpt, f"round={r}", "seen") for r in range(-1, rounds)
    ]
    assert all(os.path.isdir(p) for p in man["seen_paths"])
    for r in range(rounds):
        for state in ("frontier", "schedule", "metrics"):
            assert os.path.isdir(os.path.join(ckpt, f"round={r}", state)), (r, state)

    def digest(path):
        return {
            os.path.basename(f): hashlib.md5(open(f, "rb").read()).hexdigest()
            for f in sorted(glob.glob(os.path.join(path, "*.parquet")))
        }

    before = {p: digest(p) for p in man["seen_paths"]}
    assert all(before.values())  # every delta has part files

    # resume and run the crawl to completion: the old deltas must be
    # APPENDED AROUND, not rewritten (their bytes are immutable)
    cfg_full = CrawlConfig(
        checkpoint_dir=ckpt, max_rounds=12, default_budget=16, n_buckets=8,
        seen_compact_every=10_000,
    )
    resumed = crawl(spark, pages, seeds, robots, politeness, cfg_full, resume=True)
    assert resumed.rounds > rounds
    for p, d in before.items():
        assert digest(p) == d, f"delta {p} was rewritten"
    with open(os.path.join(ckpt, "manifest.json")) as f:
        man2 = json.load(f)
    # the log grew monotonically and the multi-path read IS the seen set
    assert man2["seen_paths"][: rounds + 1] == man["seen_paths"]
    log_urls = {
        r["url_canon"]
        for r in spark.read.parquet(*man2["seen_paths"]).select("url_canon").collect()
    }
    assert log_urls == {r["url_canon"] for r in resumed.seen.select("url_canon").collect()}

    # bucketed layout addressability: one (bucket, salt) slot, one file
    fr = spark.read.parquet(man2["frontier_path"]).select(
        F.input_file_name().alias("f"),
        "bucket",
        F.pmod("url_hash", F.lit(16)).alias("salt"),
    )
    spans = (
        fr.groupBy("bucket", "salt")
        .agg(F.countDistinct("f").alias("nf"))
        .filter(F.col("nf") > 1)
        .count()
    )
    assert spans == 0
