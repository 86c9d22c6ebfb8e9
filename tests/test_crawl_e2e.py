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
