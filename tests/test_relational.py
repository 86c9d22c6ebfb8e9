"""Relational-coverage queries whose scale path differs from the audit
(oracle-hashed) form — assert the two agree on the same input."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_exact_quantiles_match_approx_percentile(spark, sf001_dir):
    """q_quantity_quantiles is the exact (rank-at-ceil(q*n)) audit twin;
    the 100-TB path is approx_percentile (t-digest sketch, map-side
    combine, no per-group sort). With accuracy >> #distinct values the
    sketch is rank-exact to within one neighbouring data value."""
    import __spark_entry__ as E

    exact = {
        r["l_returnflag"]: (r["p50_qty"], r["p90_qty"])
        for r in E.q_quantity_quantiles(spark, sf001_dir).collect()
    }
    li = spark.read.parquet(f"{sf001_dir}/lineitem.parquet")
    approx = {
        r["l_returnflag"]: (r["a50"], r["a90"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr("approx_percentile(l_quantity, 0.5, 10000)").alias("a50"),
            F.expr("approx_percentile(l_quantity, 0.9, 10000)").alias("a90"),
        )
        .collect()
    }
    assert exact.keys() == approx.keys()
    for flag, (p50, p90) in exact.items():
        a50, a90 = approx[flag]
        # both return actual data values; quantities step in units of 1.0
        assert abs(p50 - a50) <= 1.0, (flag, p50, a50)
        assert abs(p90 - a90) <= 1.0, (flag, p90, a90)


def test_pivot_plan_has_no_value_discovery_job(spark, sf001_dir):
    """Pinning pivot values keeps plan construction job-free — an unpinned
    pivot() eagerly runs a distinct-scan over the full table to discover
    column values (a separate pass over 100 TB) before the query even
    starts. The parquet read is done OUTSIDE the job group: file listing /
    footer reads are the scan's own cost, not the pivot's."""
    import __spark_entry__ as E

    events = spark.read.parquet(f"{sf001_dir}/events.parquet")
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day")
    sc = spark.sparkContext

    sc.setJobGroup("pivot-pinned", "pinned pivot construction must not launch jobs")
    try:
        events.groupBy(day).pivot(
            "event_type", ["click", "error", "purchase", "signup", "view"]
        ).agg(F.count(F.lit(1)))
        assert list(sc.statusTracker().getJobIdsForGroup("pivot-pinned")) == []
    finally:
        sc.setJobGroup(None, None)

    sc.setJobGroup("pivot-unpinned", "unpinned pivot eagerly scans for values")
    try:
        events.groupBy(day).pivot("event_type").agg(F.count(F.lit(1)))
        assert list(sc.statusTracker().getJobIdsForGroup("pivot-unpinned")) != []
    finally:
        sc.setJobGroup(None, None)

    plan = E.q_events_type_pivot(spark, sf001_dir)._jdf.queryExecution()
    text = plan.optimizedPlan().toString()
    # one scan of events, no joins/subqueries introduced by pivot
    assert text.lower().count("relation") == 1, text


def test_promo_range_join_is_not_nested_loop(spark, sf001_dir):
    """The bucketed interval join must plan as an equi-join (hash/broadcast
    hash), never BroadcastNestedLoopJoin — the naive theta-join physical
    plan that dies at 100 TB."""
    import __spark_entry__ as E

    df = E.q_events_in_promo_windows(spark, sf001_dir)
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in physical, physical
    assert "HashJoin" in physical, physical


def test_promo_range_join_matches_theta_join(spark, sf001_dir):
    """Bucketed rewrite is result-identical to the plain theta join."""
    import __spark_entry__ as E

    fast = {
        r["promo_id"]: (r["n_events"], r["n_users"])
        for r in E.q_events_in_promo_windows(spark, sf001_dir).collect()
    }
    events = spark.read.parquet(f"{sf001_dir}/events.parquet")
    base = "timestamp '2024-01-01 00:00:00'"
    promos = spark.range(20).select(
        F.col("id").alias("promo_id"),
        F.expr(f"{base} + make_interval(0, 0, 0, 0, id * 36, 0, 0)").alias("p_start"),
        F.expr(f"{base} + make_interval(0, 0, 0, 0, id * 36 + 5, 0, 0)").alias("p_end"),
    )
    naive = {
        r["promo_id"]: (r["n_events"], r["n_users"])
        for r in events.join(
            promos, (events.ts >= promos.p_start) & (events.ts < promos.p_end)
        )
        .groupBy("promo_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.countDistinct("user_id").alias("n_users"))
        .collect()
    }
    assert fast == naive and fast


def test_hash_split_sample_is_stable_across_partitionings(spark, sf001_dir):
    """Membership in the md5 hash-split is a pure function of the key:
    repartitioning the input must not change the sampled set (df.sample
    gives no such guarantee)."""
    docs = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    ids_a = {r["doc_id"] for r in docs.filter(bucket.isin("0", "1")).select("doc_id").collect()}
    ids_b = {
        r["doc_id"]
        for r in docs.repartition(17)
        .filter(bucket.isin("0", "1"))
        .select("doc_id")
        .collect()
    }
    assert ids_a == ids_b and ids_a
