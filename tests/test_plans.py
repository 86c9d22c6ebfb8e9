"""Physical-plan audits — the scale claims, pinned as assertions.

The scale story (SURVEY.md §4, README "Design for 10^10-URL scale") makes
concrete promises about PLAN SHAPE: dims broadcast, parquet scans receive
pushed filters and pruned schemas, the bucketed fetch join is a shuffled-hash
join (never a sort-merge that sorts page bodies), and no frontier-sized
dataset ever funnels through a single partition. Correctness tests can't see
any of that — these read the formatted explain output the way a reviewer
would and fail if a regression quietly changes the strategy.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from crawler_spark.frontier.politeness import apply_politeness_budget
from crawler_spark.scheduler import _assign_seq


def _plan(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_dim_joins_are_broadcast(spark, sf001_dir):
    """Q5-shape 6-table join: the hinted dims (nation⋈region, supplier) must
    plan as broadcast joins — at 100× the fact tables, any dim that falls
    back to shuffle ships the fact chain through an extra exchange."""
    import __spark_entry__ as E

    plan = _plan(E.q_local_supplier_volume(spark, sf001_dir))
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_parquet_scan_pushdown_and_pruning(spark, sf001_dir):
    """A filtered two-column projection must reach the parquet reader as a
    pushed filter + pruned ReadSchema — a scan that decodes `text` (the
    wide column) for a doc_id listing is wrong at any scale."""
    docs = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    df = docs.filter(F.col("lang") == "en").select("doc_id", "lang")
    plan = _plan(df)
    assert "PushedFilters" in plan and "EqualTo(lang,en)" in plan, plan
    # ReadSchema carries only the needed columns; `text` must not be decoded
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "text" not in read_schema[0], plan


def test_bucketed_fetch_join_is_shuffled_hash(spark):
    """The big-round fetch join (corpus stored bucketed by url_canon) must be
    a shuffled-hash join: sort-merge would sort the html-bearing side inside
    every bucket — pure waste that grows with page size."""
    pages = spark.range(1000).select(
        F.format_string("https://h%d.example.com/p/%d", F.pmod("id", F.lit(7)), "id").alias(
            "url_canon"
        ),
        F.lit("<html></html>").alias("html"),
    ).repartition(8, "url_canon")
    sched = spark.range(100).select(
        F.format_string("https://h%d.example.com/p/%d", F.pmod("id", F.lit(7)), "id").alias(
            "url_canon"
        )
    )
    joined = pages.join(
        sched.repartition(8, "url_canon").hint("shuffle_hash"), "url_canon", "left_semi"
    )
    plan = _plan(joined)
    assert "ShuffledHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def _frontier_df(spark, n=200, hosts=5):
    return spark.range(n).select(
        F.format_string("https://h%d.example.com/p/%d", F.pmod("id", F.lit(hosts)), "id").alias(
            "url_canon"
        ),
        F.format_string("h%d.example.com", F.pmod("id", F.lit(hosts))).alias("host"),
        F.pmod("id", F.lit(8)).cast("int").alias("bucket"),
        F.xxhash64("id").alias("url_hash"),
        F.lit(0).alias("priority"),
        F.lit(0).alias("round_added"),
        F.col("id").alias("seq"),
    )


def test_assign_seq_has_no_single_partition_exchange(spark):
    """The global admission-order rank is two-phase (range partition +
    per-partition row_number + offsets) — a plain global window would show
    up here as `Exchange SinglePartition`, the one-task bottleneck that
    kills a 10^8-URL round."""
    cands = _frontier_df(spark).select(
        "url_canon",
        "host",
        "bucket",
        "url_hash",
        "priority",
        F.col("seq").alias("first_occ_a"),
        F.lit(0).cast("long").alias("first_occ_b"),
    )
    out = _assign_seq(cands, 0, 0)
    plan = _plan(out)
    assert "SinglePartition" not in plan, plan
    # sanity: it still produces a dense 0..n-1 seq
    seqs = sorted(r["seq"] for r in out.select("seq").collect())
    assert seqs == list(range(200))
    cache = getattr(out, "_assign_seq_cache", None)
    if cache is not None:
        cache.unpersist()


def test_politeness_window_has_no_single_partition_exchange(spark):
    """The per-host budget window partitions by host — never a global sort."""
    politeness = spark.createDataFrame([], "host string, max_fetches_per_round int")
    scheduled, deferred = apply_politeness_budget(
        _frontier_df(spark), politeness, default_budget=4, cap=4
    )
    for df in (scheduled, deferred):
        assert "SinglePartition" not in _plan(df)
    assert scheduled.count() == 5 * 4  # 5 hosts × budget 4


def test_state_snapshot_salting_spreads_hot_host(spark, tmp_path):
    """One host holding 90% of the frontier maps to ONE bucket; the snapshot
    repartition must still spread its rows across tasks via the url_hash
    salt instead of writing them through a single partition."""
    from crawler_spark.scheduler import _snapshot

    hot = spark.range(9000).select(
        F.format_string("https://hot.example.com/p/%d", "id").alias("url_canon"),
        F.lit("hot.example.com").alias("host"),
        F.lit(3).cast("int").alias("bucket"),
        F.xxhash64(F.format_string("https://hot.example.com/p/%d", "id")).alias("url_hash"),
    )
    cold = spark.range(1000).select(
        F.format_string("https://h%d.example.com/", "id").alias("url_canon"),
        F.format_string("h%d.example.com", "id").alias("host"),
        F.pmod("id", F.lit(8)).cast("int").alias("bucket"),
        F.xxhash64("id").alias("url_hash"),
    )
    snap = _snapshot(spark, hot.unionByName(cold), str(tmp_path / "state"), 8)
    sizes = [
        r["n"]
        for r in snap.groupBy(F.spark_partition_id().alias("p")).agg(F.count("*").alias("n")).collect()
    ]
    assert snap.count() == 10000
    # without the salt the hot bucket's 9000 rows land in one partition
    assert max(sizes) < 4000, sizes


def test_bloom_probe_is_jvm_and_reuses_admission_exchange(spark):
    """The broadcast Bloom probe must stay PURE JVM (r3): an Arrow/pandas
    probe node hides the child's hash partitioning from the planner, which
    re-exchanged every candidate of the round for the exact anti-join
    (measured 269 MB of a 6M round's ~850 MB shuffled). Pin: (a) no Python
    eval node anywhere in the unseen filter, (b) exactly ONE exchange of
    the candidates side — the admission dedup's — with the bitmap join
    arriving broadcast."""
    from crawler_spark.frontier.seen import BloomState, filter_unseen
    from crawler_spark.scheduler import _dedup_candidates

    cands = spark.range(1000).select(
        F.format_string("https://h%d.example/p/%d", F.pmod("id", F.lit(7)), F.col("id")
        ).alias("url_canon"),
        F.lit(0).alias("priority"),
        F.col("id").alias("first_occ_a"),
        F.lit(0).cast("long").alias("first_occ_b"),
    )
    cands = _dedup_candidates(cands, 8)
    seen = spark.range(300).select(
        F.format_string("https://h%d.example/p/%d", F.pmod("id", F.lit(7)), F.col("id")
        ).alias("url_canon"),
        F.xxhash64(F.format_string("x%d", F.col("id"))).alias("url_hash"),
        F.pmod("id", F.lit(8)).cast("int").alias("bucket"),
    )
    bs = BloomState(8, 1 << 13)
    bloom = bs.merge(bs.empty(spark), seen.select("bucket", "url_hash"))
    plan = _plan(filter_unseen(cands, seen, bloom, bs))
    # (a) the probe is expressions, not a Python eval stage (the bloom MERGE
    # sub-plan is applyInPandas by design — assert on the probe path only:
    # no ArrowEvalPython, which is what scalar pandas_udfs plan as)
    assert "ArrowEvalPython" not in plan, plan
    # (b) candidate side: one exchange (the dedup groupBy), none added for
    # the anti-join above it — the bitmaps ride an array literal (a plain
    # Project), not a join, so only the seen side can add an exchange
    cand_exchanges = plan.count("Exchange hashpartitioning(url_canon")
    assert cand_exchanges <= 2, plan  # dedup + seen side, nothing extra


def test_anti_join_filter_pushed_and_broadcast(spark, sf001_dir):
    """customers_without_orders: the o_orderdate predicate must reach the
    orders parquet scan (row-group skipping at 100 TB) and the filtered side
    must broadcast — an unfiltered shuffle anti-join reads+exchanges the
    whole orders table to discard most of it."""
    import __spark_entry__ as E

    plan = _plan(E.q_customers_without_orders(spark, sf001_dir))
    assert "GreaterThanOrEqual(o_orderdate" in plan, plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_cosine_topk_broadcasts_queries_not_corpus(spark, sf001_dir):
    """cosine_topk: the small query batch is the broadcast side; the corpus
    is scanned exactly once map-side. A corpus broadcast would OOM the
    executors at any real scale."""
    import __spark_entry__ as E

    plan = _plan(E.q_embedding_topk(spark, sf001_dir))
    # exactly one broadcast exchange node in the tree (the filtered
    # vec_id < 10 batch); the formatted output repeats nodes in a detail
    # section, so count tree-form occurrences only
    assert plan.count("BroadcastExchange (") == 1, plan
    assert "PushedFilters: [IsNotNull(vec_id), LessThan(vec_id,10)]" in plan, plan


def test_lang_id_expression_tree_is_linear_in_languages(spark, sf001_dir):
    """Regression pin for the when-chain argmax blowup: the optimized
    lang-ID expression must stay linear in the number of languages (each
    stopword counter appears once), not O(2^K) from nested when-folds."""
    from crawler_spark.pipeline.textstats import STOPWORDS, lang_id_expr

    docs = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    tree = (
        docs.select(lang_id_expr(F.col("text")).alias("lang"))
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # one tokenize per language; the broken form had 2^(K-1)+ copies
    assert tree.count("split(lower(text)") <= len(STOPWORDS) + 1, len(tree)


def test_q21_shape_joins_are_hash_not_nested_loop(spark, sf001_dir):
    """sole_returned_supplier's EXISTS/NOT-EXISTS carry an inequality
    residual (suppkey ≠ suppkey) on top of the orderkey equi-key; the plan
    must keep the equi-key as the join key (hash joins) — a
    BroadcastNestedLoopJoin here is O(orders × orders) at scale."""
    import __spark_entry__ as E

    plan = _plan(E.q_sole_returned_supplier(spark, sf001_dir))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "LeftSemi" in plan and "LeftAnti" in plan, plan


def test_min_cost_supplier_broadcasts_dims(spark, sf001_dir):
    """Q2 shape: part and supplier are dims — both must broadcast; the
    offers→mins re-join is the only fact-sized exchange."""
    import __spark_entry__ as E

    plan = _plan(E.q_min_cost_supplier(spark, sf001_dir))
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_substring_dup_spans_markback_is_semi_never_pairs(spark, sf001_dir):
    """Exact substring dedup's duplicate mark-back must be a SEMI
    equi-join on the gram hash (broadcast while the dup set is small,
    shuffled past the threshold) — a nested-loop fallback would be
    grams², i.e. corpus² in duplicated regions. The islands merge must
    also compute BOTH window frames over ONE doc_id sort (two Window
    nodes, exactly one doc_id exchange)."""
    from crawler_spark.pipeline import dedup as dd

    docs = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    out = dd.substring_dup_spans(docs, "doc_id", "text", k=5)
    plan = _plan(out)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "LeftSemi" in plan, plan
    # simple mode prints each operator once — count nodes there
    simple = _plan(out, "simple")
    assert simple.count("Window") == 2, simple
    assert simple.count("hashpartitioning(doc_id") == 1, simple


def test_substring_dedup_apply_no_nested_loop_and_gram_equi_join(spark, sf001_dir):
    """The applied substring dedup (r5) must keep every join an equi-join:
    the dup/keep-first mark-back joins on gram_h, the span re-join on
    doc_id — a nested-loop anywhere would be corpus² at scale. The
    keep-first winner must come from the gram-keyed AGGREGATE (min-struct,
    map-side combinable), not a per-gram sort window: exactly the islands
    merge's doc_id Window pair may appear, no Window on gram_h."""
    from crawler_spark.pipeline import dedup as dd

    docs = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    out = dd.substring_dedup_apply(docs, "doc_id", "text", k=5)
    plan = _plan(out)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    simple = _plan(out, "simple")
    assert simple.count("Window") == 2, simple  # islands merge only
    assert "windowspecdefinition(gram_h" not in simple, simple


def test_cdc_chunk_dedup_in_row_chunking_one_equi_join(spark, sf001_dir):
    """CDC chunk dedup (r5): chunking must be in-row (NO Window, NO
    doc-keyed exchange before the explode) and the keep-first mark-back an
    equi-join on chunk_hash — nested-loop would be chunks² at scale."""
    from crawler_spark.pipeline import dedup as dd

    docs = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    out = dd.cdc_chunk_dedup(docs, "doc_id", "text", modulus=8)
    plan = _plan(out)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    simple = _plan(out, "simple")
    assert "Window" not in simple, simple


def test_semantic_dedup_pair_join_is_equi_on_cluster(spark, sf001_dir):
    """SemDeDup's within-cluster pair join must be an equi-join on cid —
    a nested-loop fallback would be corpus² regardless of clustering."""
    from crawler_spark.pipeline import similarity as sim

    emb = spark.read.parquet(f"{sf001_dir}/embeddings.parquet")
    out = sim.semantic_dedup(emb, "vec_id", "embedding", n_centroids=4, threshold=0.35)
    plan = _plan(out)
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_disjunctive_predicate_joins_hash_not_nested_loop(spark, sf001_dir):
    """Q19 shape: the OR-of-conjunctions spans both join sides, but the
    common l_partkey equi-key must still plan as a (broadcast) hash join
    with the disjunction as a residual filter — BroadcastNestedLoopJoin
    here is O(lineitem × part) at scale."""
    import __spark_entry__ as E

    plan = _plan(E.q_disjunctive_part_revenue(spark, sf001_dir))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_global_scalar_threshold_is_broadcast_not_rescanned(spark, sf001_dir):
    """Q11 shape: the global (total, n_parts) 1-row aggregate must enter
    the compare as a broadcast into the cross join, and the ONLY
    SinglePartition exchange is the one feeding that scalar aggregate —
    the part-sized side stays hash-partitioned on l_partkey throughout
    (the twin l_partkey exchanges are runtime-reused by AQE exchange reuse)."""
    import __spark_entry__ as E

    plan = _plan(E.q_important_parts(spark, sf001_dir))
    assert "BroadcastExchange" in plan, plan
    assert plan.count("SinglePartition") == 1, plan
    assert "hashpartitioning(l_partkey" in plan, plan


def test_boilerplate_strip_single_span_exchange(spark):
    """boilerplate_strip's distinct-doc count is two stacked windows (lag
    marks a doc's first copy, sum counts the marks) sharing ONE
    (group, span) exchange — the groupBy(countDistinct)+self-join
    formulation would shuffle the span text TWICE. Pin exactly one
    hashpartitioning exchange keyed on (source, span) in the plan."""
    from crawler_spark.pipeline import dedup as dd

    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.format_string("s%d", F.pmod("id", F.lit(5))).alias("source"),
        F.format_string("w%d x y z w%d", F.pmod("id", F.lit(9)), "id").alias("text"),
    )
    plan = _plan(dd.boilerplate_strip(docs, "doc_id", "text", "source"))
    # formatted mode puts the partitioning keys on the Arguments: line of
    # each Exchange node, not on the node line itself
    span_exchanges = [
        ln
        for ln in plan.splitlines()
        if "hashpartitioning(" in ln and "span#" in ln and "source#" in ln
    ]
    assert len(span_exchanges) == 1, plan


def test_inverted_postings_group_limit_and_broadcast_df(spark):
    """The posting-list rank must plan as a map-side WindowGroupLimit (a
    100-TB stopword's raw postings are the corpus — each partition may
    forward at most k rows per term), and the vocab-sized df table must
    broadcast, not shuffle-join, onto the k-bounded posting rows."""
    from crawler_spark.pipeline import textstats as ts

    docs = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.format_string("w%d common w%d", F.pmod("id", F.lit(7)), "id").alias("text"),
    )
    plan = _plan(ts.inverted_postings(docs, "doc_id", "text", k=5))
    assert "WindowGroupLimit" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_sequence_pack_two_exchanges_no_udf(spark, sf001_dir):
    """Sequence packing (r5): piece explosion must be IN-ROW (no UDF, no
    exchange before the explode) and the whole op exactly TWO keyed
    exchanges — the per-source cumsum window and the per-pack stats
    window. A SinglePartition exchange anywhere would serialize the
    corpus."""
    from crawler_spark.pipeline.packing import sequence_pack

    docs = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    out = sequence_pack(docs, "doc_id", "text", "source", budget=64)
    simple = _plan(out, "simple")
    assert simple.count("Exchange") == 2, simple
    assert "SinglePartition" not in simple, simple
    assert "EvalPython" not in simple, simple  # no Arrow/pandas UDF anywhere


def test_containment_decontaminate_bench_broadcast_no_gram_shuffle(
    spark, sf001_dir
):
    """Containment decontamination (r5): the benchmark shingle frame must
    BROADCAST into the train-gram join — a shingle-keyed exchange of the
    exploded train grams would be fact-sized at 100 TB. Exactly the
    (train, bench)-pair aggregate may shuffle."""
    from crawler_spark.pipeline import textstats as ts

    docs = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    out = ts.containment_decontaminate(
        docs.filter(F.col("doc_id") >= 5),
        docs.filter(F.col("doc_id") < 5),
        "doc_id",
        "text",
    )
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    simple = _plan(out, "simple")
    assert "hashpartitioning(shingle" not in simple, simple


def test_adaptive_politeness_single_host_exchange_no_window(spark, sf001_dir):
    """Adaptive politeness (r5): ONE host-keyed exchange with map-side
    partial collect_list; the EWMA fold is an in-row aggregate — no
    Window, no second exchange, no UDF."""
    from crawler_spark.frontier.politeness import adaptive_politeness

    ev = spark.read.parquet(f"{sf001_dir}/events.parquet")
    log = ev.select(
        F.concat(F.lit("h"), F.pmod("user_id", F.lit(50)).cast("string")).alias(
            "host"
        ),
        "ts",
        F.col("value").alias("latency_ms"),
    )
    out = adaptive_politeness(log)
    simple = _plan(out, "simple")
    assert simple.count("Exchange") == 1, simple
    assert "Window" not in simple, simple
    assert "EvalPython" not in simple, simple


def test_url_canon_expressions_are_map_only_codegen(spark, sf001_dir):
    """registrable_domain_expr + strip_tracking_params_expr (r5) are pure
    whole-stage-codegen expressions: NO exchange, NO Python evaluation —
    they ride the canonicalization scan for free."""
    from crawler_spark.frontier.canon import (
        registrable_domain_expr,
        strip_tracking_params_expr,
    )

    docs = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    out = docs.select(
        registrable_domain_expr(F.col("source")).alias("reg"),
        strip_tracking_params_expr(
            F.concat(F.lit("http://h/p?utm_a=1&x="), F.col("doc_id").cast("string"))
        ).alias("u"),
    )
    simple = _plan(out, "simple")
    assert "Exchange" not in simple, simple
    assert "EvalPython" not in simple, simple
    # "*" prefixes whole-stage-codegen operators in simple mode
    assert "*(" in simple, simple
