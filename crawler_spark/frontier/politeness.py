"""robots.txt filtering + per-host politeness budget (north_rule operators).

Both absent in the reference (its only throttle is a global 100-ticket pool,
/root/reference/pool.go:3); semantics here are defined jointly with the
pure-Python oracle (crawler_spark.oracle.crawler).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def robots_allowed(frontier: DataFrame, robots: DataFrame) -> DataFrame:
    """Filter out URLs whose path starts with a disallowed prefix.

    ``robots(host, disallow_prefixes array<string>)`` is a per-host dim —
    tiny next to the frontier → broadcast join; prefix matching stays
    JVM-side via ``exists(startswith)``, no Python.
    Hosts with no robots row are allowed (crawler convention).
    """
    path = F.coalesce(F.parse_url(F.col("url_canon"), F.lit("PATH")), F.lit("/"))
    joined = frontier.join(
        F.broadcast(robots.select("host", "disallow_prefixes")), "host", "left"
    )
    disallowed = F.when(F.col("disallow_prefixes").isNull(), F.lit(False)).otherwise(
        F.exists(
            F.col("disallow_prefixes"),
            lambda p: path.startswith(p),
        )
    )
    return (
        joined.withColumn("_disallowed", disallowed)
        .filter(~F.col("_disallowed"))
        .drop("_disallowed", "disallow_prefixes")
    )


def apply_politeness_budget(
    frontier: DataFrame,
    politeness: DataFrame,
    default_budget: int = 16,
) -> tuple[DataFrame, DataFrame]:
    """Split the round's frontier into (scheduled, deferred).

    Per host, the first ``max_fetches_per_round`` entries in deterministic
    ``(priority, round_added, seq)`` order are scheduled this round; the rest
    carry over. This is the window-function replacement for the reference's
    global ticket pool (SURVEY.md §2.3 F6) — the ordering makes the schedule
    a *data* property, identical under any parallelism.

    Scale note (hot-host skew): the window partitions by ``host``, so a
    single hot host would rank all its rows in ONE task. Two measures keep
    that off the critical path at 10^10-URL scale:

    * the ``_rk <= lit(cap)`` bound (cap = the max budget across the
      politeness dim, a tiny driver-side max) lets Catalyst plan a
      *partial* ``WindowGroupLimit`` BEFORE the shuffle — every map task
      keeps at most ``cap`` rows per host, so the post-shuffle hot-host
      partition holds ≤ cap × map_tasks rows instead of the host's whole
      frontier;
    * ``deferred`` is frontier ∖ scheduled via a ``left_anti`` join on the
      unique ``url_canon`` key (hash-partitioned — host-skew-free) instead
      of the ``rank > budget`` side of a full window, which would have
      forced ranking every row of the hot host anyway.
    """
    dim_max = politeness.agg(F.max("max_fetches_per_round")).collect()[0][0]
    cap = max(default_budget, dim_max) if dim_max is not None else default_budget
    joined = frontier.join(
        F.broadcast(politeness.select("host", "max_fetches_per_round")), "host", "left"
    ).withColumn(
        "_budget",
        F.coalesce(F.col("max_fetches_per_round"), F.lit(default_budget)),
    )
    w = Window.partitionBy("host").orderBy("priority", "round_added", "seq")
    ranked = joined.withColumn("_rk", F.row_number().over(w))
    # the literal bound is implied by (_rk <= _budget) but triggers the
    # map-side WindowGroupLimit; keep it first in the conjunction.
    scheduled = ranked.filter(
        (F.col("_rk") <= F.lit(cap)) & (F.col("_rk") <= F.col("_budget"))
    ).drop("_rk", "_budget", "max_fetches_per_round")
    deferred = frontier.join(
        scheduled.select("url_canon"), "url_canon", "left_anti"
    )
    return scheduled, deferred
