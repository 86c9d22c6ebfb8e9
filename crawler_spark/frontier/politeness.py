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

    Scale note: the window partitions by ``host``; a pathological single-host
    frontier would skew one partition. The scheduler pre-partitions frontier
    state by salted host-bucket and AQE splits skewed partitions; the window
    itself only ranks within one host's rows.
    """
    joined = frontier.join(
        F.broadcast(politeness.select("host", "max_fetches_per_round")), "host", "left"
    ).withColumn(
        "_budget",
        F.coalesce(F.col("max_fetches_per_round"), F.lit(default_budget)),
    )
    w = Window.partitionBy("host").orderBy("priority", "round_added", "seq")
    ranked = joined.withColumn("_rk", F.row_number().over(w))
    scheduled = ranked.filter(F.col("_rk") <= F.col("_budget")).drop(
        "_rk", "_budget", "max_fetches_per_round"
    )
    deferred = ranked.filter(F.col("_rk") > F.col("_budget")).drop(
        "_rk", "_budget", "max_fetches_per_round"
    )
    return scheduled, deferred
