"""Sitemap (sitemaps.org XML) → frontier seed rows, pure built-ins.

The discovery channel next to outlink expansion: a host's sitemap lists
canonical URLs (often with lastmod). Parsing is one regexp family over
the body — codegen, map-only, no XML library (sitemaps are
machine-generated and regular; a malformed block simply contributes no
rows, matching the reference's silent-skip philosophy,
/root/reference/pager.go:44-46).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_LOC_RE = r"(?s)<loc>\s*(.*?)\s*</loc>"
_LASTMOD_RE = r"(?s)<lastmod>\s*(.*?)\s*</lastmod>"


def sitemap_entries_expr(xml: Column) -> Column:
    """``array<struct<loc,lastmod>>`` in document order. Each ``<url>``
    block is isolated first so a lastmod can never pair with a
    neighboring block's loc; blocks without a loc are dropped; lastmod
    is NULL-able ('' → null)."""
    blocks = F.split(xml, "</url>")
    entries = F.transform(
        blocks,
        lambda b: F.struct(
            F.regexp_extract(b, _LOC_RE, 1).alias("loc"),
            F.nullif(F.regexp_extract(b, _LASTMOD_RE, 1), F.lit("")).alias(
                "lastmod"
            ),
        ),
    )
    return F.filter(entries, lambda e: e["loc"] != "")


def sitemap_seeds(
    df: DataFrame, host_col: str = "host", xml_col: str = "sitemap_xml"
) -> DataFrame:
    """``(host, url, lastmod, seq)`` frontier seeds; ``seq`` is the
    sitemap's document order (the crawl-ordering contract, SURVEY §3:
    order is a data property)."""
    return df.select(
        F.col(host_col).alias("host"),
        F.posexplode(sitemap_entries_expr(F.col(xml_col))).alias("seq", "e"),
    ).select(
        "host",
        F.col("e.loc").alias("url"),
        F.col("e.lastmod").alias("lastmod"),
        F.col("seq").cast("int").alias("seq"),
    )


def discover_sitemap_seeds(
    robots_df: DataFrame,
    corpus_df: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
    corpus_url_col: str = "sitemap_url",
    corpus_xml_col: str = "sitemap_xml",
) -> DataFrame:
    """The full discovery channel end to end: robots.txt ``Sitemap:``
    directives → fetch-as-join against the sitemap corpus → ordered seed
    rows ``(host, url, lastmod, sitemap_seq, url_seq)``.

    ``sitemap_seq`` is the directive's document order within the host's
    robots body, ``url_seq`` the url's order within its sitemap — the
    frontier ordering contract extends through the composition exactly as
    it does through sitemapindex nesting. Directives pointing at sitemaps
    the corpus doesn't have skip silently (inner join — the pager.go:44-46
    philosophy); hosts without directives contribute nothing. Both halves
    are codegen map-only, the join is the only exchange."""
    from crawler_spark.frontier.politeness import sitemaps_from_robots

    found = sitemaps_from_robots(robots_df, host_col, text_col)
    corpus = corpus_df.select(
        F.col(corpus_url_col).alias("sitemap_url"),
        F.col(corpus_xml_col).alias("_sm_xml"),
    )
    fetched = found.join(corpus, "sitemap_url")
    return fetched.select(
        "host",
        F.col("pos").alias("sitemap_seq"),
        F.posexplode(sitemap_entries_expr(F.col("_sm_xml"))).alias("url_seq", "e"),
    ).select(
        "host",
        F.col("e.loc").alias("url"),
        F.col("e.lastmod").alias("lastmod"),
        F.col("sitemap_seq").cast("int").alias("sitemap_seq"),
        F.col("url_seq").cast("int").alias("url_seq"),
    )


def sitemap_index_expr(xml: Column) -> Column:
    """``array<string>`` of child-sitemap locs from a ``<sitemapindex>``
    body, document order (blocks isolated on ``</sitemap>`` the same way
    url blocks are; empty locs dropped)."""
    blocks = F.split(xml, "</sitemap>")
    locs = F.transform(blocks, lambda b: F.regexp_extract(b, _LOC_RE, 1))
    return F.filter(locs, lambda loc: loc != "")


def expand_sitemap_index(
    index_df: DataFrame,
    corpus_df: DataFrame,
    host_col: str = "host",
    index_xml_col: str = "sitemap_xml",
    corpus_url_col: str = "sitemap_url",
    corpus_xml_col: str = "sitemap_xml",
) -> DataFrame:
    """Two-level sitemap discovery: ``<sitemapindex>`` → child sitemaps →
    seed rows ``(host, url, lastmod, index_seq, url_seq)``.

    The child fetch is an inner equi-join against the sitemap corpus —
    the same fetch-as-join the crawl uses for pages (and the same silent
    skip for children the corpus doesn't have, pager.go:44-46 philosophy).
    Ordering stays a data property: ``index_seq`` is the child's position
    in the index, ``url_seq`` the url's position in the child, so the
    frontier ordering contract extends through the nesting. One broadcast-
    able explode side, one join keyed on the child URL — no driver loop
    over sitemaps, however many the index lists."""
    children = index_df.select(
        F.col(host_col).alias("host"),
        F.posexplode(sitemap_index_expr(F.col(index_xml_col))).alias(
            "index_seq", "child_url"
        ),
    )
    corpus = corpus_df.select(
        F.col(corpus_url_col).alias("child_url"),
        F.col(corpus_xml_col).alias("child_xml"),
    )
    fetched = children.join(corpus, "child_url")
    return fetched.select(
        "host",
        "index_seq",
        F.posexplode(sitemap_entries_expr(F.col("child_xml"))).alias("url_seq", "e"),
    ).select(
        "host",
        F.col("e.loc").alias("url"),
        F.col("e.lastmod").alias("lastmod"),
        F.col("index_seq").cast("int").alias("index_seq"),
        F.col("url_seq").cast("int").alias("url_seq"),
    )


_CHANGEFREQ_RE = r"(?s)<changefreq>\s*(.*?)\s*</changefreq>"
_PRIORITY_RE = r"(?s)<priority>\s*(.*?)\s*</priority>"

# sitemaps.org changefreq → refresh interval in minutes ('always' ~ 1 min,
# 'never' = effectively infinite so staleness stays ~0). A missing or
# unknown value behaves like weekly — the protocol calls the field a hint.
CHANGEFREQ_MINUTES: tuple[tuple[str, int], ...] = (
    ("always", 1),
    ("hourly", 60),
    ("daily", 1440),
    ("weekly", 10080),
    ("monthly", 43200),
    ("yearly", 525600),
    ("never", 1 << 40),
)


def sitemap_rich_entries_expr(xml: Column) -> Column:
    """``array<struct<loc,lastmod,changefreq,priority>>`` in document
    order — :func:`sitemap_entries_expr` plus the two optional scheduling
    hints of sitemaps.org (changefreq, priority), '' → null, per-block
    isolation so fields can never pair across neighboring <url> blocks."""
    blocks = F.split(xml, "</url>")
    entries = F.transform(
        blocks,
        lambda b: F.struct(
            F.regexp_extract(b, _LOC_RE, 1).alias("loc"),
            F.nullif(F.regexp_extract(b, _LASTMOD_RE, 1), F.lit("")).alias("lastmod"),
            F.nullif(F.regexp_extract(b, _CHANGEFREQ_RE, 1), F.lit("")).alias(
                "changefreq"
            ),
            F.nullif(F.regexp_extract(b, _PRIORITY_RE, 1), F.lit("")).alias(
                "priority"
            ),
        ),
    )
    return F.filter(entries, lambda e: e["loc"] != "")


def recrawl_priority(
    df: DataFrame,
    now: str,
    host_col: str = "host",
    xml_col: str = "sitemap_xml",
) -> DataFrame:
    """Recrawl scheduling from sitemap hints: per host, rank URLs by
    priority-weighted staleness — ``priority × minutes_since_lastmod /
    changefreq_interval_minutes`` — stalest-relative-to-its-cadence first.

    ``now`` is an explicit ISO timestamp (never wall clock: rounds must be
    reproducible and the oracle must replay bit-identically). The score is
    a pure ratio (IEEE ×,÷ — correctly rounded, engine-identical; no ln),
    ties broken by url ascending so rank is fully a data property.

    Output: ``(host, url, staleness, rnk)``. Map-only parse + one per-host
    window — the same politeness-window shape the scheduler already scales.
    """
    from pyspark.sql import Window

    freq = F.col("e.changefreq")
    interval = F.lit(float(10080))  # default: weekly
    for name, minutes in CHANGEFREQ_MINUTES:
        interval = F.when(freq == name, F.lit(float(minutes))).otherwise(interval)
    mins_since = F.col("_mins").cast("double")
    score = (
        F.coalesce(F.col("e.priority").cast("double"), F.lit(0.5))
        * mins_since
        / interval
    )
    entries = df.select(
        F.col(host_col).alias("host"),
        F.explode(sitemap_rich_entries_expr(F.col(xml_col))).alias("e"),
    ).withColumn(
        "_mins",
        F.timestamp_diff(
            "MINUTE",
            F.to_timestamp(F.coalesce(F.col("e.lastmod"), F.lit("1970-01-01"))),
            F.to_timestamp(F.lit(now)),
        ),
    )
    w = Window.partitionBy("host").orderBy(
        F.col("staleness").desc(), F.col("url").asc()
    )
    return (
        entries.select(
            "host",
            F.col("e.loc").alias("url"),
            score.alias("staleness"),
        )
        .withColumn("rnk", F.row_number().over(w))
    )
