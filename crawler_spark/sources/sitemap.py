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
