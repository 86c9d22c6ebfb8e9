"""URL canonicalization, hashing, host extraction, outlink expansion.

north_rule operators absent in the reference (SURVEY.md §2.5): URL
canonicalization + 64-bit hashing in vectorized Arrow UDFs / built-ins.

The *kernel* (:func:`canonicalize_url`, :func:`extract_outlinks`) is pure
Python and shared verbatim with the oracle crawler
(crawler_spark.oracle.crawler) so Spark and oracle can never drift.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize_url(url: str) -> str:
    """Canonical form: lowercase scheme+host, strip default port and
    fragment, empty path → '/'. Query preserved verbatim (order-sensitive —
    reordering could change crawl semantics on real sites)."""
    if not url:
        return ""
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return url.strip()
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    path = parts.path or "/"
    return urlunsplit((scheme, netloc, path, parts.query, ""))


_HREF_RE = re.compile(r'<a\s[^>]*?href="([^"]*)"', re.IGNORECASE | re.DOTALL)
# Java-regex twin of _HREF_RE for the JVM fast path (same dialect here)
HREF_PATTERN_JAVA = '<a\\s[^>]*?href="([^"]*)"'


def extract_outlinks(base_url: str, html: str) -> list[str]:
    """Outlinks of a page: href values in document order, resolved against
    the page URL, canonicalized, per-page first-occurrence dedup (the
    reference's per-page distinct, collector-url.go:31)."""
    out: list[str] = []
    seen: set[str] = set()
    for m in _HREF_RE.finditer(html):
        href = m.group(1).strip()
        if not href or href.startswith(("#", "javascript:", "mailto:")):
            continue
        absolute = urljoin(base_url, href)
        canon = canonicalize_url(absolute)
        if not canon.startswith(("http://", "https://")):
            continue
        if canon in seen:
            continue
        seen.add(canon)
        out.append(canon)
    return out


# --- Spark expressions -------------------------------------------------------

@pandas_udf(StringType())
def _canon_udf(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: canonicalize_url(u) if u is not None else "")


def canon_expr(url_col: Column) -> Column:
    """Vectorized canonicalization (Arrow pandas UDF)."""
    return _canon_udf(url_col)


def host_expr(canon_url_col: Column) -> Column:
    """Host of a canonical URL — JVM built-in (stays in codegen)."""
    return F.coalesce(F.parse_url(canon_url_col, F.lit("HOST")), F.lit(""))


def url_hash_expr(canon_url_col: Column) -> Column:
    """64-bit URL hash (north_star) — JVM xxhash64."""
    return F.xxhash64(canon_url_col)


def host_bucket_expr(host_col: Column, n_buckets: int) -> Column:
    """Salted host-hash bucket for partitioning frontier state."""
    return F.pmod(F.xxhash64(host_col), F.lit(n_buckets)).cast("int")


@pandas_udf(ArrayType(StringType()))
def _outlinks_udf(base: pd.Series, html: pd.Series) -> pd.Series:
    return pd.Series(
        [
            extract_outlinks(b if b is not None else "", h if h is not None else "")
            for b, h in zip(base, html)
        ]
    )


def outlinks_expr(url_col: Column, html_col: Column) -> Column:
    """Per-page canonical outlink array (order-preserving, deduped within
    the page). href *scan* could stay JVM-side via regexp_extract_all, but
    relative-URL resolution needs urljoin → single Arrow UDF doing both
    (one pass over the html)."""
    return _outlinks_udf(url_col, html_col.cast("string"))
