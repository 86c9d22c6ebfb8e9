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


# --- vectorized batch kernels ------------------------------------------------
#
# north_star forbids per-row Python: the batch kernels below run pandas
# .str vectorized ops over the whole Arrow batch, with a per-row fallback
# ONLY for rare shapes (userinfo, IPv6, out-of-range ports, exotic
# relatives) — byte-equality with the pure-Python kernels is pinned by
# tests/test_frontier.py.

# "simple" URL: scheme://host[:port][/path][?query][#frag], no userinfo,
# no IPv6 brackets — covers essentially every crawl-frontier URL.
_FAST_URL_RE = re.compile(
    r"^([A-Za-z][A-Za-z0-9+.\-]*)://([A-Za-z0-9.\-]*)(?::([0-9]{1,5}))?"
    r"(/[^?#]*)?(?:\?([^#]*))?(?:#.*)?$"
)


def _canon_batch(urls: pd.Series) -> pd.Series:
    """Vectorized :func:`canonicalize_url` over a batch."""
    s = urls.fillna("").str.strip()
    m = s.str.extract(_FAST_URL_RE)
    port_num = pd.to_numeric(m[2], errors="coerce")
    fast = m[0].notna() & (m[2].isna() | (port_num <= 65535))
    out = pd.Series(index=s.index, dtype=object)
    if fast.any():
        scheme = m.loc[fast, 0].str.lower()
        host = m.loc[fast, 1].str.lower()
        default = scheme.map(_DEFAULT_PORTS)
        pn = port_num[fast]
        keep_port = pn.notna() & (pn.astype("Int64").astype(str) != default)
        port_sfx = pd.Series("", index=scheme.index)
        port_sfx[keep_port] = ":" + pn[keep_port].astype("Int64").astype(str)
        path = m.loc[fast, 3].fillna("/")
        query = m.loc[fast, 4]
        q_sfx = pd.Series("", index=scheme.index)
        # empty query string is dropped entirely (urlunsplit omits bare '?')
        has_q = query.notna() & (query != "")
        q_sfx[has_q] = "?" + query[has_q]
        out[fast] = scheme + "://" + host + port_sfx + path + q_sfx
    slow = ~fast
    if slow.any():
        out[slow] = s[slow].map(canonicalize_url)
    return out


def _resolve_batch(base: pd.Series, href: pd.Series) -> pd.Series:
    """Vectorized urljoin for the two dominant shapes (absolute URL,
    root-relative path); everything else falls back to urljoin per row."""
    out = pd.Series(index=href.index, dtype=object)
    is_abs = href.str.match(r"[A-Za-z][A-Za-z0-9+.\-]*://")
    out[is_abs] = href[is_abs]
    root_rel = href.str.startswith("/") & ~href.str.startswith("//")
    origin = base.str.extract(r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)")[0]
    ok = root_rel & origin.notna() & out.isna()
    out[ok] = origin[ok] + href[ok]
    rest = out.isna()
    if rest.any():
        out[rest] = [urljoin(b, h) for b, h in zip(base[rest], href[rest])]
    return out


def _outlinks_batch(base: pd.Series, html: pd.Series) -> pd.Series:
    """Vectorized :func:`extract_outlinks` over a batch: extractall for the
    href scan, batch resolve + canonicalize, per-page first-occurrence
    dedup — document order preserved by the (row, match) index."""
    base = base.fillna("")
    html = html.fillna("")
    empty: pd.Series = pd.Series([[] for _ in range(len(base))], index=base.index)
    hits = html.str.extractall(_HREF_RE)
    if len(hits) == 0:
        return empty
    href = hits[0].str.strip()
    row_idx = hits.index.get_level_values(0)
    keep = (href != "") & ~href.str.startswith(("#", "javascript:", "mailto:"))
    href, row_idx = href[keep], row_idx[keep.to_numpy()]
    if len(href) == 0:
        return empty
    resolved = _resolve_batch(base.loc[row_idx].set_axis(href.index), href)
    canon = _canon_batch(resolved)
    keep2 = canon.str.startswith(("http://", "https://"))
    flat = pd.DataFrame(
        {"row": row_idx[keep2.to_numpy()], "url": canon[keep2].to_numpy()}
    )
    flat = flat.drop_duplicates(subset=["row", "url"], keep="first")
    grouped = flat.groupby("row", sort=False)["url"].agg(list)
    out = empty.copy()
    out.update(grouped)
    return out


# --- Spark expressions -------------------------------------------------------

@pandas_udf(StringType())
def _canon_udf(urls: pd.Series) -> pd.Series:
    return _canon_batch(urls)


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
    return _outlinks_batch(base, html)


def outlinks_expr(url_col: Column, html_col: Column) -> Column:
    """Per-page canonical outlink array (order-preserving, deduped within
    the page). href *scan* could stay JVM-side via regexp_extract_all, but
    relative-URL resolution needs urljoin → single Arrow UDF doing both
    (one pass over the html)."""
    return _outlinks_udf(url_col, html_col.cast("string"))
