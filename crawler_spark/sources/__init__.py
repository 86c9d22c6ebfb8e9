"""Input sources beyond parquet/Iceberg: the web-archive formats a crawl
engine meets in the wild."""

from crawler_spark.sources.warc import read_warc, read_wet  # noqa: F401
from crawler_spark.sources.sitemap import sitemap_entries_expr, sitemap_seeds  # noqa: F401
