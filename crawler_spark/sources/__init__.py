"""Input sources beyond parquet/Iceberg: the web-archive formats a crawl
engine meets in the wild."""

from crawler_spark.sources.warc import read_warc  # noqa: F401
