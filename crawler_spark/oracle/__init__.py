from crawler_spark.oracle.crawler import OracleResult, crawl_oracle  # noqa: F401
