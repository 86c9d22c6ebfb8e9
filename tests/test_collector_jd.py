"""jd-shaped end-to-end extraction (mirrors /root/reference/example/jd/main.go).

The 8-field collector over detail pages, including both follow-up-fetch
fields (GetFromNextPage → left join), compared row-for-row against the pure
Python oracle built from the rule kernels.
"""

import pytest
from pyspark.sql import functions as F

from crawler_spark.collector import extract_fields
from crawler_spark.corpus import make_corpus
from crawler_spark.examples.jd import jd_fields, oracle_row

CAT = "charity"


@pytest.fixture(scope="module")
def corpus_tables():
    return make_corpus(seed=42, n_hosts=4, pages_per_host=5)


def test_jd_extraction_matches_oracle(spark, corpus_tables):
    pages_pd = corpus_tables["pages"]
    corpus_dict = {r.url: bytes(r.html).decode("utf-8") for r in pages_pd.itertuples()}
    detail_urls = [u for u in corpus_dict if "/project/details/" in u]
    assert len(detail_urls) >= 10

    pages = spark.createDataFrame(pages_pd).select(
        F.col("url").alias("url_canon"), "html"
    )
    fetched = pages.filter(F.col("url_canon").isin(detail_urls))
    out = extract_fields(fetched, jd_fields(CAT), corpus=pages)
    got = {r["url_canon"]: r.asDict() for r in out.collect()}

    assert set(got) == set(detail_urls)
    for url in detail_urls:
        want = oracle_row(url, corpus_dict[url], corpus_dict, CAT)
        g = {k: v for k, v in got[url].items() if k != "url_canon"}
        assert g == want, url

    n_tiers = [int(got[u]["n_tiers"]) for u in detail_urls]
    assert max(n_tiers) >= 1
    assert any(got[u]["funder_supported"] != "" for u in detail_urls)
    assert any(got[u]["min_price"] not in ("", "0") for u in detail_urls)


def test_follow_up_missing_page_yields_empty(spark, corpus_tables):
    """URL whose id has no funder page → '' (GetFromNextPage error path,
    util.go:56-59: rule NOT applied on fetch failure)."""
    pages = spark.createDataFrame(corpus_tables["pages"]).select(
        F.col("url").alias("url_canon"), "html"
    )
    fake = spark.createDataFrame(
        [("https://z.example/project/details/999999.html", b"<p class='p-title'>x</p>")],
        "url_canon string, html binary",
    )
    out = extract_fields(fake, jd_fields(CAT), corpus=pages).collect()[0]
    assert out["funder_supported"] == ""
    assert out["funder_started"] == ""
