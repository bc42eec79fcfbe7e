"""URL normalization (functions/urls.py) — crawl-pipeline primitives."""

import pytest
from pyspark.sql import functions as F

from etl_opensky_spark.functions.urls import (
    canonicalize_url,
    url_host,
    url_query_params,
    url_registered_domain,
)


def _one(spark, url, col):
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(col(F.col("url")).alias("x")).first()["x"]


@pytest.mark.parametrize(
    "url,host",
    [
        ("HTTP://WWW.Example.COM/a", "example.com"),
        ("https://news.bbc.co.uk/x", "news.bbc.co.uk"),
        ("notaurl", None),
        (None, None),
    ],
)
def test_host(spark, url, host):
    assert _one(spark, url, url_host) == host


@pytest.mark.parametrize(
    "url,dom",
    [
        ("https://news.bbc.co.uk/x", "bbc.co.uk"),
        ("https://a.b.example.com/x", "example.com"),
        ("https://example.com/x", "example.com"),
        ("https://localhost/x", "localhost"),
    ],
)
def test_registered_domain(spark, url, dom):
    assert _one(spark, url, url_registered_domain) == dom


def test_canonicalize_merges_only_true_aliases(spark):
    aliases = [
        "HTTP://WWW.Example.COM/a/b/?utm_source=x&z=1&a=2#frag",
        "http://example.com/a/b?a=2&utm_medium=y&z=1",
        "http://www.example.com/a/b/?z=1&a=2",
    ]
    distinct = [
        "http://example.com/a/b?a=2&z=1&q=3",  # extra real param
        "http://example.com/a/b/c",            # different path
        "https://example.com/a/b?a=2&z=1",     # different scheme
    ]
    df = spark.createDataFrame([(u,) for u in aliases + distinct],
                               "url string")
    canon = df.select(canonicalize_url(F.col("url")).alias("c"))
    got = [r["c"] for r in canon.collect()]
    assert len(set(got[:3])) == 1  # all aliases merge
    assert len(set(got)) == 4      # nothing else does


def test_root_slash_and_paramless_survive(spark):
    assert _one(spark, "http://example.com/", canonicalize_url) \
        == "http://example.com/"
    assert _one(spark, "http://example.com/a?utm_source=x",
                canonicalize_url) == "http://example.com/a"


def test_query_params_sorted_and_filtered(spark):
    got = _one(
        spark,
        "http://e.com/?b=2&utm_source=x&a=1&fbclid=z&ref=top",
        url_query_params,
    )
    assert got == ["a=1", "b=2"]
