"""The JVM-expression canonicalizer must equal the frozen pandas-series
implementation byte-for-byte (the pandas one is what pyref uses — SURVEY.md
§7.4 hard part 4)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from colymer_acquirers_spark.functions.canonical import (
    canonicalize_url,
    canonicalize_url_series,
    host_of,
    host_of_series,
)
from colymer_acquirers_spark.functions.parse import extract_links_one
from colymer_acquirers_spark.sources.synth import synth_pages

ADVERSARIAL = [
    "https://Example.COM/Path",
    "HTTP://A.com:80/x",
    "https://a.com:443/x",
    "https://a.com:8443/x?b=2&a=1",
    "https://a.com/x#frag",
    "https://a.com",
    "https://a.com/x?",
    "https://a.com/x?&&",
    "https://user:pw@a.com/x",
    "http://b.com:80?z=1&a=2",
    "ftp://a.com/x",
    "mailto:x@y.z",
    "/relative/only",
    "",
    "https://a.com/UPPER/case?Q=1&q=2",
    "https://a.com//double//slash",
    "https://a.com/x?a=1&a=1&b",
    "http://h.com:8080",
    "https://a.com/percent%20enc?x=%41",
    "not a url at all",
    "https://",
    "https:///pathonly",
    "https://a.com:00443/x",
]


def _compare(spark, urls: list[str]):
    pdf = pd.DataFrame({"url": urls})
    expected_c = canonicalize_url_series(pdf["url"])
    df = spark.createDataFrame(pdf).select(
        "url", canonicalize_url("url").alias("c")
    )
    got = {r["url"]: r["c"] for r in df.collect()}
    for u, exp in zip(urls, expected_c):
        assert got[u] == (exp if exp is not None else None), (u, got[u], exp)
    # host_of over the canonical non-nulls
    canon = [c for c in expected_c if c is not None]
    if canon:
        exp_h = host_of_series(pd.Series(canon))
        hdf = spark.createDataFrame(pd.DataFrame({"c": canon})).select(
            "c", host_of("c").alias("h")
        )
        got_h = {r["c"]: r["h"] for r in hdf.collect()}
        for c, eh in zip(canon, exp_h):
            assert got_h[c] == eh, (c, got_h[c], eh)


def test_adversarial_urls(spark):
    _compare(spark, ADVERSARIAL)


def test_synth_pages_and_links(spark):
    pages = synth_pages(spark, 150).select("url", "html").toPandas()
    urls = list(pages["url"])
    links: list[str] = []
    for h, u in zip(pages["html"], pages["url"]):
        links.extend(extract_links_one(bytes(h), u))
    _compare(spark, urls + links[:500])
