"""JVM-expression parse must equal the frozen pandas implementations
byte-for-byte (text AND link lists) over the synthetic web + adversarial
HTML."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from colymer_acquirers_spark.functions.parse import (
    extract_links_one,
    extract_text_series,
    extract_title_series,
)
from colymer_acquirers_spark.functions.parse_expr import (
    extract_links_expr,
    extract_text_expr,
    extract_title_expr,
)
from colymer_acquirers_spark.sources.synth import synth_pages

BASE = "https://h.com/dir/page.html"
ADVERSARIAL_HTML = [
    "<html><head><title>T</title></head><body><p>a b</p></body></html>",
    "<p>keep</p><script>var x = 1 < 2;</script><style>p{}</style><!-- no -->",
    "<p>a &amp; b &lt;c&gt; &quot;d&quot; &#39;e&#39;&nbsp;f</p>",
    "  <p> a \n\t b </p>  ",
    '<a href="https://x.com/a">z</a>',
    '<a href="/p/1">x</a><a href="//y.com/a">b</a>',
    '<a href="../up/x?q=1">x</a><a href="sib.html">y</a>',
    '<a href="javascript:void(0)">a</a><a href="mailto:a@b">b</a><a href="#top">c</a><a href="">d</a>',
    '<a href="/a">1</a><a href="/b">2</a><a href="/a">3</a>',
    "<a class='k' href='/q'>1</a>",
    '<a href="ftp://other.scheme/x">odd</a>',
    '<a href="../../../../deep">esc</a>',
    '<a href="?q=only">qonly</a>',
    '<a href="./same/./dir/../x">dots</a>',
    '<A HREF="/UPPER">u</A>',
    "<a href='a#frag?not-q'>fragq</a>",
    "no links here at all",
    "",
    # TEXT RULE v2 overlap cases (value pins live in test_parse.py; here
    # they pin pandas ≡ JVM on exactly the inputs where v1 and v2 diverge)
    "<!-- <script> --> x </script> tail",
    "<script><!-- </script> --> y",
    "<style><script></style>z</script>",
]


def test_adversarial(spark):
    pdf = pd.DataFrame(
        {"html": ADVERSARIAL_HTML, "url": [BASE] * len(ADVERSARIAL_HTML)}
    )
    exp_text = extract_text_series(pdf["html"])
    exp_title = extract_title_series(pdf["html"])
    exp_links = [extract_links_one(h, BASE) for h in ADVERSARIAL_HTML]
    df = spark.createDataFrame(pdf).select(
        "html",
        extract_text_expr("html", is_binary=False).alias("t"),
        extract_title_expr("html", is_binary=False).alias("ti"),
        extract_links_expr("html", "url", is_binary=False).alias("l"),
    )
    got = {r["html"]: (r["t"], r["ti"], r["l"]) for r in df.collect()}
    for h, et, eti, el in zip(ADVERSARIAL_HTML, exp_text, exp_title, exp_links):
        gt, gti, gl = got[h]
        assert gt == et, (h, gt, et)
        assert gti == eti, (h, gti, eti)
        assert list(gl) == el, (h, list(gl), el)


def test_synth_pages_byte_identical(spark):
    pages = synth_pages(spark, 400)
    df = pages.select(
        "url",
        "text",
        extract_text_expr("html").alias("t"),
        extract_links_expr("html", "url").alias("l"),
    )
    rows = df.collect()
    pdf = pages.select("url", "html").toPandas()
    exp_links = {
        u: extract_links_one(bytes(h), u) for u, h in zip(pdf["url"], pdf["html"])
    }
    assert len(rows) == 400
    for r in rows:
        assert r["t"] == r["text"], r["url"]  # ground truth column
        assert list(r["l"]) == exp_links[r["url"]], r["url"]


def test_nonhttp_scheme_fixtures_dropped_both_impls(spark):
    """Adversarial scheme fixtures must be DROPPED (value oracle), not just
    agreed on by the two implementations."""
    html = (
        '<a href="ftp://files.example/x">a</a>'
        '<a href="tel:+1-555-0100">b</a>'
        '<a href="file:///etc/passwd">c</a>'
        '<a href="/ok">keep</a>'
    )
    expected = ["https://h.com/ok"]
    assert extract_links_one(html, BASE) == expected
    df = spark.createDataFrame(
        pd.DataFrame({"html": [html], "url": [BASE]})
    ).select(extract_links_expr("html", "url", is_binary=False).alias("l"))
    assert list(df.first()["l"]) == expected
