"""Seeded fuzz parity: the pandas and JVM implementations of the frozen
link/text/envelope rules must agree byte-for-byte on randomized adversarial
inputs — not just on hand-picked fixtures. One Spark job per corpus."""

from __future__ import annotations

import random

import pandas as pd

from colymer_acquirers_spark.functions.envelope import extract_attachments_one
from colymer_acquirers_spark.functions.envelope_expr import (
    extract_attachments_expr,
)
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

BASE = "https://fuzz.example/dir/sub/page.html?x=1"

_SCHEMES = ["", "http://", "https://", "HTTPS://", "ftp://", "tel:", "foo:",
            "javascript:", "mailto:", "//", "/", "./", "../", "..//", "#"]
_BODIES = ["", "a", "a/b", "a/../b", "./x", "x?q=1&r=2", "x#frag", "x?#",
           "UPPER/Case", "sp ace", "tab\there", "%20enc", "a:colon/seg",
           "..", ".", "?only", "#only", "very/deep/../../..", "a//b"]
_SNIPPETS = [
    "<script>var a='<a href=\"/inscript\">';</script>",
    "<style>a{content:'</a>'}</style>",
    "<!-- <a href='/incomment'>c</a> -->",
    "<title>T &amp; T</title>",
    "<p>text &lt;tag&gt; &nbsp;more</p>",
    "plain words here",
    "<a>no href</a>",
    "<a href=>empty</a>",
    "<img src='/i.png' width='10'>",
    "<video src=\"/v.mp4\" height=20>",
    "<AUDIO SRC='/a.ogg'>",
    "<img alt='nosrc'>",
    "<meta name=\"author\" content=\"Zed\">",
    "  nbsp runs ",
]


def _gen_corpus(seed: int, n: int) -> list[str]:
    rng = random.Random(seed)
    docs = []
    for _ in range(n):
        parts = []
        for _ in range(rng.randint(1, 8)):
            roll = rng.random()
            if roll < 0.45:
                href = rng.choice(_SCHEMES) + rng.choice(_BODIES)
                quote = rng.choice(['"', "'"])
                parts.append(f"<a href={quote}{href}{quote}>L</a>")
            elif roll < 0.8:
                parts.append(rng.choice(_SNIPPETS))
            else:
                parts.append(rng.choice(_BODIES))
        docs.append("".join(parts))
    return docs


def test_fuzz_parity_pandas_vs_jvm(spark):
    docs = _gen_corpus(seed=20260816, n=400)
    pdf = pd.DataFrame({"html": docs, "url": [BASE] * len(docs), "i": range(len(docs))})
    exp_text = extract_text_series(pdf["html"])
    exp_title = extract_title_series(pdf["html"])
    exp_links = [extract_links_one(h, BASE) for h in docs]
    exp_atts = [extract_attachments_one(h, BASE) for h in docs]

    got = (
        spark.createDataFrame(pdf)
        .select(
            "i",
            extract_text_expr("html", is_binary=False).alias("t"),
            extract_title_expr("html", is_binary=False).alias("ti"),
            extract_links_expr("html", "url", is_binary=False).alias("l"),
            extract_attachments_expr("html", "url", is_binary=False).alias("a"),
        )
        .collect()
    )
    assert len(got) == len(docs)
    for r in got:
        i = r["i"]
        assert r["t"] == exp_text[i], (i, docs[i], r["t"], exp_text[i])
        assert r["ti"] == exp_title[i], (i, docs[i])
        assert list(r["l"]) == exp_links[i], (i, docs[i], list(r["l"]), exp_links[i])
        got_atts = [a.asDict(recursive=True) for a in r["a"]]
        assert got_atts == exp_atts[i], (i, docs[i])


def test_fuzz_parity_canonicalize(spark):
    """canonicalize_url: JVM expression ≡ frozen pandas rule on randomized
    url-shaped strings (including junk that must canonicalize to null)."""
    from colymer_acquirers_spark.functions.canonical import (
        canonicalize_url,
        canonicalize_url_series,
        host_of,
        host_of_series,
    )

    rng = random.Random(99)
    urls = []
    hosts = ["H.Example.COM", "h.example.com:443", "h.example.com:8080",
             "xn--bcher-kva.de", "h", ""]
    for _ in range(400):
        u = (
            rng.choice(["http://", "https://", "HTTP://", "ftp://", "", "//"])
            + rng.choice(hosts)
            + rng.choice(_BODIES)
            + rng.choice(["", "?b=2&a=1", "?a=1&b=2", "#frag", "?z&y", "?"])
        )
        urls.append(u)
    pdf = pd.DataFrame({"u": urls, "i": range(len(urls))})
    exp = canonicalize_url_series(pdf["u"])
    exp_host = host_of_series(exp)
    got = (
        spark.createDataFrame(pdf)
        .select("i", canonicalize_url("u").alias("c"), host_of(canonicalize_url("u")).alias("h"))
        .collect()
    )
    for r in got:
        i = r["i"]
        e = exp[i] if pd.notna(exp[i]) else None
        eh = exp_host[i] if pd.notna(exp_host[i]) else None
        assert r["c"] == e, (i, urls[i], r["c"], e)
        assert r["h"] == eh, (i, urls[i])
