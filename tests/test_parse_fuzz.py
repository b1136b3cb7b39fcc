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


def test_fuzz_parity_envelope_meta(spark):
    """ENVELOPE RULES v2 fuzz: head-scoped meta extraction (author,
    author-id, published, version) and the original_data passthrough must
    agree pandas ≡ JVM on randomized head/meta/quoting/garbage combos —
    including metas outside the head, absent heads, odd case, and
    calendar-invalid timestamps."""
    from colymer_acquirers_spark.functions.envelope import (
        extract_author_id_series,
        extract_author_series,
        extract_original_data_series,
        extract_published_series,
        extract_version_series,
    )
    from colymer_acquirers_spark.functions.envelope_expr import envelope_expr

    rng = random.Random(20260817)
    _META_NAMES = ["author", "author-id", "version", "AUTHOR", "x-other"]
    _VALUES = ["Ada", "A &amp; B", "", " pad ", "7", "v2", "007",
               "1234567890", "2025-03-01T12:30:00Z", "2025-13-01T00:00:00Z",
               "2025-03-01T12:30:00+02:00", "March 1"]

    def meta(rng):
        if rng.random() < 0.3:
            name, attr = "article:published_time", "property"
        else:
            name, attr = rng.choice(_META_NAMES), "name"
        q1, q2 = rng.choice("\"'"), rng.choice("\"'")
        v = rng.choice(_VALUES)
        tag = f"<meta {attr}={q1}{name}{q1} content={q2}{v}{q2}>"
        return tag.upper() if rng.random() < 0.1 else tag

    docs = []
    for _ in range(300):
        metas_in = "".join(meta(rng) for _ in range(rng.randint(0, 4)))
        metas_out = "".join(meta(rng) for _ in range(rng.randint(0, 2)))
        head_attr = rng.choice(["", ' lang="en"', " A=1"])
        close_ws = rng.choice(["", " ", "\t"])
        shape = rng.random()
        if shape < 0.15:
            doc = metas_in + "<body>x</body>"  # no head at all
        elif shape < 0.25:
            doc = f"<head{head_attr}>{metas_in}<body>x"  # unclosed head
        else:
            doc = (
                f"<html><head{head_attr}><title>t</title>{metas_in}"
                f"</head{close_ws}><body>{metas_out}y</body></html>"
            )
        docs.append(doc)

    pdf = pd.DataFrame({"html": docs, "u": [BASE] * len(docs), "i": range(len(docs))})
    exp = {
        "author_id": extract_author_id_series(pdf["html"]),
        "author_name": extract_author_series(pdf["html"]),
        "published": extract_published_series(pdf["html"]),
        "version": extract_version_series(pdf["html"]),
        "original_data": extract_original_data_series(pdf["html"]),
    }
    got = (
        spark.createDataFrame(pdf)
        .select("i", envelope_expr("html", "u", is_binary=False).alias("e"))
        .collect()
    )
    n_nontrivial = 0
    for r in got:
        i, e = r["i"], r["e"]
        for f in ("author_id", "author_name", "version", "original_data"):
            assert e[f] == exp[f][i], (f, i, docs[i], e[f], exp[f][i])
        ep = exp["published"][i]
        ep = None if ep is None else ep.replace(tzinfo=None)
        assert e["published"] == ep, (i, docs[i])
        n_nontrivial += e["original_data"] is not None
    assert n_nontrivial > 150  # the corpus genuinely exercises the rules


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


def test_fuzz_text_rule_truth():
    """extract_text_series must equal the LITERAL frozen three-pass rule
    (strip -> entity decode -> ws collapse -> trim) spelled out here
    independently — parity between the pandas and JVM implementations
    alone cannot catch an optimization bug they share (guard for any
    future fast-path rewrite of the text chain)."""
    import re

    from colymer_acquirers_spark.functions.parse import (
        _STRIP_ALL_RE,
        _WS_RE,
        extract_text_series,
    )

    def three_pass(doc: str) -> str:
        t = re.sub(_STRIP_ALL_RE, " ", doc)
        for ent, rep in [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                         ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")]:
            t = t.replace(ent, rep)
        return re.sub(_WS_RE, " ", t).strip(" ")

    docs = _gen_corpus(seed=20260817, n=400)
    # force plenty of no-'&' docs (the fused path) alongside entity docs
    docs += [d.replace("&", "+") for d in docs]
    got = extract_text_series(pd.Series(docs)).tolist()
    want = [three_pass(d) for d in docs]
    assert got == want
