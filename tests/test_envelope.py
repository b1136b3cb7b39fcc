"""FROZEN ENVELOPE RULES: JVM expressions ≡ Python reference, plus value
oracles on adversarial fixtures (authors, published time, content-type
ladder, attachment descriptors)."""

from __future__ import annotations

from datetime import datetime

import pandas as pd
from pyspark.sql import functions as F

from colymer_acquirers_spark.functions.envelope import (
    extract_attachments_one,
    extract_author_id_series,
    extract_author_series,
    extract_original_data_series,
    extract_published_series,
    extract_version_series,
    page_content_type_one,
)
from colymer_acquirers_spark.functions.envelope_expr import (
    envelope_expr,
    page_content_type_expr,
)
from colymer_acquirers_spark.sources.synth import synth_pages

BASE = "https://h.com/dir/page.html"

FIXTURES = [
    # author double/single quotes; author-id; published
    '<head><meta name="author" content="Ada Lovelace">'
    '<meta name="author-id" content="u1">'
    '<meta property="article:published_time" content="2025-03-01T12:30:00Z">'
    "</head>",
    # single-quoted content; entity + whitespace cleanup
    "<head><meta name='author' content='A &amp;  B '></head>",
    # double-quoted wins over an earlier single-quoted match
    "<head><meta name='author' content='second'>"
    '<meta name="author" content="first"></head>',
    # empty content -> null; malformed time -> null
    '<head><meta name="author" content="">'
    '<meta property="article:published_time" content="March 1, 2025"></head>',
    # non-Z ISO form rejected by the frozen rule
    '<head><meta property="article:published_time" content="2025-03-01T12:30:00+02:00"></head>',
    # attachments: img/video/audio, relative + absolute src, dims, odd quotes
    '<img src="/media/a.jpg" width="640" height="480">'
    "<video src='../v/b.mp4'>"
    '<audio src="https://cdn.x.com/c.mp3" width="9">'
    '<img src="">'
    "<img alt='nosrc'>"
    '<img src="ftp://bad.scheme/d.png">',
    # unknown extension + no extension
    '<img src="/m/raw.xyz123"><img src="/m/noext">',
    # case-insensitive tags/attrs
    '<IMG SRC="/M/UP.JPG" WIDTH=320>',
    "no markers at all",
    "",
    # shape-valid but CALENDAR-invalid published values: month 13, day 32,
    # hour 25 pass the digit-shape rlike — must be NULL in every impl
    # (Python try/except ≡ JVM try_to_timestamp), not a crash or divergence
    '<head><meta property="article:published_time" content="2025-13-01T00:00:00Z"></head>',
    '<head><meta property="article:published_time" content="2025-01-32T00:00:00Z"></head>',
    '<head><meta property="article:published_time" content="2025-01-01T25:00:00Z"></head>',
    # FROZEN RULE 6 (version): valid; non-numeric → NULL; >9 digits → NULL
    '<head a="b"><meta name="version" content="7"></head >body',
    '<head><meta name="version" content="v2"></head>',
    '<head><meta name="version" content="1234567890"></head>',
    # RULE v2 pin: meta tags OUTSIDE the head section are ignored (the
    # envelope must be re-derivable from original_data alone)
    '<head><title>t</title></head>'
    '<body><meta name="author" content="Smuggled">'
    '<meta name="version" content="3"></body>',
    # meta with NO head at all: every meta-derived field NULL
    '<meta name="author" content="Headless">',
]


def test_version_and_original_data_value_oracle():
    """FROZEN RULES 6-7 value pins (not just impl agreement)."""
    s = pd.Series(
        [
            '<head a="b"><meta name="version" content="7"></head >body',
            '<meta name="version" content="v2">',
            '<meta name="version" content="1234567890">',  # >9 digits
            "<head><title>x</title></head>",
            "no head at all",
        ]
    )
    assert list(extract_version_series(s)) == [7, None, None, None, None]
    # verbatim passthrough: attrs on <head>, trailing-ws close tag included
    assert list(extract_original_data_series(s)) == [
        '<head a="b"><meta name="version" content="7"></head >',
        None,
        None,
        "<head><title>x</title></head>",
        None,
    ]


def test_published_calendar_invalid_is_null():
    """ADVICE r2: strptime used to CRASH on 2025-13-01T00:00:00Z (the
    shape regex admits it); both impls must now agree on NULL."""
    bad = pd.Series(
        [
            f'<head><meta property="article:published_time" content="{v}"></head>'
            for v in (
                "2025-13-01T00:00:00Z",
                "2025-01-32T00:00:00Z",
                "2025-01-01T25:00:00Z",
            )
        ]
    )
    assert list(extract_published_series(bad)) == [None, None, None]


def test_meta_rules_scoped_to_head():
    """ENVELOPE RULES v2 value pins: metas outside the head (or with no
    head at all) contribute nothing — the envelope is derivable from
    original_data alone."""
    s = pd.Series(
        [
            '<head><title>t</title></head>'
            '<body><meta name="author" content="Smuggled">'
            '<meta name="version" content="3"></body>',
            '<meta name="author" content="Headless">',
        ]
    )
    assert list(extract_author_series(s)) == [None, None]
    assert list(extract_version_series(s)) == [None, None]


def test_envelope_jvm_matches_python(spark):
    pdf = pd.DataFrame({"html": FIXTURES, "url": [BASE] * len(FIXTURES)})
    got = (
        spark.createDataFrame(pdf)
        .select("html", envelope_expr("html", "url", is_binary=False).alias("e"))
        .collect()
    )
    by_html = {r["html"]: r["e"] for r in got}
    exp_author = extract_author_series(pdf["html"])
    exp_aid = extract_author_id_series(pdf["html"])
    exp_pub = extract_published_series(pdf["html"])
    exp_ver = extract_version_series(pdf["html"])
    exp_head = extract_original_data_series(pdf["html"])
    for i, h in enumerate(FIXTURES):
        e = by_html[h]
        assert e["author_name"] == exp_author[i], (h, e["author_name"])
        assert e["author_id"] == exp_aid[i], h
        assert e["version"] == exp_ver[i], (h, e["version"], exp_ver[i])
        assert e["original_data"] == exp_head[i], h
        exp_t = exp_pub[i]
        got_t = e["published"]
        if exp_t is None:
            assert got_t is None, h
        else:
            assert got_t == exp_t.replace(tzinfo=None), (h, got_t, exp_t)
        exp_atts = extract_attachments_one(h, BASE)
        got_atts = [a.asDict(recursive=True) for a in e["attachments"]]
        assert got_atts == exp_atts, (h, got_atts, exp_atts)


def test_envelope_value_oracle():
    """Adversarial value assertions (not just impl agreement)."""
    h = FIXTURES[0]
    s = pd.Series([h])
    assert extract_author_series(s)[0] == "Ada Lovelace"
    assert extract_author_id_series(s)[0] == "u1"
    assert extract_published_series(s)[0].replace(tzinfo=None) == datetime(
        2025, 3, 1, 12, 30, 0
    )
    assert extract_author_series(pd.Series([FIXTURES[1]]))[0] == "A & B"
    assert extract_author_series(pd.Series([FIXTURES[2]]))[0] == "first"
    assert extract_author_series(pd.Series([FIXTURES[3]]))[0] is None
    assert extract_published_series(pd.Series([FIXTURES[3]]))[0] is None
    assert extract_published_series(pd.Series([FIXTURES[4]]))[0] is None

    atts = extract_attachments_one(FIXTURES[5], BASE)
    assert [a["original_url"] for a in atts] == [
        "https://h.com/media/a.jpg",
        "https://h.com/v/b.mp4",
        "https://cdn.x.com/c.mp3",
    ]
    assert [a["content_type"] for a in atts] == [
        "image/jpeg",
        "video/mp4",
        "audio/mpeg",
    ]
    assert atts[0]["metadata"]["width"] == 640
    assert atts[0]["metadata"]["height"] == 480
    assert atts[1]["metadata"]["width"] is None
    assert atts[0]["filename"] == "a.jpg"
    assert atts[0]["persist_info"]["referer"] == BASE
    assert atts[0]["persist_info"]["path"].endswith(".jpg")

    odd = extract_attachments_one(FIXTURES[6], BASE)
    # frozen rule: unmapped extension → "<tag>/unknown" (raw tag name)
    assert [a["content_type"] for a in odd] == ["img/unknown", "img/unknown"]
    up = extract_attachments_one(FIXTURES[7], BASE)
    assert up[0]["content_type"] == "image/jpeg"  # .JPG lowercased
    assert up[0]["metadata"]["width"] == 320  # unquoted attr

    assert extract_attachments_one(FIXTURES[8], BASE) == []
    assert extract_attachments_one(None, BASE) == []
    assert extract_attachments_one(FIXTURES[5], None) == []


def test_page_content_type_ladder(spark):
    cases = {
        "https://h.com/a/b.html": "text/html",
        "https://h.com/a/b.htm": "text/html",
        "https://h.com/a/b.txt": "text/plain",
        "https://h.com/a/b.json": "application/json",
        "https://h.com/a/b.xml": "application/xml",
        "https://h.com/a/b.zip": "application/octet-stream",
        "https://h.com/a/b": "text/html",
        "https://h.com/a/": "text/html",
        "https://h.com": "text/html",
        "https://h.com/x.TXT?q=1": "text/plain",
        "not a url": None,
        # NULL url: the JVM expr used to fall through its ladder to
        # octet-stream (null scheme nulls the outer when); frozen rule = NULL
        None: None,
    }
    for url, exp in cases.items():
        assert page_content_type_one(url) == exp, url
    pdf = pd.DataFrame({"u": list(cases)})
    got = {
        r["u"]: r["ct"]
        for r in spark.createDataFrame(pdf)
        .select("u", page_content_type_expr("u").alias("ct"))
        .collect()
    }
    assert got == cases


def test_envelope_on_synth_pages(spark):
    """JVM ≡ Python over the full synthetic web (binary html path)."""
    pages = synth_pages(spark, 300)
    rows = pages.select(
        "url", envelope_expr("html", "url").alias("e")
    ).collect()
    pdf = pages.select("url", "html").toPandas()
    hs = pdf["html"].map(bytes)
    exp_author = extract_author_series(hs)
    exp_pub = extract_published_series(hs)
    exp_ver = extract_version_series(hs)
    exp_head = extract_original_data_series(hs)
    exp_by_url = {
        u: (a, p, v, hd, extract_attachments_one(bytes(h), u))
        for u, h, a, p, v, hd in zip(
            pdf["url"], pdf["html"], exp_author, exp_pub, exp_ver, exp_head
        )
    }
    n_auth = n_att = n_ver = 0
    for r in rows:
        a, p, v, hd, atts = exp_by_url[r["url"]]
        e = r["e"]
        assert e["author_name"] == a, r["url"]
        exp_t = None if p is None else p.replace(tzinfo=None)
        assert e["published"] == exp_t, r["url"]
        assert e["version"] == v, r["url"]
        assert e["original_data"] == hd, r["url"]
        assert [x.asDict(recursive=True) for x in e["attachments"]] == atts
        n_auth += a is not None
        n_att += len(atts)
        n_ver += v is not None
    # fixtures genuinely exercise rules
    assert n_auth > 100 and n_att > 100 and n_ver > 100
