import pandas as pd

from colymer_acquirers_spark.functions.parse import (
    extract_links_one,
    extract_text_series,
)


def text(h):
    return extract_text_series(pd.Series([h]))[0]


def test_text_basic():
    assert (
        text("<html><head><title>T</title></head><body><p>a b</p></body></html>")
        == "T a b"
    )


def test_text_script_style_comment_dropped():
    h = "<p>keep</p><script>var x = 1 < 2;</script><style>p{}</style><!-- no -->"
    assert text(h) == "keep"


def test_text_entities():
    assert text("<p>a &amp; b &lt;c&gt; &quot;d&quot; &#39;e&#39;&nbsp;f</p>") == (
        "a & b <c> \"d\" 'e' f"
    )


def test_text_whitespace_collapse():
    assert text("  <p> a \n\t b </p>  ") == "a b"


def test_text_bytes_input():
    assert text("<p>héllo</p>".encode()) == "héllo"


def test_text_none():
    assert extract_text_series(pd.Series([None]))[0] is None


def test_text_rule_v2_overlapping_constructs():
    """FROZEN TEXT RULE v2 value pins (ADVICE r2): single-pass ordered
    alternation — NOT v1's sequential passes. A script opener inside a
    comment is commented out; leftmost match wins. These exact values are
    the spec for all three implementations."""
    assert text("<!-- <script> --> x </script> tail") == "x tail"
    assert text("<script><!-- </script> --> y") == "--> y"
    assert text("<style><script></style>z</script>") == "z"


BASE = "https://h.com/dir/page.html"


def test_links_absolute():
    h = '<a href="https://x.com/a">z</a>'
    assert extract_links_one(h, BASE) == ["https://x.com/a"]


def test_links_root_relative():
    assert extract_links_one('<a href="/p/1">x</a>', BASE) == ["https://h.com/p/1"]


def test_links_scheme_relative():
    assert extract_links_one('<a href="//y.com/a">x</a>', BASE) == ["https://y.com/a"]


def test_links_relative_dotdot():
    assert extract_links_one('<a href="../up/x?q=1">x</a>', BASE) == [
        "https://h.com/up/x?q=1"
    ]
    assert extract_links_one('<a href="sib.html">x</a>', BASE) == [
        "https://h.com/dir/sib.html"
    ]


def test_links_skipped_schemes():
    h = '<a href="javascript:void(0)">a</a><a href="mailto:a@b">b</a><a href="#top">c</a><a href="">d</a>'
    assert extract_links_one(h, BASE) == []


def test_links_order_and_dupes_preserved():
    h = '<a href="/a">1</a><a href="/b">2</a><a href="/a">3</a>'
    assert extract_links_one(h, BASE) == [
        "https://h.com/a",
        "https://h.com/b",
        "https://h.com/a",
    ]


def test_links_single_quotes_and_attrs():
    h = "<a class='k' href='/q'>1</a>"
    assert extract_links_one(h, BASE) == ["https://h.com/q"]


def test_links_nonhttp_schemes_dropped():
    # adversarial oracle (not just impl-agreement): every explicit non-http(s)
    # scheme is dropped, including ones the old prefix list missed
    h = (
        '<a href="ftp://files.example/x">a</a>'
        '<a href="tel:+1-555-0100">b</a>'
        '<a href="file:///etc/passwd">c</a>'
        '<a href="ssh://host/repo">d</a>'
        '<a href="news:comp.lang">e</a>'
        '<a href="HTTPS://ok.example/y">keep1</a>'
        '<a href="relative/path">keep2</a>'
    )
    assert extract_links_one(h, BASE) == [
        "HTTPS://ok.example/y",
        "https://h.com/dir/relative/path",
    ]


def test_links_colon_segment_is_scheme():
    # RFC 3986 §4.2: a relative first segment containing ':' must be written
    # './seg'; bare 'seg:rest' parses as a scheme and is dropped
    assert extract_links_one('<a href="foo:bar.html">x</a>', BASE) == []
    assert extract_links_one('<a href="./foo:bar.html">x</a>', BASE) == [
        "https://h.com/dir/foo:bar.html"
    ]
