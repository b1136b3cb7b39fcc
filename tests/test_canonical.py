import pandas as pd

from colymer_acquirers_spark.functions.canonical import (
    canonicalize_url_series,
    host_of_series,
)


def canon(u):
    return canonicalize_url_series(pd.Series([u]))[0]


def test_lowercase_scheme_host():
    assert canon("HTTPS://Example.COM/Path") == "https://example.com/Path"


def test_default_port_stripped():
    assert canon("http://a.com:80/x") == "http://a.com/x"
    assert canon("https://a.com:443/x") == "https://a.com/x"
    assert canon("https://a.com:8443/x") == "https://a.com:8443/x"


def test_fragment_dropped():
    assert canon("https://a.com/x#frag") == "https://a.com/x"


def test_empty_path():
    assert canon("https://a.com") == "https://a.com/"


def test_query_sorted():
    assert canon("https://a.com/x?b=2&a=1") == "https://a.com/x?a=1&b=2"
    assert canon("https://a.com/x?b=2&&a=1&") == "https://a.com/x?a=1&b=2"
    assert canon("https://a.com/x?") == "https://a.com/x"


def test_userinfo_stripped():
    assert canon("https://user:pw@a.com/x") == "https://a.com/x"


def test_non_http_null():
    assert canon("ftp://a.com/x") is None
    assert canon("mailto:x@y.z") is None
    assert canon("/relative/only") is None
    assert canon("") is None
    assert canonicalize_url_series(pd.Series([None]))[0] is None


def test_host_of():
    assert host_of_series(pd.Series(["https://a.com:8443/x?q=1"]))[0] == "a.com:8443"
    assert host_of_series(pd.Series(["http://b.org/"]))[0] == "b.org"


def test_vectorized_batch():
    s = pd.Series(["https://A.com/x#f", "bad", None, "http://b.com:80?z=1&a=2"])
    out = canonicalize_url_series(s)
    assert list(out) == [
        "https://a.com/x",
        None,
        None,
        "http://b.com/?a=2&z=1",
    ]
