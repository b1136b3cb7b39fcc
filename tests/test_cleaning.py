"""Unit truth for operators/cleaning.py (line dedup + PII redaction) on
hand-built fixtures; the corpus-scale oracle pairs live in
test_oracle_pairs via the catalog entries."""

from __future__ import annotations

from colymer_acquirers_spark.operators.cleaning import line_dedup, pii_redact


def test_line_dedup_removes_cross_doc_boilerplate(spark):
    docs = [
        (1, "cookie banner\nunique one\nfooter text"),
        (2, "cookie banner\nunique two\nfooter text"),
        (3, "cookie banner\nunique three"),
        (4, "all alone here"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in line_dedup(df, "doc_id", "text", min_df=2).collect()
    }
    assert out[1]["text_clean"] == "unique one"
    assert out[1]["n_lines"] == 3 and out[1]["n_lines_removed"] == 2
    assert out[2]["text_clean"] == "unique two"
    assert out[3]["text_clean"] == "unique three"
    assert out[3]["n_lines_removed"] == 1
    assert out[4]["text_clean"] == "all alone here"
    assert out[4]["n_lines_removed"] == 0
    # footer appears in only 2 docs -> removed at min_df=2, kept at 3
    out3 = {
        r["doc_id"]: r
        for r in line_dedup(df, "doc_id", "text", min_df=3).collect()
    }
    assert out3[1]["text_clean"] == "unique one\nfooter text"


def test_line_dedup_fully_boilerplate_doc_empties(spark):
    docs = [(1, "same"), (2, "same"), (3, "same")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = line_dedup(df, "doc_id", "text", min_df=2).collect()
    assert all(r["text_clean"] == "" for r in out)
    assert all(r["n_lines_removed"] == 1 for r in out)


def test_pii_redact_classes_and_order(spark):
    docs = [
        (1, "mail bob.smith+x@sub.example.co.uk now"),
        (2, "call +44 20 7946 0958 today"),
        (3, "server at 192.168.0.1 down"),
        (4, "clean text with no pii 1234"),
        (5, "multi a@b.io c@d.org and 10.0.0.1"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in pii_redact(df, "doc_id", "text").collect()}
    assert out[1]["text_redacted"] == "mail <EMAIL> now"
    assert (out[1]["n_email"], out[1]["n_phone"], out[1]["n_ipv4"]) == (1, 0, 0)
    assert out[2]["text_redacted"] == "call <PHONE> today"
    assert out[2]["n_phone"] == 1
    assert out[3]["text_redacted"] == "server at <IP> down"
    assert out[3]["n_ipv4"] == 1
    assert out[4]["text_redacted"] == docs[3][1]
    assert (out[4]["n_email"], out[4]["n_phone"], out[4]["n_ipv4"]) == (0, 0, 0)
    assert out[5]["n_email"] == 2 and out[5]["n_ipv4"] == 1
    assert out[5]["text_redacted"] == "multi <EMAIL> <EMAIL> and <IP>"


def test_pii_redact_no_double_count(spark):
    # dotted digits inside an email's local part must not ALSO count as
    # an IP: counts run on the progressively redacted text
    df = spark.createDataFrame(
        [(1, "ping 10.1.2.3@mail.example.com ok")], ["doc_id", "text"]
    )
    r = pii_redact(df, "doc_id", "text").collect()[0]
    assert r["n_email"] == 1
    assert r["n_ipv4"] == 0
    assert r["text_redacted"] == "ping <EMAIL> ok"
    # a numeric-host address is NOT an email (letters-only TLD) and DOES
    # count as an IP
    df2 = spark.createDataFrame(
        [(1, "ping admin@10.0.0.1 ok")], ["doc_id", "text"]
    )
    r2 = pii_redact(df2, "doc_id", "text").collect()[0]
    assert r2["n_email"] == 0 and r2["n_ipv4"] == 1
    assert r2["text_redacted"] == "ping admin@<IP> ok"
