"""Structured Streaming semantics (SURVEY.md §2.10): cross-batch stateful
dedup (Z5), exactly-once via checkpointed state (Z3), windowed event-time
aggregation with watermark (Z2)."""

from __future__ import annotations

import os

import pandas as pd

import pytest
from pyspark.sql import functions as F

from colymer_acquirers_spark.sources.synth import synth_pages
from colymer_acquirers_spark.streaming.stream_crawl import (
    stream_dedup_articles,
    stream_hourly_lang_counts,
)


@pytest.fixture()
def dirs(tmp_path):
    d = {
        "pages": str(tmp_path / "pages"),
        "ckpt": str(tmp_path / "ckpt"),
        "out": str(tmp_path / "out"),
    }
    os.makedirs(d["pages"])
    return d


def test_stream_dedup_exactly_once_across_runs(spark, dirs):
    pages = synth_pages(spark, 120).persist()
    batch1 = pages.filter(F.xxhash64("url") % 2 == 0)
    batch2 = pages  # contains every batch1 row again + the rest

    batch1.write.mode("append").parquet(dirs["pages"])
    stream_dedup_articles(spark, dirs["pages"], dirs["ckpt"], dirs["out"])
    n1 = spark.read.parquet(dirs["out"]).count()
    assert n1 == batch1.count()

    batch2.write.mode("append").parquet(dirs["pages"])
    stream_dedup_articles(spark, dirs["pages"], dirs["ckpt"], dirs["out"])
    out = spark.read.parquet(dirs["out"])
    # dedup state persisted across runs: batch1 urls NOT re-emitted
    assert out.count() == pages.count()
    assert out.select("canonical_url").distinct().count() == pages.count()
    pages.unpersist()


def test_stream_windowed_lang_counts(spark, dirs):
    pages = synth_pages(spark, 200)
    pages.write.mode("append").parquet(dirs["pages"])
    stream_hourly_lang_counts(spark, dirs["pages"], dirs["ckpt"], dirs["out"])
    got = spark.read.parquet(dirs["out"])
    # watermark semantics: only windows strictly below the final watermark
    # are emitted in availableNow mode; everything emitted must match batch
    batch = (
        pages.groupBy(F.window("warc_ts", "1 hour").alias("w"), "lang")
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select(
            F.col("w.start").alias("window_start"),
            "lang",
            F.col("n_pages").alias("expected"),
        )
    )
    joined = got.join(batch, ["window_start", "lang"], "left")
    assert joined.filter(F.col("n_pages") != F.col("expected")).count() == 0
    assert got.count() > 0


def test_stream_host_sessions_matches_batch_sessionization(spark, dirs):
    """Z6 custom stateful op: applyInPandasWithState session windows must
    equal an independent batch sessionization of the same events (for
    sessions the final watermark has closed)."""
    from colymer_acquirers_spark.functions.canonical import (
        canonicalize_url_series,
        host_of_series,
    )
    from colymer_acquirers_spark.streaming.stream_crawl import (
        stream_host_sessions,
    )

    pages = synth_pages(spark, 250)
    pages.write.mode("append").parquet(dirs["pages"])
    stream_host_sessions(spark, dirs["pages"], dirs["ckpt"], dirs["out"],
                         gap_minutes=30)
    got = {
        (r["host"], r["session_start"], r["session_end"], r["n_pages"])
        for r in spark.read.parquet(dirs["out"]).collect()
    }

    # batch truth in plain pandas
    pdf = pages.select("url", "warc_ts").toPandas()
    pdf["host"] = host_of_series(canonicalize_url_series(pdf["url"]))
    gap = 30 * 60
    expected = set()
    max_ts = pdf["warc_ts"].max()
    for host, grp in pdf.groupby("host"):
        ts = sorted(grp["warc_ts"])
        start = end = ts[0]
        n = 0
        for t in ts:
            if (t - end).total_seconds() > gap:
                expected.add((host, start, end, n))
                start = end = t
                n = 1
            else:
                end = max(end, t)
                n += 1
        # the trailing session is genuine too — streaming emits it iff the
        # final watermark passed its event-time timeout
        expected.add((host, start, end, n))
    # streaming may not have emitted sessions whose timeout lies beyond the
    # final watermark; everything it DID emit must be in the batch truth,
    # and all batch sessions closed well before the watermark must appear
    assert got <= expected, ("streaming emitted a non-batch session",
                             list(got - expected)[:3])
    watermark = max_ts - pd.Timedelta(minutes=30)
    must_have = {
        s for s in expected
        if pd.Timestamp(s[2]) + pd.Timedelta(minutes=30) < watermark - pd.Timedelta(minutes=30)
    }
    assert must_have <= got, ("missing sessions", list(must_have - got)[:3])
    assert len(got) > 0
