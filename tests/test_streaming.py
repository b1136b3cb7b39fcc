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

    # horizon wider than the fixture's 30-day warc_ts spread: this test
    # pins CHECKPOINTED exactly-once across runs; horizon/TTL semantics
    # are pinned separately in test_stream_dedup_state_ttl_horizon
    horizon = "90 days"
    batch1.write.mode("append").parquet(dirs["pages"])
    stream_dedup_articles(spark, dirs["pages"], dirs["ckpt"], dirs["out"],
                          dedup_horizon=horizon)
    n1 = spark.read.parquet(dirs["out"]).count()
    assert n1 == batch1.count()

    batch2.write.mode("append").parquet(dirs["pages"])
    stream_dedup_articles(spark, dirs["pages"], dirs["ckpt"], dirs["out"],
                          dedup_horizon=horizon)
    out = spark.read.parquet(dirs["out"])
    # dedup state persisted across runs: batch1 urls NOT re-emitted
    assert out.count() == pages.count()
    assert out.select("canonical_url").distinct().count() == pages.count()
    pages.unpersist()


def test_stream_dedup_state_ttl_horizon(spark, dirs):
    """VERDICT r2 #4: dedup state must be WATERMARK-BOUNDED. Three
    availableNow triggers: (B) a same-event-time duplicate inside the
    horizon is suppressed while a far-future row drags the watermark past
    the first key's TTL; (C) after eviction a re-fetch of the same url at
    a new event time IS re-emitted (the documented horizon semantics), and
    a below-watermark late duplicate is dropped, not re-emitted."""
    from datetime import datetime

    from colymer_acquirers_spark import schemas

    def mk(url, ts):
        return spark.createDataFrame(
            [(url, ts, bytearray(b"<html><body>x</body></html>"), "x", "en")],
            schema=schemas.PAGES,
        )

    t0 = datetime(2025, 1, 1, 12, 0, 0)
    t1 = datetime(2025, 3, 1, 12, 0, 0)  # 59 days later ≫ 24h horizon
    run = lambda: stream_dedup_articles(  # noqa: E731
        spark, dirs["pages"], dirs["ckpt"], dirs["out"], dedup_horizon="24 hours"
    )

    mk("https://hx.test/a", t0).write.mode("append").parquet(dirs["pages"])
    run()  # A: first sighting emitted; watermark → t0 - 24h
    mk("https://hx.test/a", t0).unionByName(
        mk("https://hy.test/b", t1)
    ).write.mode("append").parquet(dirs["pages"])
    run()  # B: dup@t0 suppressed (state live); watermark → t1 - 24h (evicts a)
    mk("https://hx.test/a", t1).unionByName(  # re-fetch after eviction
        mk("https://hx.test/a", t0)  # below-watermark late dup
    ).write.mode("append").parquet(dirs["pages"])
    run()  # C

    out = spark.read.parquet(dirs["out"]).select("canonical_url", "warc_ts")
    got = sorted((r["canonical_url"], r["warc_ts"]) for r in out.collect())
    assert got == [
        ("https://hx.test/a", t0),  # run A
        ("https://hx.test/a", t1),  # run C re-emit after state eviction
        ("https://hy.test/b", t1),  # run B
    ], got


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


def test_stream_host_sessions_survives_late_rows_across_triggers(spark, dirs):
    """ADVICE r2: applyInPandasWithState does not pre-drop below-watermark
    rows, so a late row used to compute a timeout BEHIND the watermark and
    setTimeoutTimestamp threw. Three triggers with a genuinely late row:
    must not crash, the late row must not leak into the closed session."""
    from datetime import datetime, timedelta

    from colymer_acquirers_spark import schemas
    from colymer_acquirers_spark.streaming.stream_crawl import (
        stream_host_sessions,
    )

    def mk(rows):
        return spark.createDataFrame(
            [
                (u, ts, bytearray(b"<html><body>x</body></html>"), "x", "en")
                for u, ts in rows
            ],
            schema=schemas.PAGES,
        )

    t0 = datetime(2025, 1, 1, 12, 0, 0)
    t1 = t0 + timedelta(days=10)  # drags the watermark far past t0
    run = lambda: stream_host_sessions(  # noqa: E731
        spark, dirs["pages"], dirs["ckpt"], dirs["out"], gap_minutes=30
    )

    mk([
        ("https://h1.test/a", t0),
        ("https://h1.test/b", t0 + timedelta(minutes=5)),
        ("https://h2.test/a", t1),
    ]).write.mode("append").parquet(dirs["pages"])
    run()  # A: h1 session open; end-of-run watermark = t1 - 30min ≫ t0
    mk([
        ("https://h1.test/late", t0 + timedelta(minutes=1)),  # below watermark
    ]).write.mode("append").parquet(dirs["pages"])
    run()  # B: the crash repro — late row's end+gap is behind the watermark
    mk([
        ("https://h2.test/b", t1 + timedelta(days=1)),
    ]).write.mode("append").parquet(dirs["pages"])
    run()  # C: watermark passes h1's re-armed timeout → session flushes

    got = {
        (r["host"], r["session_start"], r["session_end"], r["n_pages"])
        for r in spark.read.parquet(dirs["out"]).collect()
    }
    # the h1 session closed with its two on-time rows; the late row was
    # dropped (not appended, not a new session)
    assert ("h1.test", t0, t0 + timedelta(minutes=5), 2) in got, got
    assert not any(h == "h1.test" and n != 2 for h, _, _, n in got), got


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
