"""Structured Streaming semantics (SURVEY.md §2.10): cross-batch stateful
dedup (Z5), exactly-once via checkpointed state (Z3), windowed event-time
aggregation with watermark (Z2)."""

from __future__ import annotations

import os

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
