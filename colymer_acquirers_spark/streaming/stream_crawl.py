"""Structured Streaming variants of the engine's incremental semantics
(SURVEY.md §2.10 Z1-Z6).

The reference is a pull-based incremental batch loop; the batch round loop in
``plans/crawl.py`` is the primary engine (deterministic ordering +
replayable checkpoints). These streaming jobs cover the streaming-shaped
concerns for continuously-arriving pages:

- Z1 micro-batch trigger: file-source ``readStream`` + ``availableNow``
- Z3/Z5 exactly-once + cross-batch stateful dedup: ``dropDuplicates`` state
  persisted in the streaming checkpoint — re-running with the same
  checkpoint never re-emits (the analog of the id-keyed idempotent sink,
  colymer/sites/colymer.py:25-31)
- Z2 watermark/late data: event-time windowed counts over ``warc_ts``
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from colymer_acquirers_spark import schemas
from colymer_acquirers_spark.functions.canonical import canonicalize_url
from colymer_acquirers_spark.functions.parse_expr import extract_text_expr


def stream_dedup_articles(
    spark: SparkSession, pages_dir: str, checkpoint_dir: str, out_dir: str
) -> None:
    """Continuously ingest pages, dedup by canonical URL across batches, and
    append parsed articles exactly once. Blocks until the available data is
    drained (availableNow trigger)."""
    stream = (
        spark.readStream.schema(schemas.PAGES)
        .parquet(pages_dir)
        .withColumn("canonical_url", canonicalize_url("url"))
        .filter(F.col("canonical_url").isNotNull())
        .dropDuplicates(["canonical_url"])
        .select(
            "canonical_url",
            extract_text_expr("html").alias("content"),
            "lang",
            "warc_ts",
        )
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_hourly_lang_counts(
    spark: SparkSession, pages_dir: str, checkpoint_dir: str, out_dir: str
) -> None:
    """Event-time windowed counts with a watermark (Z2): pages per
    (1-hour warc_ts window, lang), appended as windows close."""
    stream = (
        spark.readStream.schema(schemas.PAGES)
        .parquet(pages_dir)
        .withWatermark("warc_ts", "2 hours")
        .groupBy(F.window("warc_ts", "1 hour").alias("w"), "lang")
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_pages",
        )
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
