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
    spark: SparkSession,
    pages_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    dedup_horizon: str = "24 hours",
) -> None:
    """Continuously ingest pages, dedup by canonical URL across batches, and
    append parsed articles exactly once. Blocks until the available data is
    drained (availableNow trigger).

    BOUNDED STATE: ``dropDuplicatesWithinWatermark`` + a ``dedup_horizon``
    watermark on ``warc_ts`` — a URL's dedup key is evictable once the
    watermark passes its event time by the horizon, so state is
    O(urls-per-horizon), not O(all urls ever) (a plain ``dropDuplicates``
    here grows without bound on a continuous run). The CROSS-BATCH DEDUP
    HORIZON is therefore ``dedup_horizon`` of EVENT time: a re-fetch of the
    same canonical_url with a warc_ts more than the horizon after the first
    is re-emitted — by design; the batch engine's compacted seen-set
    (``plans/crawl.py``) is the full-history dedup, this sink is the
    streaming analog of the reference's interval-compressed recent-seen
    state (colymer/acquirers/acquirer.py:46-58)."""
    stream = (
        spark.readStream.schema(schemas.PAGES)
        .parquet(pages_dir)
        .withColumn("canonical_url", canonicalize_url("url"))
        .filter(F.col("canonical_url").isNotNull())
        .withWatermark("warc_ts", dedup_horizon)
        .dropDuplicatesWithinWatermark(["canonical_url"])
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


def stream_host_sessions(
    spark: SparkSession,
    pages_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    gap_minutes: int = 30,
) -> None:
    """Custom stateful operator (Z6): per-host crawl SESSIONS via
    ``applyInPandasWithState`` — consecutive page fetches on a host with
    event-time gaps below ``gap_minutes`` fold into one session row
    (start/end/n_pages), emitted when the watermark passes the gap (state
    timeout on event time).

    Generalizes the reference's per-site serialized request pacing
    (``colymer/sites/site.py:30-41``): the state the reference keeps
    implicitly in its single thread (last-request time per site) becomes
    explicit keyed state the cluster maintains per host across batches.
    Arrow-batched (one pandas frame per host per trigger) — no per-row
    Python.
    """
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from colymer_acquirers_spark.functions.canonical import host_of

    out_schema = T.StructType(
        [
            T.StructField("host", T.StringType(), False),
            T.StructField("session_start", T.TimestampType(), False),
            T.StructField("session_end", T.TimestampType(), False),
            T.StructField("n_pages", T.LongType(), False),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("start_ms", T.LongType(), False),
            T.StructField("end_ms", T.LongType(), False),
            T.StructField("n", T.LongType(), False),
        ]
    )
    gap_ms = gap_minutes * 60_000

    def update(key, pdfs, state: GroupState):
        (host,) = key
        if state.hasTimedOut:
            start_ms, end_ms, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "host": [host],
                    "session_start": [pd.Timestamp(start_ms, unit="ms")],
                    "session_end": [pd.Timestamp(end_ms, unit="ms")],
                    "n_pages": [n],
                }
            )
            return
        ts = pd.concat([pdf["warc_ts"] for pdf in pdfs]).sort_values()
        # applyInPandasWithState does NOT pre-drop rows older than the
        # watermark (unlike built-in stateful ops) — a late row could push
        # the computed timeout (end+gap) BEHIND the current watermark, and
        # setTimeoutTimestamp throws for timestamps ≤ watermark. Drop
        # below-watermark rows explicitly (they are late by contract) and
        # clamp the timeout to watermark+1 as the backstop.
        wm_ms = state.getCurrentWatermarkMs()
        ms = [t for t in (ts.astype("int64") // 1_000_000).tolist() if t >= wm_ms]
        if not ms:
            if state.exists:
                start_ms, end_ms, n = state.get
                state.setTimeoutTimestamp(max(wm_ms + 1, end_ms + gap_ms))
            return
        sessions = []
        if state.exists:
            start_ms, end_ms, n = state.get
        else:
            start_ms, end_ms, n = ms[0], ms[0], 0
        for t in ms:
            if t - end_ms > gap_ms:
                sessions.append((start_ms, end_ms, n))
                start_ms, end_ms, n = t, t, 1
            else:
                end_ms = max(end_ms, t)
                n += 1
        state.update((start_ms, end_ms, n))
        # event-time timeout: close the open session once the watermark
        # passes its end + gap (clamped above the current watermark)
        state.setTimeoutTimestamp(max(wm_ms + 1, end_ms + gap_ms))
        if sessions:
            yield pd.DataFrame(
                {
                    "host": [host] * len(sessions),
                    "session_start": [pd.Timestamp(s, unit="ms") for s, _, _ in sessions],
                    "session_end": [pd.Timestamp(e, unit="ms") for _, e, _ in sessions],
                    "n_pages": [n for _, _, n in sessions],
                }
            )

    stream = (
        spark.readStream.schema(schemas.PAGES)
        .parquet(pages_dir)
        .withColumn("host", host_of(canonicalize_url("url")))
        .filter(F.col("host").isNotNull())
        .withWatermark("warc_ts", f"{gap_minutes} minutes")
        .groupBy("host")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
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
