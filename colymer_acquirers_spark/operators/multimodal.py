"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Reference analog: the attachment descriptor built in 7 places
(``colymer/acquirers/weibo.py:33-47,62-81,96-111,114-130,133-149``,
``instagram.py:15-42``, ``twitter.py:16-60``) — media is never decoded by
the reference either; it carries bytes + metadata (width/height/duration/
bitrate). Here the Spark-side plumbing is real — schema, partitioning,
Arrow-batched ``mapInPandas`` signatures, batch shapes — while the actual
codec work is STUBBED: this container has no image/audio libraries, so
``decode=`real``` raises ``NotImplementedError`` and the default is a
clearly-marked DETERMINISTIC FAKE (byte-stat features) that exercises the
identical dataflow.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("format", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_byte", T.DoubleType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)

FRAMES = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_payload", T.BinaryType(), False),
    ]
)


def synth_media(spark: SparkSession, n: int) -> DataFrame:
    """Deterministic fake media table: payload bytes derived from md5 of the
    id (pure column exprs — distributed, reproducible)."""
    idc = F.col("id")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        F.pmod(F.xxhash64(idc, F.lit(1)), F.lit(3)).cast("int") + 1,
    )
    payload = F.encode(
        F.concat(*[F.md5(F.concat(idc.cast("string"), F.lit(f"#{i}")).cast("binary")) for i in range(8)]),
        "utf-8",
    )
    meta = F.struct(
        (F.pmod(F.xxhash64(idc, F.lit(2)), F.lit(1920)) + 16).cast("int").alias("width"),
        (F.pmod(F.xxhash64(idc, F.lit(3)), F.lit(1080)) + 16).cast("int").alias("height"),
        (F.pmod(F.xxhash64(idc, F.lit(4)), F.lit(600000))).cast("long").alias("duration_ms"),
        F.lit(44100).alias("sample_rate"),
        F.element_at(
            F.array(F.lit("jpeg"), F.lit("png"), F.lit("opus"), F.lit("h264")),
            F.pmod(F.xxhash64(idc, F.lit(5)), F.lit(4)).cast("int") + 1,
        ).alias("format"),
    )
    return spark.range(n).select(
        idc.alias("media_id"), kind.alias("kind"), payload.alias("payload"), meta.alias("meta")
    )


def media_from_attachments(attachments_new: DataFrame) -> DataFrame:
    """Bridge the crawl's attachment descriptors (``attachments_new`` round
    output — id/original_url/content_type/filename) into the media table the
    multimodal operators consume.

    The fetch of the media bytes is SIMULATED (like the page fetch): payload
    bytes derive deterministically from the original_url, and width/height/
    duration metadata is synthesized per kind. In production this step is
    the transfer worker (reference persist_info.directly_transfer path,
    ``colymer/acquirers/weibo.py:43-46``); everything downstream — feature
    extraction, frame sampling — is identical.
    """
    kind = F.split(F.col("content_type"), "/")[0]
    kind = (
        F.when(kind.isin("image", "img"), F.lit("image"))
        .when(kind == "video", F.lit("video"))
        .when(kind == "audio", F.lit("audio"))
        .otherwise(F.lit("image"))
    )
    u = F.col("original_url")
    payload = F.encode(
        F.concat(*[F.md5(F.encode(F.concat(u, F.lit(f"#{i}")), "utf-8")) for i in range(8)]),
        "utf-8",
    )
    meta = F.struct(
        (F.pmod(F.xxhash64(u, F.lit(2)), F.lit(1920)) + 16).cast("int").alias("width"),
        (F.pmod(F.xxhash64(u, F.lit(3)), F.lit(1080)) + 16).cast("int").alias("height"),
        F.pmod(F.xxhash64(u, F.lit(4)), F.lit(600000)).cast("long").alias("duration_ms"),
        F.lit(44100).alias("sample_rate"),
        F.element_at(F.split(F.col("content_type"), "/"), -1).alias("format"),
    )
    return attachments_new.select(
        F.xxhash64(F.col("id")).alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        meta.alias("meta"),
    )


def _fake_image_features(batch: pd.DataFrame) -> pd.DataFrame:
    """DETERMINISTIC FAKE decode: byte statistics instead of pixel decode.

    Real implementation would decode `payload` with PIL/libvips here; the
    rest of the pipeline (schema, batching, downstream joins) is identical.
    """
    payloads = batch["payload"]
    # numpy over one concatenated buffer per Arrow batch (production-shaped
    # dataflow: a single pass over the batch's bytes, no per-row Python on
    # the stat columns); sha256 stays per-row — a real decoder is per-row
    # too, and hashlib releases the GIL on large inputs
    lens = payloads.map(len).to_numpy(dtype=np.int64)
    flat = np.frombuffer(b"".join(payloads), dtype=np.uint8)
    csum = np.concatenate(([0.0], np.cumsum(flat, dtype=np.float64)))
    ends = np.cumsum(lens)
    sums = csum[ends] - csum[ends - lens]
    mean_byte = np.divide(sums, lens, out=np.zeros_like(sums), where=lens > 0)
    digests = [hashlib.sha256(b).digest() for b in payloads]
    dig_mat = np.frombuffer(b"".join(d[:16] for d in digests), dtype=np.uint8)
    feature = (dig_mat.reshape(-1, 16) / 255.0).tolist()
    return pd.DataFrame(
        {
            "media_id": batch["media_id"],
            "n_bytes": lens,
            "sha256": [d.hex() for d in digests],
            "width": batch["meta"].map(lambda m: m["width"] if m is not None else None),
            "height": batch["meta"].map(lambda m: m["height"] if m is not None else None),
            "mean_byte": mean_byte,
            "feature": feature,
        }
    )


def extract_image_features(
    media: DataFrame, decode: str = "fake", batch_hint: int | None = None
) -> DataFrame:
    """Arrow-batched feature extraction over image rows (mapInPandas).

    decode='real' is a stub: raises NotImplementedError (no codec libs in
    this container). decode='fake' runs the deterministic byte-stat fake
    through the production dataflow.
    """
    if decode == "real":
        raise NotImplementedError(
            "real image decode requires PIL/libvips (not in this container); "
            "use decode='fake' — the Spark plumbing is identical"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if len(batch):
                yield _fake_image_features(batch)

    return (
        media.filter(F.col("kind") == "image")
        .repartition(F.col("media_id"))
        .mapInPandas(run, IMAGE_FEATURES)
    )


def sample_frames(
    media: DataFrame, every_ms: int = 10_000, max_frames: int = 8
) -> DataFrame:
    """Frame sampling plumbing for video rows: one output row per sampled
    timestamp. The frame payload is a STUB slice of the source bytes (a real
    implementation seeks/decodes with ffmpeg); row shape and partitioning are
    production-real."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if not len(batch):
                continue
            # vectorized over the Arrow batch: per-row frame counts from the
            # duration column, then one repeat/concat for the whole batch
            # (no per-row Python loop; real decode would slot in per frame)
            dur = batch["meta"].map(
                lambda m: m["duration_ms"] if m is not None else 0
            )
            n = (dur // every_ms).clip(lower=1, upper=max_frames).astype(int)
            media_id = batch["media_id"].repeat(n).to_numpy()
            frame_idx = [i for k in n for i in range(k)]
            payloads = batch["payload"].repeat(n).to_numpy()
            steps = (
                (batch["payload"].map(len) // n.clip(lower=1))
                .clip(lower=1)
                .repeat(n)
                .to_numpy()
            )
            frame_payload = [
                p[i * s : i * s + 16]
                for p, i, s in zip(payloads, frame_idx, steps)
            ]
            yield pd.DataFrame(
                {
                    "media_id": media_id,
                    "frame_idx": frame_idx,
                    "frame_payload": frame_payload,
                }
            )

    return (
        media.filter(F.col("kind") == "video")
        .repartition(F.col("media_id"))
        .mapInPandas(run, FRAMES)
    )
