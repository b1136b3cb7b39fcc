"""Article-envelope normalization (SURVEY.md §2.2 P1-P5).

Reference analog: the per-platform status→article projections
(``colymer/acquirers/weibo.py:151-234`` web, ``:235-280`` m.weibo.cn,
``instagram.py:69-92``, ``twitter.py:62-103``, ``instagram_story.py:17-69``)
— a fixed envelope built from dynamic platform JSON, with content-type
classification (chained conditions), time-format conversion, attachment
arrays, and a best-variant argmax (``twitter.py:32-36``, ``weibo.py:54-61``).

Here: one generic normalizer over rows carrying a raw-JSON column. The raw
JSON is preserved verbatim in ``metadata_json`` (the reference's
``metadata.original_data`` passthrough) while typed fields are projected out
via ``get_json_object``/``from_json`` — schema-on-read, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def classify_type(kind: F.Column, has_media: F.Column, has_retweet: F.Column):
    """Type classification ladder (reference: weibo.py:205-213 when-chain)."""
    return (
        F.when(has_retweet, F.lit("retweet"))
        .when(has_media & (kind == F.lit("video")), F.lit("video"))
        .when(has_media, F.lit("picture"))
        .otherwise(F.lit("text"))
    )


def normalize_articles(
    raw: DataFrame,
    json_col: str = "raw_json",
    source: str = "generic",
) -> DataFrame:
    """Project raw platform JSON rows into the unified article envelope.

    Expected JSON fields (generic schema): id, author_id, author_name, text,
    created_ts (epoch seconds), kind, media (array), retweet_of.
    """
    j = F.col(json_col)

    def g(path: str):
        return F.get_json_object(j, f"$.{path}")

    has_media = F.get_json_object(j, "$.media[0]").isNotNull()
    has_retweet = g("retweet_of").isNotNull()
    return raw.select(
        g("id").alias("id"),
        g("author_id").alias("author_id"),
        g("author_name").alias("author_name"),
        F.coalesce(g("text"), F.lit("")).alias("content"),
        F.lit("text/plain").alias("content_type"),
        F.timestamp_seconds(g("created_ts").cast("long")).alias("time"),
        classify_type(g("kind"), has_media, has_retweet).alias("type"),
        F.lit(source).alias("source"),
        j.alias("metadata_json"),
    )


def best_variant(
    variants: DataFrame, group_cols: list[str], quality_col: str, tiebreak_col: str
) -> DataFrame:
    """Best media variant per item (A4: max bitrate / quality argmax,
    twitter.py:32-36) — deterministic via (quality desc, tiebreak desc)."""
    w = Window.partitionBy(*group_cols).orderBy(
        F.col(quality_col).desc(), F.col(tiebreak_col).desc()
    )
    return (
        variants.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
