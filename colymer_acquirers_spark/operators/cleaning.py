"""Corpus cleaning operators — line-level dedup and PII redaction.

The two text-hygiene passes every large training-data pipeline runs
between raw extraction and model training (RefinedWeb/CCNet-style
boilerplate line removal; PII scrubbing), expressed as pure column/
relational plans so they stay JVM-side, deterministic, and bit-for-bit
mirrorable by the DuckDB oracle.

Reference analog: the reference stores raw platform text verbatim
(``colymer/acquirers/weibo.py:171-175``) and leaves cleaning to
consumers; these operators are the consumer-side hygiene stage
generalized to the engine (SURVEY.md §2 "beyond the reference" family).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def line_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = "\n",
    min_df: int = 2,
) -> DataFrame:
    """Remove lines that repeat across ≥ ``min_df`` distinct documents
    (exact match) — the boilerplate-line filter (nav bars, cookie
    banners, footers dominate inter-document duplicate lines).

    Returns (id, text_clean, n_lines, n_lines_removed); line order is
    preserved, removed lines are deleted, remaining lines re-join on
    ``sep``. A document whose every line is boilerplate yields an empty
    ``text_clean``.

    Plan shape for 100 TB: one shuffle on the line value to compute
    document-frequency (map-side partial count-distinct), an anti-join of
    the exploded lines against the (much smaller) over-threshold line
    set, and one shuffle back on the doc id to reassemble — corpus text
    crosses the wire as individual lines, never as whole documents
    re-joined per comparison. Exact, deterministic, no UDFs.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(text_col), re.escape(sep), -1)
        ).alias("pos", "line"),
    )
    freq = (
        lines.groupBy("line")
        .agg(F.count_distinct(F.col(id_col)).alias("line_df"))
        .filter(F.col("line_df") >= int(min_df))
        .select("line")
    )
    kept = lines.join(freq, on="line", how="left_anti")
    reassembled = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            sep,
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    n_lines = F.size(F.split(F.col(text_col), re.escape(sep), -1))
    return (
        df.select(F.col(id_col), n_lines.alias("n_lines"))
        .join(reassembled, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
            F.col("n_lines"),
            (F.col("n_lines") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("int")
            .alias("n_lines_removed"),
        )
    )


# PII patterns — kept to constructs whose semantics agree between Java
# regex (Spark) and RE2 (DuckDB): character classes, bounded repetition,
# \b word boundaries, no backreferences/lookaround.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE_RE = r"\+[0-9]{1,3}[ -][0-9]{2,4}[ -][0-9]{3,4}[ -][0-9]{3,4}\b"

_PII_CLASSES = [
    ("email", PII_EMAIL_RE, "<EMAIL>"),
    ("phone", PII_PHONE_RE, "<PHONE>"),
    ("ipv4", PII_IPV4_RE, "<IP>"),
]


def pii_redact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Replace emails, international-format phone numbers, and IPv4
    addresses with typed placeholders; count hits per class.

    Order matters and is fixed (email → phone → ipv4) so the dotted
    digit-runs inside an already-redacted email can't double-count as an
    IP. One projection, no shuffle, no UDFs — regexp_replace/regexp_count
    run inside whole-stage codegen, so the pass is embarrassingly
    parallel at any scale. Returns (id, text_redacted, n_email, n_phone,
    n_ipv4).
    """
    red = F.col(text_col)
    counts = []
    for name, pat, repl in _PII_CLASSES:
        # count on the PROGRESSIVELY redacted text: a digit run inside an
        # already-replaced earlier-class match can no longer double-count
        counts.append(F.regexp_count(red, F.lit(pat)).alias(f"n_{name}"))
        red = F.regexp_replace(red, pat, repl)
    return df.select(
        F.col(id_col), red.alias("text_redacted"), *counts
    )
