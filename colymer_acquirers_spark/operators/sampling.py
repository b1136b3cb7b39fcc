"""Deterministic corpus subsetting + decontamination — the selection ops a
training-data pipeline runs after dedup/quality filtering.

All hashing is the md5 family (``operators/dedup._md5_long``) so every
operator here is bit-for-bit mirrorable by the DuckDB oracle, and every
result is a pure function of the input — no RNG, no wall-clock, identical
at any parallelism (the engine-wide determinism contract; reference
analog: the acquirer's stable id-ordered scan, acquirer.py:24-44).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from colymer_acquirers_spark.operators.dedup import _md5_long


def hash_split_assign(
    df: DataFrame,
    id_col: str,
    splits: dict[str, int],
    seed: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by hash bucket — the standard
    deterministic train/val/test partitioner.

    ``splits`` maps name → integer weight (e.g. {"train": 98, "val": 1,
    "test": 1}); buckets are ``md5long(id || '#' || seed) mod total`` and
    names own contiguous ranges in the given order. Embarrassingly
    parallel (one projection, no shuffle); a row's split never changes
    when the corpus grows, which is what makes hash splits (vs
    randomSplit) reproducible across pipeline runs.
    """
    total = sum(splits.values())
    if total <= 0 or any(w < 0 for w in splits.values()):
        raise ValueError(f"split weights must be non-negative, sum > 0: {splits}")
    bucket = F.pmod(
        _md5_long(F.concat(F.col(id_col).cast("string"), F.lit(f"#{seed}"))),
        F.lit(total),
    )
    expr: Column | None = None
    lo = 0
    for name, w in splits.items():
        hi = lo + w
        cond = (bucket >= lo) & (bucket < hi)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
        lo = hi
    return df.withColumn(out_col, expr)


def stratified_sample_exact(
    df: DataFrame,
    group_col: str,
    id_col: str,
    n_per_group: int,
    seed: str = "sample",
) -> DataFrame:
    """EXACTLY ``n_per_group`` rows per group (fewer when the group is
    smaller): per-group rank by the md5 hash of the id — a deterministic
    uniform draw, reproducible at any parallelism and stable under
    appends of new groups.

    One shuffle on the group key; per-group work is a window rank. At
    web scale a single giant group serializes the window — for per-HOST
    quotas reuse the politeness two-phase split instead
    (``operators/politeness.py``); for per-language quotas (few big
    groups, this operator's use case) the window is the right shape.
    """
    order = _md5_long(
        F.concat(F.col(id_col).cast("string"), F.lit(f"#{seed}"))
    )
    w = Window.partitionBy(group_col).orderBy(order.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(n_per_group))
        .drop("__rn")
    )


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_text_col: str | None = None,
    n: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Flag training documents that overlap an evaluation benchmark —
    the C4/GPT-style n-gram decontamination gate.

    A doc is CONTAMINATED when ≥ ``min_hits`` of its word ``n``-grams
    appear anywhere in the benchmark texts. Plan shape for 100 TB: the
    benchmark shingle set is tiny relative to the corpus, so it is
    distinct-ed and BROADCAST; the corpus-side check is then a map-side
    broadcast join + per-doc aggregation — no shuffle of corpus text.
    Returns (id, n_contaminated_shingles, contaminated).
    """
    bench_text_col = bench_text_col or text_col

    def shingles(frame: DataFrame, col: str, keep_id: bool) -> DataFrame:
        toks = F.split(F.col(col), " ")
        # guard short docs: Spark's sequence(1, 0) DESCENDS ([1, 0]),
        # which would fabricate bogus partial shingles (and slice at 0
        # errors under ANSI) — docs shorter than n have no n-grams
        idx = F.when(
            F.size(toks) >= n,
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        ).otherwise(F.array().cast("array<int>"))
        sh = F.explode(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
        ).alias("__sh")
        cols = [F.col(id_col), sh] if keep_id else [sh]
        return frame.select(*cols)

    bench_sh = shingles(benchmark, bench_text_col, keep_id=False).distinct()
    doc_sh = shingles(df, text_col, keep_id=True).dropDuplicates(
        [id_col, "__sh"]
    )
    hits = (
        doc_sh.join(F.broadcast(bench_sh), on="__sh", how="left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated_shingles"))
    )
    return (
        df.select(id_col)
        .join(hits, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce(F.col("n_contaminated_shingles"), F.lit(0)).alias(
                "n_contaminated_shingles"
            ),
            (
                F.coalesce(F.col("n_contaminated_shingles"), F.lit(0))
                >= int(min_hits)
            ).alias("contaminated"),
        )
    )
