"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline; LSH (random-hyperplane)
bucketing as the scale path. Vector math is JVM-side (``zip_with`` +
``aggregate`` fold — deterministic left-to-right summation); the hyperplanes
are seed-fixed numpy constants baked into the plan as literals, so results
are reproducible across runs and parallelism.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force top-k by cosine to a constant query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = F.col(vec_col).cast("array<double>")
    return (
        df.select(F.col(id_col), cosine(v, q).alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim)


def lsh_bucket(
    df: DataFrame,
    dim: int,
    n_planes: int = 12,
    seed: int = 42,
    vec_col: str = "embedding",
    out_col: str = "bucket",
) -> DataFrame:
    """Random-hyperplane LSH: sign-bit bucket key per vector.

    Vectors in the same bucket are angularly close with high probability —
    the candidate set for ANN at scale (query: compute the query's bucket,
    scan only that bucket + neighbors by hamming distance).
    """
    planes = _hyperplanes(dim, n_planes, seed)
    v = F.col(vec_col).cast("array<double>")
    key = None
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(dot(v, plane) > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        ) * F.lit(1 << i).cast("long")
        key = bit if key is None else key + bit
    return df.withColumn(out_col, key)


def ann_cosine_topk_lsh(
    df: DataFrame,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: restrict the exact cosine scan to the query's LSH bucket
    (falls back to hamming-1 neighbor buckets for recall)."""
    planes = _hyperplanes(dim, n_planes)
    qv = np.asarray(query_vec)
    qbits = (planes @ qv > 0).astype(np.int64)
    qkey = int((qbits << np.arange(n_planes)).sum())
    neighbor_keys = [qkey] + [qkey ^ (1 << i) for i in range(n_planes)]
    bucketed = lsh_bucket(df, dim, n_planes, vec_col=vec_col)
    cand = bucketed.filter(F.col("bucket").isin(neighbor_keys))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)
