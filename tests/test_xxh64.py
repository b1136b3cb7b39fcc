"""Parity: pure-Python XXH64 (functions/xxh64.py) vs Spark's F.xxhash64.

The oracle generators bake xxhash64-derived values into DuckDB SQL as
literals; this suite pins the Python reimplementation to the JVM across
every usage shape in the catalog: single long, long + int literal chain
(synth_media / kmeans sample keys), and string children (media_id from
attachment ids).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from colymer_acquirers_spark.functions.xxh64 import Int32, pmod, xxhash64


def _spark_vals(spark, rows, expr):
    df = spark.createDataFrame(rows, ["v"])
    return [r["h"] for r in df.select(expr.alias("h")).orderBy("v").collect()]


def test_long_single(spark):
    vals = [0, 1, 2, 7, 42, -1, -12345, 2**40, -(2**40), 2**62]
    got = _spark_vals(spark, [(v,) for v in vals], F.xxhash64(F.col("v")))
    want = [xxhash64(v) for v in sorted(vals)]
    assert got == want


def test_long_with_int_literal_chain(spark):
    # the synth_media / kmeans_centroids shape: xxhash64(long_col, lit(i))
    vals = list(range(20)) + [10**12, -(10**9)]
    for lit in (1, 2, 3, 4, 5, 42):
        got = _spark_vals(
            spark, [(v,) for v in vals], F.xxhash64(F.col("v"), F.lit(lit))
        )
        want = [xxhash64(v, Int32(lit)) for v in sorted(vals)]
        assert got == want, f"lit={lit}"


def test_string_children(spark):
    vals = ["", "a", "abc", "hello world", "x" * 31, "y" * 32, "z" * 100,
            "https://h0.test/m/i0.jpg", "0123456789abcdef" * 2]
    got = _spark_vals(
        spark, [(v,) for v in vals], F.xxhash64(F.col("v"))
    )
    want = [xxhash64(v) for v in sorted(vals)]
    assert got == want
    got2 = _spark_vals(
        spark, [(v,) for v in vals], F.xxhash64(F.col("v"), F.lit(2))
    )
    want2 = [xxhash64(v, Int32(2)) for v in sorted(vals)]
    assert got2 == want2


def test_pmod_matches_spark(spark):
    vals = [0, 1, -1, 5, -5, 2**62, -(2**62)]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    got = [
        r["p"]
        for r in df.select(F.pmod(F.col("v"), F.lit(3)).alias("p"))
        .orderBy("v")
        .collect()
    ]
    assert got == [pmod(v, 3) for v in sorted(vals)]
