"""Iceberg-shaped table IO fallback: atomic commit marker semantics."""

from __future__ import annotations

import pytest

from colymer_acquirers_spark.sources.tables import read_table, write_table


def test_write_read_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t1")
    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    write_table(df, path, mode="overwrite")
    got = read_table(spark, path)
    assert got.count() == 100
    assert {r["id"]: r["v"] for r in got.collect()}[7] == 14


def test_uncommitted_refused(spark, tmp_path):
    path = str(tmp_path / "t2")
    spark.range(5).write.parquet(path)  # raw write, no commit marker
    with pytest.raises(FileNotFoundError):
        read_table(spark, path)


def test_append_keeps_commit(spark, tmp_path):
    path = str(tmp_path / "t3")
    write_table(spark.range(10), path, mode="overwrite")
    write_table(spark.range(10, 20), path, mode="append")
    assert read_table(spark, path).count() == 20


def test_crawl_round_outputs_are_committed_tables(spark, tmp_path):
    """A crawl round's outputs go through write_table: each output dir
    carries a _TABLE_COMMIT marker and reads back via read_table."""
    import os

    from colymer_acquirers_spark.plans.crawl import run_crawl
    from colymer_acquirers_spark.sources.synth import (
        synth_pages,
        synth_politeness,
        synth_robots,
        synth_seeds,
    )

    wd = str(tmp_path / "wd")
    run_crawl(
        spark,
        synth_pages(spark, 120),
        synth_seeds(spark, 6),
        synth_politeness(spark),
        synth_robots(spark),
        wd,
        max_rounds=2,
    )
    for rnd in (0, 1):
        for name in ("crawl_order", "articles", "lineage", "frontier_next"):
            path = os.path.join(wd, "rounds", str(rnd), name)
            assert os.path.exists(os.path.join(path, "_TABLE_COMMIT")), path
            assert read_table(spark, path).count() >= 0


def test_upsert_and_delete_rows(spark, tmp_path):
    """S13 row-level CRUD semantics on the committed-parquet fallback."""
    from pyspark.sql import functions as F

    from colymer_acquirers_spark.sources.tables import delete_rows, upsert_rows

    path = str(tmp_path / "arts")
    base = spark.range(5).select(
        F.col("id"), F.concat(F.lit("v1-"), F.col("id")).alias("content")
    )
    write_table(base, path, mode="overwrite")

    # update id=2, insert id=99
    changes = spark.createDataFrame(
        [(2, "v2-2"), (99, "v1-99")], ["id", "content"]
    )
    upsert_rows(spark, path, changes, ["id"])
    got = {r["id"]: r["content"] for r in read_table(spark, path).collect()}
    assert got[2] == "v2-2" and got[99] == "v1-99" and got[0] == "v1-0"
    assert len(got) == 6

    delete_rows(
        spark, path, spark.createDataFrame([(0,), (99,)], ["id"]), ["id"]
    )
    got = {r["id"]: r["content"] for r in read_table(spark, path).collect()}
    assert set(got) == {1, 2, 3, 4}

    # upsert into a missing table creates it
    path2 = str(tmp_path / "fresh")
    upsert_rows(spark, path2, changes, ["id"])
    assert read_table(spark, path2).count() == 2
