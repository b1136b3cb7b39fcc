"""Iceberg-shaped table IO (SURVEY.md §7.0).

Production path (north_rule): Iceberg tables via a configured catalog —
used automatically when ``spark.sql.catalog.<name>`` is set and the table
identifier looks catalog-qualified. Offline fallback (this sandbox has no
Iceberg runtime jar): partitioned Parquet directories with an atomic
``_TABLE_COMMIT`` marker, same reader/writer API. Readers ignore
uncommitted directories, mirroring Iceberg's snapshot isolation at
directory granularity.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def _is_catalog_table(spark: SparkSession, identifier: str) -> bool:
    if "/" in identifier or identifier.startswith("file:"):
        return False
    catalog = identifier.split(".")[0]
    return spark.conf.get(f"spark.sql.catalog.{catalog}", None) is not None


def write_table(
    df: DataFrame,
    identifier: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
) -> None:
    """Write to an Iceberg table (catalog path) or a committed parquet dir."""
    spark = df.sparkSession
    if _is_catalog_table(spark, identifier):
        writer = df.writeTo(identifier)
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    marker = os.path.join(identifier, "_TABLE_COMMIT")
    if mode == "overwrite" and os.path.exists(marker):
        os.remove(marker)
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(identifier)
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {
                "committed": True,
                "schema": df.schema.simpleString(),
                # recorded so row-level rewrites preserve the layout
                "partition_by": list(partition_by or []),
            },
            f,
        )
    os.replace(tmp, marker)


def table_partitioning(identifier: str) -> list[str]:
    """Partition columns recorded at commit time ([] for unpartitioned or
    pre-existing markers without the field)."""
    marker = os.path.join(os.path.normpath(identifier), "_TABLE_COMMIT")
    if not os.path.exists(marker):
        return []
    with open(marker) as f:
        return list(json.load(f).get("partition_by") or [])


def _recover_swap(identifier: str) -> None:
    """Complete an interrupted ``_replace_committed`` swap.

    The swap has a crash window between ``os.rename(ident, old)`` and
    ``os.rename(staging, ident)`` where no table exists at the identifier.
    Without recovery, the next ``upsert_rows`` would take its "table
    absent" fresh-write branch and silently orphan all prior rows under
    ``<ident>.__old`` — a crash converted into data loss. Recovery policy,
    keyed off which siblings carry a ``_TABLE_COMMIT`` marker:

    - ident missing + staging committed → roll FORWARD (the new state was
      fully written; finish the second rename);
    - ident missing + only old committed → roll BACK to the prior state;
    - ident committed + old left behind → drop the stale ``.__old``.

    An ident-committed + staging-committed pair (crash before the first
    rename) keeps ident as truth: the replace was never acknowledged, and
    ``_replace_committed`` clears the stale staging on its next run.
    """
    ident = os.path.normpath(identifier)
    staging, old = ident + ".__staging", ident + ".__old"

    def _committed(p: str) -> bool:
        return os.path.exists(os.path.join(p, "_TABLE_COMMIT"))

    if not _committed(ident):
        source = staging if _committed(staging) else old if _committed(old) else None
        if source is not None:
            if os.path.exists(ident):  # uncommitted debris
                shutil.rmtree(ident)
            os.rename(source, ident)
    if _committed(ident):
        if _committed(old):
            shutil.rmtree(old)


def read_table(spark: SparkSession, identifier: str, schema=None) -> DataFrame:
    """Read an Iceberg table or a committed parquet dir (refuses uncommitted)."""
    if _is_catalog_table(spark, identifier):
        return spark.read.table(identifier)
    _recover_swap(identifier)
    marker = os.path.join(identifier, "_TABLE_COMMIT")
    if not os.path.exists(marker):
        raise FileNotFoundError(f"uncommitted or missing table: {identifier}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(identifier)


def _replace_committed(df: DataFrame, identifier: str) -> None:
    """Rewrite a parquet-fallback table WITHOUT destroying the prior copy.

    The old scheme (localCheckpoint + in-place overwrite) deleted the only
    committed copy before the rewrite finished: localCheckpoint blocks are
    executor-lifetime, non-replicated state, so an executor loss / OOM /
    kill mid-write left the table uncommitted AND unrecoverable. Instead:
    write the merged result to a sibling staging dir as a fully COMMITTED
    table (the expensive, failure-prone distributed write happens while the
    old directory is still intact and readable), then swap via two cheap
    directory renames. A crash between the renames leaves the prior
    committed state under ``<identifier>.__old`` and the new committed
    state under ``.__staging`` — both recoverable; readers never observe a
    half-written table because they key off the ``_TABLE_COMMIT`` marker.
    (The Iceberg catalog path gets this from MERGE snapshot isolation.)
    """
    ident = os.path.normpath(identifier)
    _recover_swap(ident)
    staging, old = ident + ".__staging", ident + ".__old"
    shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    # a row-level rewrite must not silently flatten a partitioned table
    write_table(
        df, staging, mode="overwrite", partition_by=table_partitioning(ident)
    )
    os.rename(ident, old)
    os.rename(staging, ident)
    shutil.rmtree(old)


def upsert_rows(
    spark: SparkSession, identifier: str, rows: DataFrame, key_cols: list[str]
) -> None:
    """Row-level upsert by key (S13; reference ``put_article`` —
    ``colymer/sites/colymer.py:33-46``: replace-by-id, insert if absent).

    Catalog path: Iceberg ``MERGE INTO`` (row-level op, no table rewrite).
    Parquet fallback: anti-join out the replaced keys, union, then a
    staged committed rewrite + atomic swap (``_replace_committed``) — the
    same observable semantics at directory granularity.
    """
    if _is_catalog_table(spark, identifier):
        rows.createOrReplaceTempView("__upsert_src")
        on = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
        spark.sql(
            f"MERGE INTO {identifier} t USING __upsert_src s ON {on} "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *"
        )
        return
    try:
        base = read_table(spark, identifier)
    except FileNotFoundError:
        ident = os.path.normpath(identifier)
        for sib in (ident + ".__staging", ident + ".__old"):
            if os.path.exists(sib):
                # _recover_swap could not restore a committed copy but prior
                # data exists — refuse the fresh-write branch rather than
                # silently orphaning it
                raise RuntimeError(
                    f"refusing fresh write over recovery sibling {sib}; "
                    f"inspect/restore it before upserting into {identifier}"
                )
        write_table(rows, identifier, mode="overwrite")
        return
    kept = base.join(rows.select(*key_cols), on=key_cols, how="left_anti")
    _replace_committed(kept.unionByName(rows), identifier)


def delete_rows(
    spark: SparkSession, identifier: str, keys: DataFrame, key_cols: list[str]
) -> None:
    """Row-level delete by key (S13; reference ``delete_article`` —
    ``colymer/sites/colymer.py:48-57``)."""
    if _is_catalog_table(spark, identifier):
        keys.createOrReplaceTempView("__delete_src")
        on = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
        spark.sql(
            f"MERGE INTO {identifier} t USING __delete_src s ON {on} "
            "WHEN MATCHED THEN DELETE"
        )
        return
    base = read_table(spark, identifier)
    remaining = base.join(keys.select(*key_cols), on=key_cols, how="left_anti")
    _replace_committed(remaining, identifier)
