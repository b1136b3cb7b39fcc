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
        json.dump({"committed": True, "schema": df.schema.simpleString()}, f)
    os.replace(tmp, marker)


def read_table(spark: SparkSession, identifier: str, schema=None) -> DataFrame:
    """Read an Iceberg table or a committed parquet dir (refuses uncommitted)."""
    if _is_catalog_table(spark, identifier):
        return spark.read.table(identifier)
    marker = os.path.join(identifier, "_TABLE_COMMIT")
    if not os.path.exists(marker):
        raise FileNotFoundError(f"uncommitted or missing table: {identifier}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(identifier)
