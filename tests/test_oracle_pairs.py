"""Driver-mimic: every queries()[name] must match oracle_sql()[name] on
DuckDB over the same parquet (row count + schema-ish + order-insensitive
values), the way the per-round CORRECTNESS check runs (SURVEY.md §5.3).

ANSI-ON GATE: the driver evaluates queries() in ITS session, where Spark 4
defaults ``spark.sql.ansi.enabled=true``; the engine factory pins it false
(session.py). Round 2 shipped a query that was green under the engine
session and red under the driver's (ANSI element_at on an empty array) —
so this module forces ANSI ON around every Spark-side execution. Nothing
in the catalog may rely on non-ANSI semantics."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from colymer_acquirers_spark.queries import oracle_sql, queries

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(autouse=True)
def ansi_on(spark):
    """Run every test in this module under driver-like ANSI semantics."""
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    yield
    spark.conf.set("spark.sql.ansi.enabled", prev)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


PAIRS = sorted(set(queries()) & set(oracle_sql()))


@pytest.mark.parametrize("name", PAIRS)
def test_pair(spark, duck, name):
    spark_df = queries()[name](spark, SF_DIR).toPandas()
    duck_df = duck.sql(oracle_sql()[name]).df()
    a, b = _normalize(spark_df), _normalize(duck_df)
    assert list(a.columns) == list(b.columns), (list(a.columns), list(b.columns))
    assert len(a) == len(b), f"{name}: rows {len(a)} vs {len(b)}"
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def test_all_queries_have_oracle_or_are_flagged():
    missing = set(queries()) - set(oracle_sql())
    # non-SQL-expressible ops are allowed to omit the oracle, but list them
    # explicitly so additions are a conscious choice
    assert missing <= set(), f"unflagged oracle-less queries: {missing}"
