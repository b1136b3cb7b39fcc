"""ANSI-on smoke for the rows-only catalog entries.

The per-round driver materializes EVERY ``__spark_entry__.queries()`` entry
in its own session (Spark 4 default: ``spark.sql.ansi.enabled=true``); the
oracle-less ("rows-only") entries get no DuckDB comparison, so an
ANSI-mode crash there surfaces only as a red CORRECTNESS row. This module
runs each rows-only entry at sf0.001 with ANSI forced ON and asserts it
materializes — the cheap half of the driver contract the oracle-pairs
module can't cover. (Value-level oracles for these live in their own
suites: pyref equivalence, pure-Python truth, plan assertions.)
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from colymer_acquirers_spark.queries import oracle_sql

SF_DIR = "/root/testdata/sf0.001"

ROWS_ONLY = sorted(set(entrymod.queries()) - set(oracle_sql()))


@pytest.fixture(autouse=True)
def ansi_on(spark):
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    yield
    spark.conf.set("spark.sql.ansi.enabled", prev)


def test_rows_only_inventory_is_explicit():
    # additions to the oracle-less set must be a conscious choice
    # r04: the minhash LSH pair, verified-minhash, and simhash pair entries
    # gained full DuckDB oracles (md5-family band keys / 64-lane mirror)
    # and left this list
    # r04 late: ann_lsh_topk, embedding_near_dup_lsh_pairs (literal
    # hyperplanes), and ALL THREE streaming entries — dedup_articles,
    # hourly_lang_counts, host_sessions — (batch-equivalent SQL +
    # final-watermark filter) gained full oracles
    # r05: the flagship crawl family (order + articles + attachments
    # pipeline) gained unrolled-round DuckDB CTEs, multimodal a VALUES
    # recomputation, ann_ivf_topk regenerated kmeans-literal SQL, and
    # finally flagship_recrawl the reseed-injection CTE variant — the
    # rows-only set is EMPTY: every catalog entry is value-oracled
    assert ROWS_ONLY == [], ROWS_ONLY


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_materializes_under_ansi(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0
