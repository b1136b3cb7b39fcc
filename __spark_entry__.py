"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship multi-round crawl over a pages view derived from
``sf0.001/documents.parquet``; ``queries``/``oracle_sql`` expose the operator
catalog (colymer_acquirers_spark.queries) for the per-round DuckDB
correctness gate. Non-SQL-expressible ops (the full checkpointed crawl loop)
appear in ``queries()`` without an oracle entry → rows-only check; their
strong oracle is the pyref equivalence suite under tests/.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from colymer_acquirers_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: 3 checkpointed crawl rounds (dedup → politeness → fetch-join
    → parse → expand) over the derived pages view at sf0.001."""
    return _q.flagship_crawl(spark, "/root/testdata/sf0.001", max_rounds=3)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out = dict(_q.queries())
    # rows-only (non-SQL-expressible): the full round loop with UDF parse
    out["flagship_crawl_articles"] = lambda spark, sf: _q.flagship_crawl(
        spark, sf, max_rounds=3
    )
    return out


def oracle_sql() -> dict[str, str]:
    return dict(_q.oracle_sql())
