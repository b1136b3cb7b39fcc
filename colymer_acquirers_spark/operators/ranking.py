"""Scalable deterministic global ranking (SURVEY.md §4.3 "deterministic
crawl ordering").

A single ``Window.orderBy`` with no partition key collapses to one task — a
non-starter at 10^10 rows. ``global_rank`` instead range-partitions on the
sort key, ranks within partitions in parallel, and adds per-partition offsets
(a tiny driver-side cumulative sum over partition counts). Rank values are a
pure function of the key total order, so they are identical at any
parallelism — the property the determinism tests pin down.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PID = "__rank_pid"
_RN = "__rank_rn"


@dataclass
class RankInfo:
    """Side-channel results of a ``global_rank`` pass.

    ``persisted`` is the cached range-partitioned intermediate: the offset
    map is keyed by *this* materialization's partition boundaries, so the
    caller must keep it cached until after its terminal action, then
    unpersist (run_round appends it to RoundResult.persisted)."""

    total: int
    partition_counts: dict[int, int]
    persisted: DataFrame | None


def global_rank(
    df: DataFrame,
    keys: list[str],
    rank_col: str = "rank",
    start: int = 0,
    num_partitions: int | None = None,
    return_info: bool = False,
):
    """Attach ``rank_col`` = start, start+1, ... in (keys) ascending order.

    Requires `keys` to be a strict total order (unique tuples) for
    parallelism-independent ranks; the crawl sort_key includes the unique
    canonical_url, satisfying this.

    return_info=True → (df, RankInfo): row total + per-partition counts fall
    out of the offset computation for free (no extra job), and the cached
    intermediate is handed to the caller for lifecycle management instead of
    leaking one persisted DataFrame per call.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = df.repartitionByRange(num_partitions, *[F.col(k) for k in keys])
    ranged = ranged.withColumn(_PID, F.spark_partition_id())
    w = Window.partitionBy(_PID).orderBy(*[F.col(k).asc() for k in keys])
    ranged = ranged.withColumn(_RN, F.row_number().over(w))
    # Persist so the counts pass and the ranked output see the same range
    # boundaries (rank values don't depend on boundary placement, but the
    # offsets below are keyed by the boundaries of *this* materialization).
    ranged = ranged.persist()
    counts = {
        r[_PID]: r["cnt"]
        for r in ranged.groupBy(_PID).agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = {}, start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    total = acc - start
    info = RankInfo(
        total=total,
        partition_counts={pid: counts[pid] for pid in sorted(counts)},
        persisted=ranged,
    )
    if not offsets:
        ranged.unpersist()
        info.persisted = None
        out = df.withColumn(rank_col, F.lit(None).cast("long")).limit(0)
        return (out, info) if return_info else out
    # The offsets flow in as DATA (a tiny broadcast join on the partition
    # id), not as a create_map of literals: inline literals made each
    # round's generated source unique, defeating the codegen cache and
    # re-triggering janino + C2 JIT work every round (see plans/round.py
    # __round note). The join is a broadcast hash join on an int key
    # against ≤ num_partitions rows — no extra shuffle, stable source.
    offs_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()],
        schema=f"{_PID} int, __rank_off long",
    )
    out = (
        ranged.join(F.broadcast(offs_df), on=_PID)
        .withColumn(
            rank_col,
            (F.col("__rank_off") + F.col(_RN) - 1).cast("long"),
        )
        .drop(_PID, _RN, "__rank_off")
    )
    return (out, info) if return_info else out
