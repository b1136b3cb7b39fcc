"""Checkpointed crawl driver loop (SURVEY.md §2.10 Z3/Z4).

Reference analog: ``Acquirer.scan``'s persist-after-every-page checkpointing
(``colymer/acquirers/acquirer.py:54,71-74``) and crash-resume via
``get_recent_block`` adopt/splice (``:30-37,46-58``). The engine checkpoints
at round granularity: each round writes its five outputs under
``rounds/K/…`` and commits by writing ``manifest.json`` *last* — a crash
before the manifest leaves an uncommitted round that resume simply
recomputes. Rounds are strictly functional (no wall-clock, no randomness in
the round path), so a resumed run reproduces identical ordering — the Z4
property the resume test pins.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from colymer_acquirers_spark import schemas
from colymer_acquirers_spark.plans.round import bootstrap_frontier, keyed_pages, run_round

OUTPUTS = ["crawl_order", "seen_delta", "articles", "lineage", "frontier_next"]


def _round_dir(workdir: str, k: int) -> str:
    return os.path.join(workdir, "rounds", str(k))


def _manifest_path(workdir: str, k: int) -> str:
    return os.path.join(_round_dir(workdir, k), "manifest.json")


def committed_rounds(workdir: str) -> list[int]:
    rounds_dir = os.path.join(workdir, "rounds")
    if not os.path.isdir(rounds_dir):
        return []
    out = []
    for name in os.listdir(rounds_dir):
        if name.isdigit() and os.path.exists(_manifest_path(workdir, int(name))):
            out.append(int(name))
    return sorted(out)


def read_manifest(workdir: str, k: int) -> dict:
    with open(_manifest_path(workdir, k)) as f:
        return json.load(f)


def _read_or_empty(spark: SparkSession, paths: list[str], schema) -> DataFrame:
    existing = [p for p in paths if os.path.exists(p)]
    if not existing:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*existing)


def read_output(spark: SparkSession, workdir: str, name: str, upto: int | None = None) -> DataFrame:
    """Union an output across committed rounds (e.g. all articles)."""
    schema = {
        "crawl_order": schemas.CRAWL_ORDER,
        "seen_delta": schemas.SEEN,
        "articles": None,
        "lineage": schemas.LINEAGE,
        "frontier_next": schemas.FRONTIER,
    }[name]
    ks = committed_rounds(workdir)
    if upto is not None:
        ks = [k for k in ks if k <= upto]
    paths = [os.path.join(_round_dir(workdir, k), name) for k in ks]
    paths = [p for p in paths if os.path.exists(p)]
    if not paths:
        if schema is None:
            raise ValueError(f"no committed {name} outputs under {workdir}")
        return spark.createDataFrame([], schema)
    df = spark.read.parquet(*paths)
    return df


def run_crawl(
    spark: SparkSession,
    pages: DataFrame,
    seeds: DataFrame,
    politeness: DataFrame | None,
    robots: DataFrame | None,
    workdir: str,
    max_rounds: int = 10,
    default_budget: int = 1_000_000,
    resume: bool = True,
    parse_impl: str = "jvm",
) -> dict:
    """Run (or resume) up to ``max_rounds`` crawl rounds; returns summary.

    Deterministic: same (pages, seeds, politeness, robots, budgets) →
    identical outputs at any parallelism, resumed or not.
    """
    # canonicalize once, reuse across rounds (at warehouse scale the pages
    # table stores canonical_url as a bucketed column instead — see README)
    pages_k = keyed_pages(pages).persist()

    done = committed_rounds(workdir) if resume else []
    if not resume and os.path.isdir(os.path.join(workdir, "rounds")):
        shutil.rmtree(os.path.join(workdir, "rounds"))
        done = []

    if done:
        last = done[-1]
        m = read_manifest(workdir, last)
        rank_offset = m["rank_offset_next"]
        start_round = last + 1
        frontier = spark.read.schema(schemas.FRONTIER).parquet(
            os.path.join(_round_dir(workdir, last), "frontier_next")
        )
        frontier_count = m["metrics"]["frontier_next_count"]
    else:
        rank_offset = 0
        start_round = 0
        frontier = bootstrap_frontier(seeds).persist()
        frontier_count = frontier.count()

    all_metrics = [read_manifest(workdir, k)["metrics"] for k in done]

    for rnd in range(start_round, max_rounds):
        if frontier_count == 0:
            break
        seen = (
            read_output(spark, workdir, "seen_delta", upto=rnd - 1)
            if rnd > 0
            else None
        )
        rr = run_round(
            frontier,
            seen,
            pages_k,
            politeness,
            robots,
            rnd,
            rank_offset,
            default_budget,
            parse_impl=parse_impl,
        )
        rd = _round_dir(workdir, rnd)
        # clean any uncommitted leftovers from a crashed attempt
        if os.path.isdir(rd) and not os.path.exists(_manifest_path(workdir, rnd)):
            shutil.rmtree(rd)
        os.makedirs(rd, exist_ok=True)
        rr.crawl_order.write.mode("overwrite").parquet(os.path.join(rd, "crawl_order"))
        rr.seen_delta.write.mode("overwrite").parquet(os.path.join(rd, "seen_delta"))
        rr.articles.write.mode("overwrite").parquet(os.path.join(rd, "articles"))
        rr.lineage.write.mode("overwrite").parquet(os.path.join(rd, "lineage"))
        rr.frontier_next.write.mode("overwrite").parquet(
            os.path.join(rd, "frontier_next")
        )
        frontier = spark.read.schema(schemas.FRONTIER).parquet(
            os.path.join(rd, "frontier_next")
        )
        frontier_count = frontier.count()
        rank_offset += rr.metrics["fetched"]
        metrics = dict(rr.metrics, frontier_next_count=frontier_count)
        all_metrics.append(metrics)
        # commit marker LAST (atomic at the filesystem-rename granularity)
        tmp = _manifest_path(workdir, rnd) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"round": rnd, "rank_offset_next": rank_offset, "metrics": metrics}, f)
        os.replace(tmp, _manifest_path(workdir, rnd))
        for df in rr.persisted:
            df.unpersist()

    pages_k.unpersist()
    return {
        "rounds": committed_rounds(workdir),
        "rank_total": rank_offset,
        "metrics": all_metrics,
    }
