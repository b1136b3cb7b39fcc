#!/usr/bin/env python
"""Benchmark harness.

Default mode: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "crawl_urls_per_sec": <north-metric throughput>}

--scaling mode: runs the crawl benchmark at local[8] and local[32] (N and 4N
cores — the sandbox proxy for N vs 4N executors, BASELINE.md protocol) in
fresh subprocesses and writes BENCH/BASELINE.md with both throughputs and the
scaling efficiency.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

CRAWL_PAGES = int(os.environ.get("BENCH_CRAWL_PAGES", "200000"))
CRAWL_SEEDS = int(os.environ.get("BENCH_CRAWL_SEEDS", "20000"))
CRAWL_ROUNDS = int(os.environ.get("BENCH_CRAWL_ROUNDS", "3"))
CRAWL_BUDGET = int(os.environ.get("BENCH_CRAWL_BUDGET", "20000"))


def _crawl_bench(spark) -> tuple[float, int]:
    """North-metric workload: URLs scheduled+parsed over a synthetic frontier.

    Returns (wall_sec, urls_processed)."""
    from pyspark.sql import functions as F

    from colymer_acquirers_spark.plans.crawl import run_crawl
    from colymer_acquirers_spark.sources.synth import (
        synth_pages,
        synth_politeness,
        synth_robots,
        synth_seeds,
    )

    pages = synth_pages(spark, CRAWL_PAGES)
    seeds = synth_seeds(spark, CRAWL_SEEDS)
    politeness = synth_politeness(spark).withColumn(
        "max_fetch_per_round", F.lit(CRAWL_BUDGET)
    )
    robots = synth_robots(spark)
    workdir = tempfile.mkdtemp(prefix="bench_crawl_")
    t0 = time.monotonic()
    summary = run_crawl(
        spark, pages, seeds, politeness, robots, workdir, max_rounds=CRAWL_ROUNDS
    )
    wall = time.monotonic() - t0
    shutil.rmtree(workdir, ignore_errors=True)
    return wall, summary["rank_total"]


def run_bench() -> dict:
    from colymer_acquirers_spark.queries import queries
    from colymer_acquirers_spark.session import get_spark

    spark = get_spark(app_name="bench", master=f"local[{CPUS}]")
    results: dict[str, float] = {}

    crawl_wall, crawl_urls = _crawl_bench(spark)
    results["crawl_3rounds"] = round(crawl_wall, 3)

    headline = [
        "fetch_join_revenue",
        "seen_anti_join",
        "politeness_window_rank",
        "argmax_best_variant",
        "explode_word_count",
        "minhash_signature",
        "ann_cosine_topk",
        "crawl_one_round_schedule",
        "dedup_exact_hash",
    ]
    qmap = queries()
    for name in headline:
        t0 = time.monotonic()
        df = qmap[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        results[name] = round(time.monotonic() - t0, 3)

    total = round(sum(results.values()), 3)
    return {
        "metric": "URLs scheduled+parsed/sec on a synthetic Common-Crawl frontier",
        "value": total,
        "unit": "sec",
        "queries": results,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "crawl_urls": crawl_urls,
        "crawl_wall_sec": round(crawl_wall, 3),
        "crawl_urls_per_sec": round(crawl_urls / crawl_wall, 1) if crawl_wall else 0,
        "cpus": int(CPUS),
    }


def run_scaling() -> None:
    """local[8] vs local[32] on the same crawl input (BASELINE.md protocol)."""
    out = {}
    for cpus in (8, 32):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), BENCH_MODE="crawl_only")
        r = subprocess.run(
            [sys.executable, __file__, "--crawl-only"],
            env=env,
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
        out[cpus] = json.loads(line)
        print(f"local[{cpus}]: {out[cpus]}", file=sys.stderr)
    t8, t32 = out[8]["crawl_urls_per_sec"], out[32]["crawl_urls_per_sec"]
    eff = (t32 / t8) / 4 if t8 else 0.0
    md = f"""# BENCH — scaling evidence (N vs 4N cores)

Protocol (BASELINE.md): same crawl job + same input (synthetic web,
{CRAWL_PAGES:,} pages, {CRAWL_SEEDS:,} seeds, {CRAWL_ROUNDS} rounds,
budget {CRAWL_BUDGET}/host/round) at `local[8]` and `local[32]` —
the sandbox proxy for N and 4N executors.

| parallelism | URLs processed | wall (s) | URLs/sec |
|---|---|---|---|
| local[8]  | {out[8]["crawl_urls"]:,} | {out[8]["crawl_wall_sec"]} | {t8} |
| local[32] | {out[32]["crawl_urls"]:,} | {out[32]["crawl_wall_sec"]} | {t32} |

**Scaling efficiency (throughput@32 / throughput@8) / 4 = {eff:.3f}**
(target ≥ 0.8 per BASELINE.json)
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(md)


def run_crawl_only() -> None:
    from colymer_acquirers_spark.session import get_spark

    spark = get_spark(app_name="bench_crawl", master=f"local[{CPUS}]")
    wall, urls = _crawl_bench(spark)
    print(
        json.dumps(
            {
                "crawl_urls": urls,
                "crawl_wall_sec": round(wall, 3),
                "crawl_urls_per_sec": round(urls / wall, 1) if wall else 0,
                "cpus": int(CPUS),
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    elif "--crawl-only" in sys.argv:
        run_crawl_only()
    else:
        print(json.dumps(run_bench()))
