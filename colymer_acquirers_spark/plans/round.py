"""One crawl round as a DataFrame job (SURVEY.md §4.4; FROZEN SPEC in
``pyref.py``).

Reference analog: one trip through ``Acquirer.scan``'s inner loop
(``colymer/acquirers/acquirer.py:24-74``) — fetch a page, dedup against the
chain boundary, parse, extend the block — generalized so one *round* handles
the whole frontier in bulk:

    frontier ─ dedup(seen) ─ robots ─ politeness-window ─⋈ pages ─ parse
             └→ crawl_order / articles / lineage / seen Δ / next frontier

Only two shuffles dominate: the anti-join on canonical_url and the window on
host (the fetch-join reuses the canonical_url clustering under AQE).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from colymer_acquirers_spark.functions.canonical import canonicalize_url, host_of
from colymer_acquirers_spark.functions.parse import parse_page
from colymer_acquirers_spark.functions.parse_expr import parse_page_expr
from colymer_acquirers_spark.operators.politeness import politeness_split, robots_filter
from colymer_acquirers_spark.operators.ranking import global_rank
from colymer_acquirers_spark.operators.seen import dedup_against_seen, merge_frontier

SORT_KEYS = ["priority", "depth", "canonical_url"]


@dataclass
class RoundResult:
    crawl_order: DataFrame  # rank, url, round
    seen_delta: DataFrame  # canonical_url
    articles: DataFrame  # schemas.ARTICLES subset
    lineage: DataFrame  # round, src_url, dst_url
    frontier_next: DataFrame  # schemas.FRONTIER
    metrics: dict
    persisted: list  # round-local cached DataFrames; unpersist after commit


def bootstrap_frontier(seeds: DataFrame) -> DataFrame:
    """Seeds → round-0 frontier (FROZEN SPEC init)."""
    f = seeds.select(
        canonicalize_url("url").alias("canonical_url"),
        F.col("url"),
        F.col("priority").cast("int"),
        F.lit(0).cast("int").alias("depth"),
        F.lit(0).cast("int").alias("discovered_round"),
    ).filter(F.col("canonical_url").isNotNull())
    return merge_frontier(f).withColumn("host", host_of("canonical_url"))


def keyed_pages(pages: DataFrame) -> DataFrame:
    """pages + canonical_url join key (null-canonical pages unreachable)."""
    return pages.withColumn("canonical_url", canonicalize_url("url")).filter(
        F.col("canonical_url").isNotNull()
    )


def run_round(
    frontier: DataFrame,
    seen: DataFrame | None,
    pages_k: DataFrame,
    politeness: DataFrame | None,
    robots: DataFrame | None,
    rnd: int,
    rank_offset: int,
    default_budget: int = 1_000_000,
    parse_impl: str = "jvm",
) -> RoundResult:
    """Execute FROZEN SPEC steps 1-9 for round ``rnd``.

    Returned DataFrames are lazy; the caller materializes them (checkpoint
    commit). ``frontier`` must already be merged (unique canonical_url).

    parse_impl: 'jvm' (whole-stage-codegen regexp/HOF expressions — default;
    html never leaves the JVM) or 'arrow' (pandas UDF, one Arrow round-trip
    per page). Both implement the same FROZEN RULES, byte-equal by test.
    """
    n_frontier = frontier.count()

    # 1. dedup against seen (exact tier; bloom prefilter slots in here)
    candidates = dedup_against_seen(frontier, seen).persist()
    n_candidates = candidates.count()

    # 2. robots gate
    allowed, blocked = robots_filter(candidates, robots)
    n_blocked = blocked.count()

    # 3. politeness budget split
    fetched, carryover = politeness_split(allowed, politeness, default_budget)
    fetched = fetched.persist()
    n_fetched = fetched.count()
    n_carryover = n_candidates - n_blocked - n_fetched

    # 4. deterministic global order (scalable rank, not a single window)
    crawl_order = global_rank(fetched, SORT_KEYS, "rank", start=rank_offset).select(
        "rank", F.col("canonical_url").alias("url"), F.lit(rnd).alias("round")
    )

    # 5. seen delta
    seen_delta = fetched.select("canonical_url")

    # 6. fetch-simulate: equi-join on canonical_url (left: misses = dangling)
    joined = fetched.select("canonical_url", "priority", "depth").join(
        pages_k.select("canonical_url", "html", "lang"),
        on="canonical_url",
        how="left",
    )
    # 7. parse: content + links in one pass (JVM exprs by default; the Arrow
    # UDF variant crosses to Python exactly once per page); html is dropped
    # before the cache so it is never buffered twice
    parse_fn = parse_page_expr if parse_impl == "jvm" else parse_page
    parsed = (
        joined.filter(F.col("html").isNotNull())
        .select(
            "canonical_url",
            "priority",
            "depth",
            "lang",
            parse_fn("html", "canonical_url").alias("p"),
        )
        .select(
            "canonical_url",
            "priority",
            "depth",
            "lang",
            F.col("p.content").alias("content"),
            F.col("p.links").alias("links"),
        )
        .persist()
    )
    n_parsed = parsed.count()
    n_miss = n_fetched - n_parsed

    articles = parsed.select(
        F.col("canonical_url").alias("url"),
        "content",
        "lang",
        F.lit(rnd).alias("round"),
        F.sha2(F.col("content").cast("binary"), 256).alias("text_sha256"),
    )
    links = (
        parsed.select(
            F.col("canonical_url").alias("src_url"),
            "priority",
            "depth",
            F.explode("links").alias("raw_url"),
        )
        .withColumn("dst_url", canonicalize_url("raw_url"))
        .filter(F.col("dst_url").isNotNull())
        .persist()
    )
    lineage = links.select(
        F.lit(rnd).alias("round"), "src_url", "dst_url"
    ).dropDuplicates(["src_url", "dst_url"])

    # 8. expand: per dst, tuple-min over parents; exclude seen ∪ this round
    seen_now = (
        seen.select("canonical_url").union(seen_delta)
        if seen is not None
        else seen_delta
    )
    new_cands = (
        links.select(
            F.col("dst_url").alias("canonical_url"),
            F.col("raw_url").alias("url"),
            F.col("priority"),
            (F.col("depth") + 1).cast("int").alias("depth"),
            F.lit(rnd + 1).cast("int").alias("discovered_round"),
        )
        .join(seen_now, on="canonical_url", how="left_anti")
    )
    n_new = new_cands.select("canonical_url").distinct().count()

    # 9. merge next frontier
    frontier_next = merge_frontier(
        carryover.select(
            "canonical_url", "url", "priority", "depth", "discovered_round"
        ).unionByName(new_cands)
    ).withColumn("host", host_of("canonical_url"))

    metrics = {
        "round": rnd,
        "candidates": n_candidates,
        "deduped": n_frontier - n_candidates,
        "blocked_robots": n_blocked,
        "fetched": n_fetched,
        "throttled": n_carryover,
        "fetch_miss": n_miss,
        "parsed": n_parsed,
        "new_urls": n_new,
    }
    return RoundResult(
        crawl_order=crawl_order,
        seen_delta=seen_delta,
        articles=articles,
        lineage=lineage,
        frontier_next=frontier_next,
        metrics=metrics,
        persisted=[candidates, fetched, parsed, links],
    )
