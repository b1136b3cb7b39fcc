"""Engine ≡ pyref oracle on the deterministic synthetic web (SURVEY.md §5.2).

Pins the north_rule correctness gate: exact crawl ordering, URL-seen set
equality, and byte-identical extracted text per url.
"""

from __future__ import annotations

import pandas as pd
import pytest

from colymer_acquirers_spark import pyref
from colymer_acquirers_spark.plans.crawl import read_output, run_crawl
from colymer_acquirers_spark.sources.synth import (
    synth_pages,
    synth_politeness,
    synth_robots,
    synth_seeds,
)

N_PAGES = 300
ROUNDS = 4


@pytest.fixture(scope="module")
def web(spark):
    pages = synth_pages(spark, N_PAGES)
    seeds = synth_seeds(spark, 8)
    politeness = synth_politeness(spark)
    robots = synth_robots(spark)
    return pages, seeds, politeness, robots


@pytest.fixture(scope="module")
def golden(web):
    pages, seeds, politeness, robots = web
    return pyref.crawl(
        pages.toPandas(),
        seeds.toPandas(),
        politeness.toPandas(),
        robots.toPandas(),
        max_rounds=ROUNDS,
    )


@pytest.fixture(scope="module")
def engine_run(spark, web, tmp_path_factory):
    pages, seeds, politeness, robots = web
    workdir = str(tmp_path_factory.mktemp("crawl"))
    summary = run_crawl(
        spark, pages, seeds, politeness, robots, workdir, max_rounds=ROUNDS
    )
    return workdir, summary


def test_crawl_order_exact(spark, golden, engine_run):
    workdir, _ = engine_run
    eng = (
        read_output(spark, workdir, "crawl_order")
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    ref = golden.crawl_order.sort_values("rank").reset_index(drop=True)
    assert len(eng) > 50, "crawl should actually progress"
    pd.testing.assert_frame_equal(
        eng[["rank", "url", "round"]].astype({"rank": "int64", "round": "int64"}),
        ref[["rank", "url", "round"]].astype({"rank": "int64", "round": "int64"}),
    )


def test_seen_set_equal(spark, golden, engine_run):
    workdir, _ = engine_run
    eng = set(
        read_output(spark, workdir, "seen_delta").toPandas()["canonical_url"]
    )
    assert eng == golden.seen


def _plain(v):
    """Engine attachment values (Rows via collect, dicts via Arrow
    toPandas, numpy scalars) → plain python (pyref's native shape)."""
    if hasattr(v, "asDict"):
        v = v.asDict()
    if isinstance(v, dict):
        return {k: _plain(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_plain(x) for x in v]
    if hasattr(v, "item"):
        return v.item()
    return v


def _att_to_dict(v):
    if v is None:
        return None
    return [_plain(a) for a in v]


def test_articles_byte_identical(spark, golden, engine_run):
    workdir, _ = engine_run
    eng = (
        read_output(spark, workdir, "articles")
        .toPandas()
        .sort_values("canonical_url")
        .reset_index(drop=True)
    )
    ref = golden.articles.sort_values("canonical_url").reset_index(drop=True)
    for col in [
        "url",
        "canonical_url",
        "title",
        "content",
        "content_type",
        "author_id",
        "author_name",
        "lang",
        "round",
        "priority",
        "depth",
        "original_data",
        "text_sha256",
    ]:
        assert list(eng[col]) == list(ref[col]), col
    # nullable int column: toPandas yields float64+NaN, pyref object ints
    ints = lambda s: [None if pd.isna(v) else int(v) for v in s]  # noqa: E731
    assert ints(eng["version"]) == ints(ref["version"])
    assert list(eng["time"]) == list(ref["time"])
    assert [
        _att_to_dict(v) for v in eng["attachments"]
    ] == list(ref["attachments"])
    # spot-check ground truth from the synth templates
    assert all(t.startswith("Page ") for t in eng["title"])
    named = eng["author_name"].dropna()
    assert len(named) > 0 and all(a.startswith("Author ") for a in named)
    assert eng["attachments"].map(len).sum() > 0, "fixtures must carry media"


def test_extracted_text_matches_ground_truth(spark, web, golden):
    """extract_text(html) must reproduce pages.text byte-identically — the
    ground-truth text column is built independently by the generator."""
    pages_pd = web[0].toPandas()
    truth = dict(zip(pages_pd["url"], pages_pd["text"]))
    for rec in golden.articles.to_dict("records"):
        assert rec["content"] == truth[rec["canonical_url"]], rec["canonical_url"]


def test_lineage_matches(spark, golden, engine_run):
    workdir, _ = engine_run
    eng = (
        read_output(spark, workdir, "lineage")
        .toPandas()
        .sort_values(["round", "src_url", "dst_url"])
        .reset_index(drop=True)
    )
    ref = golden.lineage.sort_values(["round", "src_url", "dst_url"]).reset_index(
        drop=True
    )
    assert len(eng) == len(ref)
    assert (eng["src_url"] == ref["src_url"]).all()
    assert (eng["dst_url"] == ref["dst_url"]).all()
    assert (eng["round"].astype(int) == ref["round"].astype(int)).all()


def test_metrics_match(golden, engine_run):
    _, summary = engine_run
    eng_m = summary["metrics"]
    for ref_m, em in zip(golden.metrics, eng_m):
        for k in ref_m:
            assert em[k] == ref_m[k], (em["round"], k, em[k], ref_m[k])


def test_attachments_new_once_per_id(spark, golden, engine_run):
    """P7: each attachment id enters attachments_new exactly once across
    the whole crawl, in the round it was first parsed — engine ≡ pyref."""
    workdir, _ = engine_run
    eng = (
        read_output(spark, workdir, "attachments_new")
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    ref = golden.attachments_new.sort_values("id").reset_index(drop=True)
    assert len(eng) > 0
    assert eng["id"].is_unique
    for col in ["id", "round", "original_url", "content_type", "filename"]:
        assert list(eng[col].astype(str)) == list(ref[col].astype(str)), col
