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
    # rows-only (non-SQL-expressible) ops; their strong oracles live in
    # tests/ (pyref equivalence, pure-Python truth comparisons)
    out["flagship_crawl_articles"] = lambda spark, sf: _q.flagship_crawl(
        spark, sf, max_rounds=3
    )

    def _docs(spark, sf):
        return spark.read.parquet(f"{sf}/documents.parquet")

    def minhash_lsh_candidate_pairs(spark, sf):
        from colymer_acquirers_spark.operators.dedup import minhash_lsh_pairs

        return minhash_lsh_pairs(_docs(spark, sf), "doc_id", "text", 16, 8)
    out["minhash_lsh_candidate_pairs"] = minhash_lsh_candidate_pairs

    def minhash_near_dups_verified_q(spark, sf):
        """Candidate→verify composition (precision 1 by construction);
        truth test in tests/test_dedup_similarity.py."""
        from colymer_acquirers_spark.operators.dedup import (
            minhash_near_dups_verified,
        )

        from pyspark.sql import functions as F

        return minhash_near_dups_verified(
            _docs(spark, sf), "doc_id", "text", threshold=0.5
        ).select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard_r"))
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

    def ann_lsh_topk(spark, sf):
        from colymer_acquirers_spark.operators.similarity import ann_cosine_topk_lsh

        e = spark.read.parquet(f"{sf}/embeddings.parquet")
        qv = [float(x) for x in e.filter("vec_id = 0").first()["embedding"]]
        # id-only projection, like ann_cosine_topk: the DuckDB oracle
        # re-ranks with its own float summation, so the hashed surface is
        # the (deterministic) id ranking, not raw float sims
        return ann_cosine_topk_lsh(
            e, qv, dim=len(qv), k=10, n_planes=8
        ).select("vec_id")
    out["ann_lsh_topk"] = ann_lsh_topk

    def ann_ivf_topk(spark, sf):
        from colymer_acquirers_spark.operators.similarity import (
            ann_cosine_topk_ivf,
        )

        e = spark.read.parquet(f"{sf}/embeddings.parquet")
        qv = [float(x) for x in e.filter("vec_id = 0").first()["embedding"]]
        return ann_cosine_topk_ivf(e, qv, k=10, n_centroids=8, n_probe=3)
    out["ann_ivf_topk"] = ann_ivf_topk

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
        rounds. The returned crawl_order contains that url TWICE — the
        value oracles (exactly-once re-fetch, determinism, compaction
        interplay) live in tests/test_evict_recrawl.py."""
        import tempfile

        from pyspark.sql import functions as F

        from colymer_acquirers_spark.plans.crawl import (
            evict_seen,
            read_output,
            run_crawl,
        )

        pages = _q.pages_from_documents(spark, sf)
        seeds = pages.orderBy("url").limit(5).select(
            "url", F.lit(0).cast("int").alias("priority")
        )
        wd = tempfile.mkdtemp(prefix="recrawl_q_")
        run_crawl(spark, pages, seeds, None, None, wd, max_rounds=2)
        url = read_output(spark, wd, "crawl_order").orderBy("rank").first()["url"]
        target = spark.createDataFrame([(url, 0)], ["url", "priority"])
        evict_seen(spark, wd, target.select("url"))
        run_crawl(spark, pages, seeds, None, None, wd, max_rounds=4,
                  reseed=target)
        return read_output(spark, wd, "crawl_order").orderBy("rank")
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
        transfer → Arrow feature extraction, end-to-end (rows-only; the
        per-stage oracles live in tests)."""
        import tempfile

        from pyspark.sql import functions as F

        from colymer_acquirers_spark.operators.multimodal import (
            extract_image_features,
            media_from_attachments,
        )
        from colymer_acquirers_spark.plans.crawl import read_output, run_crawl

        pages = _q.pages_from_documents(spark, sf)
        seeds = pages.orderBy("url").limit(5).select(
            "url", F.lit(0).cast("int").alias("priority")
        )
        wd = tempfile.mkdtemp(prefix="att_pipeline_")
        run_crawl(spark, pages, seeds, None, None, wd, max_rounds=2)
        atts = read_output(spark, wd, "attachments_new")
        feats = extract_image_features(media_from_attachments(atts))
        return feats.select("media_id", "n_bytes", "sha256", "mean_byte")
    out["crawl_attachments_pipeline"] = crawl_attachments_pipeline

    def multimodal_image_features(spark, sf):
        from colymer_acquirers_spark.operators.multimodal import (
            extract_image_features,
            synth_media,
            synth_media_bmp,
        )

        from pyspark.sql import functions as F

        docs = spark.read.parquet(f"{sf}/documents.parquet")
        n = docs.count()
        # mixed table: real 24-bit BMP payloads (true pixel stats via the
        # pure-numpy decoder) alongside opaque fake payloads (byte-stat
        # fallback) — both paths of the decode='real' dispatch
        media = synth_media_bmp(spark, n).withColumn(
            "media_id", F.col("media_id") + 1_000_000
        ).unionByName(synth_media(spark, n))
        feats = extract_image_features(media, decode="real")
        # Driver-safe projection: the `feature` array<float> column breaks the
        # driver's pandas canonicalizer (unhashable list); hash it to a scalar
        # here. The array column itself stays covered by tests/test_multimodal*.
        return feats.withColumn(
            "feature_md5", F.md5(F.to_json(F.col("feature")))
        ).drop("feature")
    out["multimodal_image_features"] = multimodal_image_features
    return out


def oracle_sql() -> dict[str, str]:
    return dict(_q.oracle_sql())
