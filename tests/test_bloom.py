"""Bloom seen-shard soundness (SURVEY.md §5.4 test 4).

The bloom may false-positive (over-route to the exact backstop) but must
never false-negative: every inserted URL probes maybe_seen=True."""

from __future__ import annotations

from pyspark.sql import functions as F

from colymer_acquirers_spark.operators.seen_bloom import BloomSeen


def _urls(spark, start, n, salt=""):
    return spark.range(start, start + n).select(
        F.concat(F.lit(f"https://h{salt}"), (F.col("id") % 13).cast("string"),
                 F.lit(".com/p/"), F.col("id").cast("string")).alias("canonical_url")
    )


def test_no_false_negatives(spark):
    bs = BloomSeen(n_shards=8, m_bits=1 << 16, k=5)
    seen = _urls(spark, 0, 5000)
    bloom = bs.build_delta(seen)
    probed = bs.probe(seen.withColumn("priority", F.lit(0)), bloom)
    assert probed.filter(~F.col("maybe_seen")).count() == 0
    assert probed.count() == 5000


def test_unseen_mostly_negative_and_never_dropped_wrongly(spark):
    bs = BloomSeen(n_shards=8, m_bits=1 << 18, k=5)
    seen = _urls(spark, 0, 3000)
    unseen = _urls(spark, 100000, 3000)
    bloom = bs.build_delta(seen).persist()
    probed = bs.probe(unseen, bloom).persist()
    n_maybe = probed.filter(F.col("maybe_seen")).count()
    # fpr should be far below 5% at this sizing
    assert n_maybe < 150, n_maybe
    # bloom-negative rows are definitely unseen: anti-join confirms none of
    # them is actually in the seen set
    negatives = probed.filter(~F.col("maybe_seen"))
    wrongly_negative = negatives.join(seen, "canonical_url", "left_semi").count()
    assert wrongly_negative == 0


def test_merge_is_union(spark):
    bs = BloomSeen(n_shards=4, m_bits=1 << 16, k=4)
    a = bs.build_delta(_urls(spark, 0, 1000))
    b = bs.build_delta(_urls(spark, 1000, 1000))
    merged = bs.merge(a.unionByName(b))
    assert merged.count() <= 4
    both = _urls(spark, 0, 2000)
    probed = bs.probe(both, merged)
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_empty_bloom_all_negative(spark):
    bs = BloomSeen(n_shards=4)
    empty = bs.build_delta(_urls(spark, 0, 0))
    probed = bs.probe(_urls(spark, 0, 500), empty)
    assert probed.filter(F.col("maybe_seen")).count() == 0
    assert probed.count() == 500
