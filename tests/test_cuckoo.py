"""Cuckoo seen-shard soundness: like the bloom (never false-negative,
rarely false-positive) PLUS deletion — the capability a bloom cannot have.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from colymer_acquirers_spark.operators.seen_cuckoo import CuckooSeen


def _urls(spark, start, n, salt=""):
    return spark.range(start, start + n).select(
        F.concat(F.lit(f"https://h{salt}"), (F.col("id") % 13).cast("string"),
                 F.lit(".com/p/"), F.col("id").cast("string")).alias("canonical_url")
    )


def test_no_false_negatives(spark):
    cs = CuckooSeen(n_shards=8, n_buckets=1 << 10)
    seen = _urls(spark, 0, 5000)
    shards = cs.build_delta(seen)
    probed = cs.probe(seen.withColumn("priority", F.lit(0)), shards)
    assert probed.filter(~F.col("maybe_seen")).count() == 0
    assert probed.count() == 5000


def test_unseen_mostly_negative(spark):
    cs = CuckooSeen(n_shards=8, n_buckets=1 << 10)
    shards = cs.build_delta(_urls(spark, 0, 3000)).persist()
    probed = cs.probe(_urls(spark, 100000, 3000), shards).persist()
    n_maybe = probed.filter(F.col("maybe_seen")).count()
    # 16-bit fingerprints: FPR ≈ 2·4/2^16 ≈ 1.2e-4 → expect ~0-2 of 3000
    assert n_maybe <= 10, n_maybe


def test_stash_overflow_keeps_soundness(spark):
    """A deliberately over-full filter (64-slot shards, 400 urls) must
    route overflow to the exact stash, never drop an inserted url."""
    cs = CuckooSeen(n_shards=2, n_buckets=16)
    seen = _urls(spark, 0, 400)
    shards = cs.build_delta(seen)
    probed = cs.probe(seen, shards)
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_merge_is_union(spark):
    cs = CuckooSeen(n_shards=4, n_buckets=1 << 10)
    a = cs.build_delta(_urls(spark, 0, 1000))
    b = cs.build_delta(_urls(spark, 1000, 1000))
    merged = cs.merge(a.unionByName(b))
    assert merged.count() <= 4
    probed = cs.probe(_urls(spark, 0, 2000), merged)
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_delete_forgets_without_false_dropping_survivors(spark):
    """The bloom-impossible operation: deleted urls probe negative again
    (≈ FPR), every survivor still probes positive."""
    cs = CuckooSeen(n_shards=4, n_buckets=1 << 10)
    seen = _urls(spark, 0, 2000).persist()
    doomed = seen.filter(F.xxhash64("canonical_url") % 4 == 0).persist()
    survivors = seen.subtract(doomed)
    shards = cs.delete_urls(cs.build_delta(seen), doomed).persist()
    # survivors: unconditional no-false-negative (each insert holds its own
    # slot copy, so deleting a twin's fingerprint cannot strip a survivor)
    assert cs.probe(survivors, shards).filter(~F.col("maybe_seen")).count() == 0
    # doomed urls are forgotten (up to fingerprint-collision FPR)
    still = cs.probe(doomed, shards).filter(F.col("maybe_seen")).count()
    assert still <= 5, still
    seen.unpersist(); doomed.unpersist()


def test_sized_and_self_description(spark):
    cs = CuckooSeen.sized(1_000_000, occupancy=0.9)
    cap = cs.n_shards * cs.n_buckets * cs.slots
    assert cap >= 1_000_000 / 0.9 * 0.99  # geometric capacity with headroom
    assert cs.n_buckets & (cs.n_buckets - 1) == 0  # power of two (XOR partner)
    t = CuckooSeen(n_shards=3, n_buckets=64).build_delta(_urls(spark, 0, 50))
    back = CuckooSeen.from_table(t)
    assert back.params() == {"n_shards": 3, "n_buckets": 64, "slots": 4}


def test_crawl_with_cuckoo_filter_identical_and_resumable(spark, tmp_path):
    """The cuckoo tier is a drop-in seen prefilter for the crawl loop:
    results identical to the exact-only run, resume reconstructs the
    filter kind+geometry from the persisted shard table."""
    from colymer_acquirers_spark.plans.crawl import read_output, run_crawl
    from colymer_acquirers_spark.sources.synth import (
        synth_pages,
        synth_politeness,
        synth_seeds,
    )

    pages = synth_pages(spark, 300).persist()
    seeds = synth_seeds(spark, 6)
    pol = synth_politeness(spark)

    wd_c = str(tmp_path / "cuckoo")
    run_crawl(spark, pages, seeds, pol, None, wd_c, max_rounds=2,
              use_bloom=True, bloom_filter=CuckooSeen(n_shards=4, n_buckets=256))
    # resume two more rounds WITHOUT passing the filter: kind + geometry
    # must come from the persisted table
    run_crawl(spark, pages, seeds, pol, None, wd_c, max_rounds=4, use_bloom=True)

    wd_e = str(tmp_path / "exact")
    run_crawl(spark, pages, seeds, pol, None, wd_e, max_rounds=4)

    a = [r["url"] for r in read_output(spark, wd_c, "crawl_order").orderBy("rank").collect()]
    b = [r["url"] for r in read_output(spark, wd_e, "crawl_order").orderBy("rank").collect()]
    assert a == b and len(a) > 30
    pages.unpersist()


def test_power_of_two_geometry_enforced():
    """ADVICE r3: i2 = (i1 ^ spread) % n_buckets is an involution only for
    power-of-two geometries — anything else must refuse to construct."""
    import pytest

    with pytest.raises(ValueError, match="power of two"):
        CuckooSeen(n_shards=2, n_buckets=1000)
    with pytest.raises(ValueError, match="power of two"):
        CuckooSeen(n_shards=2, n_buckets=0)


def test_delete_with_fp_only_stash_keeps_survivors_seen(spark):
    """VERDICT r3 #4: inserts past the kick budget degrade VICTIM entries
    to fingerprint-only stash sentinels. Deleting urls in that regime may
    clear a colliding slot, but the sentinel still matches by fingerprint —
    no surviving url may flip from seen→unseen, and the shard state stays
    self-consistent."""
    import numpy as np

    cs = CuckooSeen(n_shards=2, n_buckets=16)  # 128 slots, 400 inserts
    seen = _urls(spark, 0, 400).persist()
    shards = cs.build_delta(seen).persist()
    stashes = [np.frombuffer(r["stash"], dtype=np.int64)
               for r in shards.collect()]
    assert any((s < 0).any() for s in stashes), "no fp-only sentinels; " \
        "the over-full fixture no longer exercises the degraded path"

    doomed = seen.filter(F.xxhash64("canonical_url") % 8 == 0).persist()
    survivors = seen.subtract(doomed)
    after = cs.delete_urls(shards, doomed).persist()
    assert cs.probe(survivors, after).filter(~F.col("maybe_seen")).count() == 0
    for r in after.collect():  # shard state consistent after the delete
        assert r["n_items"] >= 0
        assert (r["n_shards"], r["n_buckets"], r["slots"]) == (2, 16, 4)
    seen.unpersist(); doomed.unpersist(); shards.unpersist(); after.unpersist()


def test_randomized_model_soundness(spark):
    """Model-based check vs a python set: across a random interleaving of
    insert-batches, shard merges, and deletes-of-inserted-urls (the
    documented contract), every url the model holds must still probe
    maybe_seen=True after every operation — the no-false-negative
    invariant is unconditional, stash degradation and kicks included."""
    import numpy as np

    rng = np.random.RandomState(3)
    cs = CuckooSeen(n_shards=2, n_buckets=32)  # 256 slots: forces kicks+stash
    pool = [f"https://h{i % 7}.x/p/{i}" for i in range(600)]
    model: set[str] = set()
    shards = None
    for _ in range(5):
        picked = rng.choice(600, size=120, replace=False).tolist()
        new = [pool[i] for i in picked if pool[i] not in model]
        if new:
            delta = cs.build_delta(
                spark.createDataFrame([(u,) for u in new], ["canonical_url"])
            )
            prev = shards
            shards = (
                delta if prev is None
                else cs.merge(prev.unionByName(delta))
            ).persist()
            shards.count()
            if prev is not None:
                prev.unpersist()
            model |= set(new)
        doomed_n = len(model) // 5
        doomed = [
            u for u in sorted(model)
            if rng.rand() < 0.25
        ][:doomed_n]
        if doomed:
            prev = shards
            shards = cs.delete_urls(
                prev,
                spark.createDataFrame([(u,) for u in doomed], ["canonical_url"]),
            ).persist()
            shards.count()
            prev.unpersist()
            model -= set(doomed)
        probe = spark.createDataFrame(
            [(u,) for u in sorted(model)], ["canonical_url"]
        )
        n_neg = cs.probe(probe, shards).filter(~F.col("maybe_seen")).count()
        assert n_neg == 0, f"{n_neg} false negatives with {len(model)} live urls"
