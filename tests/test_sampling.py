"""Corpus-selection operators vs pure-python truth: deterministic hash
splits, stratified quotas, benchmark decontamination."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from colymer_acquirers_spark.operators.sampling import (
    decontaminate,
    hash_split_assign,
    stratified_sample_exact,
)


def _md5long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _docs(spark, n):
    rows = [(i, f"lang{i % 3}", f"word{i} " * 3) for i in range(n)]
    return spark.createDataFrame(rows, ["doc_id", "lang", "text"])


def test_hash_split_matches_python_and_is_append_stable(spark):
    """Each row's split equals the python md5 model, and growing the
    corpus never reassigns an existing row (the property randomSplit
    lacks and hash splits exist for)."""
    weights = {"train": 98, "val": 1, "test": 1}

    def expected(i):
        b = _md5long(f"{i}#split") % 100
        return "train" if b < 98 else ("val" if b < 99 else "test")

    small = {
        r["doc_id"]: r["split"]
        for r in hash_split_assign(_docs(spark, 300), "doc_id", weights).collect()
    }
    assert small == {i: expected(i) for i in range(300)}
    big = {
        r["doc_id"]: r["split"]
        for r in hash_split_assign(_docs(spark, 400), "doc_id", weights).collect()
    }
    assert all(big[i] == small[i] for i in range(300))
    assert sum(1 for v in big.values() if v == "train") > 350  # ~98%


def test_hash_split_rejects_bad_weights(spark):
    with pytest.raises(ValueError):
        hash_split_assign(_docs(spark, 5), "doc_id", {"a": 0})
    with pytest.raises(ValueError):
        hash_split_assign(_docs(spark, 5), "doc_id", {"a": -1, "b": 2})


def test_stratified_sample_exact_quota_and_determinism(spark):
    d = _docs(spark, 200)  # 3 langs: sizes 67/67/66
    out = stratified_sample_exact(d, "lang", "doc_id", 20)
    per = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per == {"lang0": 20, "lang1": 20, "lang2": 20}
    # under-full groups return everything
    tiny = stratified_sample_exact(_docs(spark, 9), "lang", "doc_id", 20)
    assert tiny.count() == 9
    # deterministic: same draw both times, and it matches the python model
    ids1 = {r["doc_id"] for r in out.collect()}
    ids2 = {r["doc_id"]
            for r in stratified_sample_exact(d, "lang", "doc_id", 20).collect()}
    assert ids1 == ids2
    for g in range(3):
        members = [i for i in range(200) if i % 3 == g]
        exp = set(sorted(members, key=lambda i: (_md5long(f"{i}#sample"), i))[:20])
        assert {i for i in ids1 if i % 3 == g} == exp


def test_decontaminate_matches_python_truth(spark):
    corpus = [
        (0, "a b c d e f g h i j"),          # shares 8-gram with bench
        (1, "a b c d e f g X i j"),          # broken in the middle: no hit
        (2, "z y x w v u t s r q"),          # disjoint
        (3, "short doc"),                     # < 8 tokens: no shingles
        (4, "p a b c d e f g h i j k"),      # contains bench 8-grams inside
    ]
    bench = [(100, "a b c d e f g h i j")]
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    bdf = spark.createDataFrame(bench, ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_contaminated_shingles"], r["contaminated"])
           for r in decontaminate(df, bdf, "doc_id", "text", n=8).collect()}

    def sh(t, n=8):
        w = t.split(" ")
        return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}

    bset = set().union(*[sh(t) for _, t in bench])
    for i, t in corpus:
        hits = len(sh(t) & bset) if len(t.split()) >= 8 else 0
        assert got[i] == (hits, hits >= 1), (i, got[i], hits)
    assert got[0][1] and got[4][1]
    assert not got[1][1] and not got[2][1] and not got[3][1]


def test_decontaminate_broadcasts_benchmark(spark):
    """Scale shape: the benchmark shingle side must be a broadcast join —
    no shuffle of corpus shingles against it."""
    d = _docs(spark, 120).withColumn(
        "text", F.concat(F.col("text"), F.lit(" k l m n o p q r s t"))
    )
    bench = d.filter(F.col("doc_id") % 11 == 0)
    out = decontaminate(d, bench, "doc_id", "text", n=8)
    out.write.format("noop").mode("overwrite").save()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:1200]
