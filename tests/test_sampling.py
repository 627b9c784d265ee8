"""Deterministic sampling/splitting (operators/sampling.py): membership
must be a pure function of the row key — identical across partitionings
— and quotas must hold exactly."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from search_spark.operators.sampling import hash_split, stratified_sample


def _md5(s) -> str:
    return hashlib.md5(str(s).encode()).hexdigest()


def test_hash_split_matches_python_reference(spark):
    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    got = {
        r["doc_id"]: r["split"]
        for r in hash_split(
            df, "doc_id", {"train": 0.9, "holdout": 0.1}, n_hex=4
        ).collect()
    }
    bound = format(round(0.9 * 16 ** 4), "04x")
    want = {
        i: ("train" if _md5(i)[:4] < bound else "holdout")
        for i in range(500)
    }
    assert got == want
    # quantized 90/10 split should land near 450/50
    n_train = sum(1 for v in got.values() if v == "train")
    assert 400 <= n_train <= 480


def test_hash_split_is_partitioning_invariant(spark):
    base = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    one = {
        r["doc_id"]: r["split"]
        for r in hash_split(
            base.coalesce(1), "doc_id", {"a": 0.5, "b": 0.5}
        ).collect()
    }
    many = {
        r["doc_id"]: r["split"]
        for r in hash_split(
            base.repartition(17), "doc_id", {"a": 0.5, "b": 0.5}
        ).collect()
    }
    assert one == many


def test_hash_split_three_way_and_validation(spark):
    df = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    rows = hash_split(
        df, "doc_id", {"train": 0.8, "dev": 0.1, "test": 0.1}
    ).collect()
    assert {r["split"] for r in rows} == {"train", "dev", "test"}
    with pytest.raises(ValueError):
        hash_split(df, "doc_id", {})
    with pytest.raises(ValueError):
        hash_split(df, "doc_id", {"a": 0.9, "b": 0.3})


def test_stratified_sample_quota_and_determinism(spark):
    df = spark.range(0, 400).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("lang"),
    )
    out = stratified_sample(df, "lang", "doc_id", k=10)
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault(r["lang"], []).append(r["doc_id"])
    assert all(len(v) == 10 for v in per.values())
    # the chosen rows are exactly the k lowest by (md5-prefix, key)
    for lang, ids in per.items():
        universe = [i for i in range(400) if str(i % 3) == lang]
        want = sorted(universe, key=lambda i: (_md5(i)[:8], str(i)))[:10]
        assert sorted(ids) == sorted(want)
    # partitioning-invariant
    again = sorted(
        (r["lang"], r["doc_id"])
        for r in stratified_sample(
            df.repartition(13), "lang", "doc_id", k=10
        ).collect()
    )
    assert again == sorted((r["lang"], r["doc_id"]) for r in rows)


def test_stratified_sample_small_stratum_returns_all(spark):
    df = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, "fr")], ["doc_id", "lang"]
    )
    rows = stratified_sample(df, "lang", "doc_id", k=5).collect()
    assert len(rows) == 3
    with pytest.raises(ValueError):
        stratified_sample(df, "lang", "doc_id", k=0)


def test_weighted_sample_extremes_and_determinism(spark):
    from pyspark.sql import functions as F

    from search_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame([(i,) for i in range(400)], ["k"])
    assert weighted_sample(df, "k", F.lit(0.0)).count() == 0
    assert weighted_sample(df, "k", F.lit(1.0)).count() == 400
    # clamping: out-of-range probabilities behave like 0/1
    assert weighted_sample(df, "k", F.lit(-3.0)).count() == 0
    assert weighted_sample(df, "k", F.lit(7.0)).count() == 400

    half = weighted_sample(df, "k", F.lit(0.5))
    kept = sorted(r["k"] for r in half.collect())
    # membership is partitioning-independent
    kept2 = sorted(
        r["k"]
        for r in weighted_sample(df.repartition(17), "k", F.lit(0.5)).collect()
    )
    assert kept == kept2
    # hash-uniform: the realized rate is near the target
    assert 140 <= len(kept) <= 260


def test_weighted_sample_matches_python_md5(spark):
    import hashlib

    from pyspark.sql import functions as F

    from search_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame([(i,) for i in range(100)], ["k"])
    got = {r["k"] for r in weighted_sample(df, "k", F.lit(0.3)).collect()}
    want = {
        i
        for i in range(100)
        if int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) / 16**8 < 0.3
    }
    assert got == want


def test_global_index_matches_global_rank(spark):
    from search_spark.operators.sampling import global_index

    import random

    rng = random.Random(5)
    vals = list({f"k{rng.randrange(10_000):05d}" for _ in range(500)})
    df = spark.createDataFrame(
        [(v,) for v in vals for _ in (0, 1)], ["v"]  # duplicates collapse
    ).repartition(7)
    got = {
        r["v"]: r["idx"] for r in global_index(df, "v").collect()
    }
    want = {v: i for i, v in enumerate(sorted(set(vals)))}
    assert got == want


def test_negative_samples_protocol(spark):
    from search_spark.operators.sampling import negative_samples

    triples = spark.createDataFrame(
        [
            ("a", "p", "b"),
            ("a", "p", "c"),
            ("b", "q", "c"),
            ("c", "p", "a"),
        ],
        ["subj", "pred", "obj"],
    )
    out1 = sorted(map(tuple, negative_samples(triples, k=8).collect()))
    out2 = sorted(map(tuple, negative_samples(triples, k=8).collect()))
    assert out1 == out2  # deterministic across runs
    true = {("a", "p", "b"), ("a", "p", "c"), ("b", "q", "c"),
            ("c", "p", "a")}
    for subj, pred, obj_neg, i in out1:
        assert (subj, pred, obj_neg) not in true  # filtered protocol
        assert 0 <= i < 8
    # corruption hits real entities only
    ents = {"a", "b", "c"}
    assert {t[2] for t in out1} <= ents
    assert len(out1) > 0
