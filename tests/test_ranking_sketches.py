"""BM25 / inverted postings (operators/ranking.py) and the
order-statistics distinct sketch (operators/sketches.py).

Ground truth: an independent pure-Python BM25, hand-counted postings,
and exact distinct counts for the sketch's accuracy envelope.
"""

import math

import pytest
from pyspark.sql import functions as F

from search_spark.operators.ranking import bm25_topk, inverted_postings
from search_spark.operators.sketches import R_DEFAULT, distinct_sketch

DOCS = [
    (0, "stream processing with hash join and window functions"),
    (1, "hash join hash join hash join"),
    (2, "window window window stream"),
    (3, "completely unrelated text about gardening"),
    (4, ""),  # empty doc: counts toward N, length 0
]


def _python_bm25(docs, query, k1=1.2, b=0.75):
    import re

    toks = {d: re.findall(r"[a-z0-9_]{2,}", t.lower()) for d, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    scores = {}
    for d, ts in toks.items():
        s = 0.0
        for q in sorted(set(query)):
            tf = ts.count(q)
            if tf == 0:
                continue
            df = sum(1 for v in toks.values() if q in v)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * len(ts) / avgdl)
            )
        if s > 0:
            scores[d] = s
    return scores


def test_bm25_matches_python_reference(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    query = ["stream", "hash", "join", "window"]
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(df, query, topk=10).collect()
    }
    want = _python_bm25(DOCS, query)
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(round(want[d], 6), abs=1e-6)
    # doc 3 matches nothing, doc 4 is empty — excluded
    assert 3 not in got and 4 not in got


def test_bm25_rewards_rare_terms(spark):
    # 'gardening' appears in one doc; a query for it must rank doc 3 first
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    rows = bm25_topk(df, ["gardening", "stream"], topk=10).collect()
    assert rows[0]["doc_id"] == 3


def test_inverted_postings_counts_and_cap(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    idx = {r["term"]: r for r in inverted_postings(df).collect()}
    assert idx["hash"]["df"] == 2
    assert idx["hash"]["cf"] == 4  # 1 + 3 occurrences
    assert idx["hash"]["postings"] == [0, 1]
    assert not idx["hash"]["truncated"]

    capped = {
        r["term"]: r
        for r in inverted_postings(df, max_postings=1).collect()
    }
    assert capped["hash"]["df"] == 2  # exact counts survive the cap
    assert capped["hash"]["postings"] == [0]
    assert capped["hash"]["truncated"]


def test_distinct_sketch_accuracy_and_exactness_contract(spark):
    # 3 groups with very different cardinalities; estimator stderr is
    # ~1/sqrt(R-2) ≈ 18% at R=32 — assert a generous 35% envelope
    rows = []
    for g, n in [("a", 50), ("b", 500), ("c", 2000)]:
        for i in range(n):
            rows.append((g, f"val_{g}_{i}"))
            rows.append((g, f"val_{g}_{i}"))  # duplicates must not matter
    df = spark.createDataFrame(rows, ["grp", "v"])
    got = {
        r["grp"]: r["est_distinct"]
        for r in distinct_sketch(df, "grp", "v").collect()
    }
    for g, n in [("a", 50), ("b", 500), ("c", 2000)]:
        assert abs(got[g] - n) / n < 0.35, (g, got[g], n)


def test_distinct_sketch_is_mergeable(spark):
    """Sharding the input and combining per-shard minima (elementwise
    MIN) must reproduce the whole-input sketch — the property that makes
    the estimator safe to partial-aggregate at scale."""
    rows = [("g", f"v{i}") for i in range(400)]
    df = spark.createDataFrame(rows, ["grp", "v"])
    whole = distinct_sketch(df, "grp", "v").collect()[0]

    shard1 = spark.createDataFrame(rows[:137], ["grp", "v"])
    shard2 = spark.createDataFrame(rows[137:], ["grp", "v"])
    from search_spark.operators.sketches import sketch_mins

    def mins(sdf):
        return sketch_mins(sdf, "grp", "v", R_DEFAULT).collect()[0]

    m1, m2 = mins(shard1), mins(shard2)
    merged_sum = sum(
        min(m1[f"m{i}"], m2[f"m{i}"]) for i in range(R_DEFAULT)
    )
    assert merged_sum == whole["sum_min"]


def test_ranking_query_plans(spark):
    from search_spark.queries import QUERIES
    from tests.test_plans import plan_of

    for name in ["bm25_search", "inverted_index", "sketch_distinct"]:
        plan = plan_of(QUERIES[name].spark(spark, "/root/testdata/sf0.001"))
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    # the sketch is plain partial-aggregating MINs — one exchange, no join
    plan = plan_of(
        QUERIES["sketch_distinct"].spark(spark, "/root/testdata/sf0.001")
    )
    assert "Join" not in plan


def test_sketch_overlap_known_intersection(spark):
    # A = 0..999, B = 500..1499: |A|=|B|=1000, |A∪B|=1500, |A∩B|=500
    rows = [("A", f"v{i}") for i in range(1000)] + [
        ("B", f"v{i}") for i in range(500, 1500)
    ]
    from search_spark.operators.sketches import sketch_overlap

    r = sketch_overlap(
        spark.createDataFrame(rows, ["grp", "v"]), "grp", "v"
    ).collect()[0]
    assert r["grp_a"] == "A" and r["grp_b"] == "B"
    assert abs(r["est_a"] - 1000) / 1000 < 0.35
    assert abs(r["est_union"] - 1500) / 1500 < 0.35
    # intersection inherits both errors — generous envelope, but it must
    # clearly separate "half overlap" from "none" and "full"
    assert 100 < r["est_overlap"] < 900


def test_sketch_overlap_disjoint_groups(spark):
    rows = [("A", f"x{i}") for i in range(800)] + [
        ("B", f"y{i}") for i in range(800)
    ]
    from search_spark.operators.sketches import sketch_overlap

    r = sketch_overlap(
        spark.createDataFrame(rows, ["grp", "v"]), "grp", "v"
    ).collect()[0]
    # disjoint: union ≈ 1600, overlap estimate near 0 (clamped ≥ 0)
    assert r["est_overlap"] < 0.25 * 800


def test_count_min_sketch_overestimates_only_and_is_tight(spark):
    from search_spark.operators.sketches import (
        cms_point_estimates,
        count_min_sketch,
    )

    vals = (
        ["alpha"] * 40 + ["beta"] * 15 + ["gamma"] * 3 + ["delta"] * 1
    )
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    cms = count_min_sketch(df, "v")
    got = {
        r["term"]: r["est_count"]
        for r in cms_point_estimates(
            cms, ["alpha", "beta", "gamma", "delta", "absent"]
        ).collect()
    }
    exact = {"alpha": 40, "beta": 15, "gamma": 3, "delta": 1, "absent": 0}
    for t, n in exact.items():
        assert got[t] >= n  # CMS never underestimates
        # 4 distinct values in 1024 buckets: collisions are essentially
        # impossible, so the estimate is exact here
        assert got[t] <= n + 59  # total mass bound even under collision
    assert got["alpha"] == 40


def test_count_min_sketch_state_is_bounded(spark):
    from search_spark.operators.sketches import (
        CMS_DEPTH,
        CMS_WIDTH,
        count_min_sketch,
    )

    df = spark.createDataFrame(
        [(f"v{i % 500}",) for i in range(5000)], ["v"]
    )
    n = count_min_sketch(df, "v").count()
    assert n <= CMS_DEPTH * CMS_WIDTH


def test_cms_join_size_estimates_and_never_underestimates(spark):
    from search_spark.operators.sketches import cms_join_size

    # skewed fact side: key 0 appears 50x, keys 1..19 appear 3x each
    left = spark.createDataFrame([(k,) for k in range(20)], ["k"])
    right = spark.createDataFrame(
        [(0,) for _ in range(50)] + [(k,) for k in range(1, 20) for _ in range(3)],
        ["k"],
    )
    true_size = 50 + 19 * 3  # dim side is unique per key
    est = cms_join_size(left, right, "k", "k").collect()[0][
        "est_join_rows"
    ]
    assert est >= true_size  # inner products only inflate
    # 20 keys in 1024 buckets: collisions are negligible → exact here
    assert est <= true_size + 60


def test_bloom_prefilter_semi_join_is_exact_and_prunes(spark):
    from search_spark.operators.sketches import bloom_prefilter_semi_join

    big = spark.createDataFrame(
        [(k, f"row{k}") for k in range(2000)], ["k", "payload"]
    )
    small = spark.createDataFrame([(k,) for k in range(0, 2000, 97)], ["k"])
    got = sorted(
        r["k"]
        for r in bloom_prefilter_semi_join(big, small, "k", "k").collect()
    )
    want = sorted(
        r["k"]
        for r in big.join(
            small.withColumnRenamed("k", "k2"),
            big["k"] == F.col("k2"),
            "left_semi",
        ).collect()
    )
    assert got == want  # exactly the plain semi-join
    # the pre-filter alone must prune hard: ≤ a few % false positives
    survivors = bloom_prefilter_semi_join(
        big, small, "k", "k", exact_verify=False
    ).count()
    assert len(want) <= survivors <= len(want) + 50


def test_sketch_containment_detects_subset(spark):
    from search_spark.queries import QUERIES  # noqa: F401  (registry import)
    from search_spark.operators.sketches import sketch_overlap
    from pyspark.sql import functions as SF

    # A is a strict subset of B: containment(A in B) ≈ 1, (B in A) ≈ 0.5
    rows = [("A", f"v{i}") for i in range(500)] + [
        ("B", f"v{i}") for i in range(1000)
    ]
    o = sketch_overlap(spark.createDataFrame(rows, ["grp", "v"]), "grp", "v")
    r = o.select(
        (SF.col("est_overlap") / SF.col("est_a")).alias("a_in_b"),
        (SF.col("est_overlap") / SF.col("est_b")).alias("b_in_a"),
    ).collect()[0]
    assert r["a_in_b"] > 0.6  # near-total containment despite sketch noise
    assert r["b_in_a"] < 0.85
    assert r["a_in_b"] > r["b_in_a"]
