"""Checkpoint-strategy knob: identical results under local vs reliable.

VERDICT r4 item 1: the iterative family's per-round lineage truncation
must be switchable from ``localCheckpoint`` (executor-memory blocks, not
fault-tolerant) to a reliable file checkpoint (disk-backed, survives
executor loss) by one session conf — and the two strategies must be
result-identical on every loop family (pagerank / CC / kcore / LPA /
forward chaining / SPARQL path repetition).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from search_spark import checkpoints
from search_spark.operators.canonicalize import (
    connected_components,
    sameas_rewrite,
)
from search_spark.operators.graph import (
    bfs_distances,
    kcore_peel,
    label_propagation,
    pagerank,
    personalized_pagerank,
)
from search_spark.operators.paths import Pred, Repeat, Seq, eval_path


def _edges(spark, n=400, seed=5):
    # deterministic skewed digraph: heavy head node + random tail
    rows = []
    x = seed
    for i in range(n):
        x = (1103515245 * x + 12345) % (1 << 31)
        u = x % 97
        x = (1103515245 * x + 12345) % (1 << 31)
        v = x % 97
        if u != v:
            rows.append((f"n{u}", f"n{v}"))
        rows.append(("hub", f"n{i % 61}"))
    return spark.createDataFrame(rows, "src string, dst string")


def _rows(df, cols=None):
    cols = cols or df.columns
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _approx_eq(a, b, tol=1e-9):
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra[0] == rb[0]
        assert abs(ra[1] - rb[1]) <= tol, (ra, rb)


@pytest.fixture()
def reliable(spark):
    spark.conf.set(checkpoints.STRATEGY_KEY, "reliable")
    yield spark
    spark.conf.set(checkpoints.STRATEGY_KEY, "local")


def test_strategy_conf_roundtrip(spark):
    assert checkpoints.strategy(spark) == "local"
    spark.conf.set(checkpoints.STRATEGY_KEY, "reliable")
    try:
        assert checkpoints.strategy(spark) == "reliable"
    finally:
        spark.conf.set(checkpoints.STRATEGY_KEY, "local")
    spark.conf.set(checkpoints.STRATEGY_KEY, "bogus")
    try:
        with pytest.raises(ValueError):
            checkpoints.strategy(spark)
    finally:
        spark.conf.set(checkpoints.STRATEGY_KEY, "local")


def test_reliable_truncate_writes_files(spark):
    df = spark.range(100).withColumn("k", F.col("id") % 5)
    out = checkpoints.truncate(df, eager=True, strategy="reliable")
    assert out.count() == 100
    d = spark.sparkContext._jsc.sc().getCheckpointDir().get()
    local = d.removeprefix("file:")
    n_files = sum(len(fs) for _, _, fs in os.walk(local))
    assert n_files > 0  # round state actually left the JVM heap


def test_pagerank_identical(spark, reliable):
    e = _edges(spark)
    # run reliable first (fixture active), then flip back for local
    r_rel = _rows(pagerank(e, n_iter=4, local_threshold=0))
    spark.conf.set(checkpoints.STRATEGY_KEY, "local")
    r_loc = _rows(pagerank(e, n_iter=4, local_threshold=0))
    _approx_eq(r_rel, r_loc)


def test_ppr_identical(spark, reliable):
    e = _edges(spark)
    seeds = spark.createDataFrame([("hub",), ("n3",)], "entity string")
    r_rel = _rows(
        personalized_pagerank(e, seeds, n_iter=4, local_threshold=0)
    )
    spark.conf.set(checkpoints.STRATEGY_KEY, "local")
    r_loc = _rows(
        personalized_pagerank(e, seeds, n_iter=4, local_threshold=0)
    )
    _approx_eq(r_rel, r_loc)


def test_connected_components_identical(spark, reliable):
    e = _edges(spark, n=200)
    r_rel = _rows(connected_components(e, local_threshold=0))
    spark.conf.set(checkpoints.STRATEGY_KEY, "local")
    r_loc = _rows(connected_components(e, local_threshold=0))
    assert r_rel == r_loc


def test_kcore_lpa_bfs_identical(spark, reliable):
    e = _edges(spark, n=250)
    bfs_seeds = spark.createDataFrame([("hub",)], "entity string")
    rel = (
        _rows(kcore_peel(e, k=2, n_rounds=3)),
        _rows(label_propagation(e, n_iter=3, local_threshold=0)),
        _rows(bfs_distances(e, bfs_seeds, max_hops=3)),
    )
    spark.conf.set(checkpoints.STRATEGY_KEY, "local")
    loc = (
        _rows(kcore_peel(e, k=2, n_rounds=3)),
        _rows(label_propagation(e, n_iter=3, local_threshold=0)),
        _rows(bfs_distances(e, bfs_seeds, max_hops=3)),
    )
    assert rel == loc


def test_path_repeat_identical(spark, reliable):
    triples = _edges(spark, n=150).select(
        F.col("src").alias("subj"),
        F.lit("p").alias("pred"),
        F.col("dst").alias("obj"),
    )
    seeds = spark.createDataFrame([("hub",), ("n1",)], "src string")
    path = Seq(Repeat(Pred("p"), 3), Pred("p"))
    r_rel = _rows(eval_path(triples, path, seeds))
    spark.conf.set(checkpoints.STRATEGY_KEY, "local")
    r_loc = _rows(eval_path(triples, path, seeds))
    assert r_rel == r_loc


def test_sameas_rewrite_identical(spark, reliable):
    triples = _edges(spark, n=120).select(
        F.col("src").alias("subj"),
        F.lit("linked_to").alias("pred"),
        F.col("dst").alias("obj"),
        F.lit("d0").alias("prov"),
    )
    pairs = spark.createDataFrame(
        [("n1", "n2"), ("n2", "n3"), ("n10", "n11")], "a string, b string"
    )
    r_rel = _rows(sameas_rewrite(triples, pairs, local_threshold=0))
    spark.conf.set(checkpoints.STRATEGY_KEY, "local")
    r_loc = _rows(sameas_rewrite(triples, pairs, local_threshold=0))
    assert r_rel == r_loc
