"""Two-phase parallel scan (global cumsum) and sequence packing.

The invariant under test: the distributed prefix sum is bit-identical to
a sequential scan regardless of partitioning, and the packing columns
derive from it exactly.
"""

import random

import pytest
from pyspark.sql import functions as F

from search_spark.operators.packing import global_cumsum, pack_sequences


def test_global_cumsum_matches_sequential(spark):
    rng = random.Random(7)
    rows = [(i, rng.randint(0, 500)) for i in range(1000)]
    rng.shuffle(rows)  # input order ≠ key order
    df = spark.createDataFrame(rows, ["k", "v"]).repartition(13)
    got = {
        r["k"]: r["cumsum"]
        for r in global_cumsum(df, "k", "v", num_partitions=7).collect()
    }
    run = 0
    for k, v in sorted(rows):
        run += v
        assert got[k] == run
    assert len(got) == 1000


def test_global_cumsum_single_partition_edge(spark):
    df = spark.createDataFrame([(1, 10), (2, 20)], ["k", "v"])
    got = {r["k"]: r["cumsum"] for r in global_cumsum(df, "k", "v", num_partitions=1).collect()}
    assert got == {1: 10, 2: 30}


def test_pack_sequences_spanning(spark):
    # capacity 100: doc lengths 60, 60, 100, 30 at keys 1..4
    # starts: 0, 60, 120, 220
    df = spark.createDataFrame(
        [(1, 60), (2, 60), (3, 100), (4, 30)], ["doc_id", "n_tok"]
    )
    out = {
        r["doc_id"]: (r["window_id"], r["offset"], r["n_windows"])
        for r in pack_sequences(df, "doc_id", "n_tok", capacity=100).collect()
    }
    assert out[1] == (0, 0, 1)      # fills [0, 60)
    assert out[2] == (0, 60, 2)     # spans [60, 120) — crosses into window 1
    assert out[3] == (1, 20, 2)     # spans [120, 220)
    assert out[4] == (2, 20, 1)     # fits in window 2


def test_global_cumsum_empty_input_keeps_sum_dtype(spark):
    df = spark.createDataFrame([], "k long, v long").filter("k > 0")
    out = global_cumsum(df, "k", "v")
    assert out.count() == 0
    # NULL-typed as SUM(v) would be: long, matching the non-empty path
    assert dict(out.dtypes)["cumsum"] == "bigint"
