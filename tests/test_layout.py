"""Z-order layout keys (operators/layout.py).

Ground truth: a pure-Python bit-interleave, plus the locality property
that makes Z-ordering worth doing (per-chunk envelopes bounded on BOTH
dimensions after a Z sort).
"""

import pytest
from pyspark.sql import functions as F

from search_spark.operators.layout import zorder_key, zorder_key_sql


def _python_morton(vals, bits=16):
    """Interleave k values, column 0 most significant per round."""
    k = len(vals)
    out = 0
    for j, v in enumerate(vals):
        for i in range(bits):
            out += ((v >> i) & 1) << (i * k + (k - 1 - j))
    return out


def test_zorder_matches_python_reference(spark):
    import random

    rng = random.Random(11)
    rows = [
        (i, rng.randrange(0, 1 << 16), rng.randrange(0, 1 << 16))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["i", "x", "y"])
    got = {
        r["i"]: r["z"]
        for r in df.select(
            "i", zorder_key([F.col("x"), F.col("y")]).alias("z")
        ).collect()
    }
    for i, x, y in rows:
        assert got[i] == _python_morton([x, y])


def test_zorder_sql_twin_agrees(spark):
    import duckdb

    rows = [(i, i * 37 % 1024, i * 91 % 1024) for i in range(100)]
    df = spark.createDataFrame(rows, ["i", "x", "y"])
    s = {
        r["i"]: r["z"]
        for r in df.select(
            "i", zorder_key([F.col("x"), F.col("y")]).alias("z")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, x INT, y INT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    o = dict(
        con.execute(
            f"SELECT i, {zorder_key_sql(['x', 'y'])} FROM t"
        ).fetchall()
    )
    assert s == o


def test_zorder_three_columns_and_width_guard(spark):
    df = spark.createDataFrame([(1, 2, 3)], ["a", "b", "c"])
    z = df.select(
        zorder_key([F.col("a"), F.col("b"), F.col("c")], bits=4).alias("z")
    ).collect()[0]["z"]
    assert z == _python_morton([1, 2, 3], bits=4)
    with pytest.raises(ValueError, match="int64"):
        zorder_key([F.col("a"), F.col("b"), F.col("c")], bits=32)


def test_zorder_locality_bounds_both_dimensions(spark):
    """After sorting by the Z key, consecutive chunks must have tight
    min/max envelopes on BOTH columns — the file-skipping property. A
    single-column sort keeps the other column's envelope full-range."""
    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, ["x", "y"])
    z = df.select(
        "x", "y", zorder_key([F.col("x"), F.col("y")], bits=6).alias("z")
    )
    chunks = z.select(
        "x", "y", F.shiftright("z", 6).alias("chunk")  # 64 chunks of 64
    )
    env = chunks.groupBy("chunk").agg(
        (F.max("x") - F.min("x")).alias("xr"),
        (F.max("y") - F.min("y")).alias("yr"),
    ).collect()
    # each 64-cell Z block covers an 8×8 tile: both ranges are 7, not 63
    assert all(r["xr"] == 7 and r["yr"] == 7 for r in env)


def test_zorder_query_plan_is_jvm_only(spark):
    from search_spark.queries import QUERIES
    from tests.test_plans import plan_of

    plan = plan_of(QUERIES["zorder_layout"].spark(spark, "/root/testdata/sf0.001"))
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    assert "partial" in plan.lower() or "HashAggregate" in plan
