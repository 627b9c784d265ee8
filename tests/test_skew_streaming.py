"""Tests for the skew (salted agg) and Structured Streaming operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from search_spark.operators.skew import salted_count_sum
from search_spark.streaming.windowed import windowed_event_counts

SF_DIR = "/root/testdata/sf0.001"


def test_salted_agg_equals_direct_groupby(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    salted = salted_count_sum(
        ev, ["event_type"], value_col="value", salt_source="event_id"
    )
    direct = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("value").alias("sum_value")
    )
    s = {
        r["event_type"]: (r["n_rows"], round(r["sum_value"], 6))
        for r in salted.collect()
    }
    d = {
        r["event_type"]: (r["n_rows"], round(r["sum_value"], 6))
        for r in direct.collect()
    }
    assert s == d


def test_salted_agg_spreads_hot_key(spark):
    # a single hot key must land in > 1 partial group (that's the point)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_partials = (
        ev.withColumn("_salt", F.pmod(F.xxhash64("event_id"), F.lit(16)))
        .groupBy("event_type", "_salt")
        .count()
        .groupBy("event_type")
        .count()
        .agg(F.min("count"))
        .collect()[0][0]
    )
    assert n_partials > 1


def test_streaming_window_counts_equals_batch(spark):
    path = f"{SF_DIR}/events.parquet"
    streamed = windowed_event_counts(spark, path)
    batch = (
        spark.read.parquet(path)
        .groupBy(
            F.date_trunc("day", F.col("ts").cast("timestamp")).alias("w_start"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_streaming_state_partitions_knob(spark):
    # sizing the state store (not the scan) must not change results, and
    # the session conf must be restored afterwards
    path = f"{SF_DIR}/events.parquet"
    before = spark.conf.get("spark.sql.shuffle.partitions")
    # collect eagerly: both runs share the memory-sink table name, so the
    # first result must be materialized before the second query replaces it
    wide_rows = sorted(map(tuple, windowed_event_counts(spark, path).collect()))
    narrow_rows = sorted(
        map(
            tuple,
            windowed_event_counts(
                spark, path, state_partitions=4
            ).collect(),
        )
    )
    assert wide_rows == narrow_rows
    assert len(narrow_rows) > 0
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
