"""Temporal operators (operators/temporal.py): as-of join, bucketed
range join, multi-granularity rollup.

Ground truth: hand-computed matches plus DuckDB's native ASOF JOIN /
inequality join (exercised by the oracle gate); here the unit semantics
— tie handling, half-open bounds, struct-atomic carried columns, bucket
boundary crossing — and the plan shapes (no nested-loop joins).
"""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from search_spark.operators.temporal import (
    asof_join,
    range_join_bucketed,
    time_rollup,
)


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_basic_and_no_prior(spark):
    left = spark.createDataFrame(
        [
            (1, "u", _ts("2024-01-01 10:00:00")),
            (2, "u", _ts("2024-01-01 12:00:00")),
            (3, "v", _ts("2024-01-01 09:00:00")),  # v has no prior right
        ],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [
            ("u", _ts("2024-01-01 09:30:00"), 5.0),
            ("u", _ts("2024-01-01 11:00:00"), 7.0),
            ("v", _ts("2024-01-01 09:30:00"), 9.0),  # after v's left row
        ],
        ["user_id", "ts", "value"],
    )
    got = {
        r["event_id"]: (r["ts_asof"], r["value_asof"])
        for r in asof_join(left, right, on="user_id").collect()
    }
    assert got[1] == (_ts("2024-01-01 09:30:00"), 5.0)
    assert got[2] == (_ts("2024-01-01 11:00:00"), 7.0)
    assert got[3] == (None, None)


def test_asof_join_exact_tie_right_wins(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01 10:00:00"))], ["event_id", "user_id", "ts"]
    )
    right = spark.createDataFrame(
        [("u", _ts("2024-01-01 10:00:00"), 42.0)], ["user_id", "ts", "value"]
    )
    row = asof_join(left, right, on="user_id").collect()[0]
    # l.ts >= r.ts semantics: the simultaneous right row matches
    assert row["value_asof"] == 42.0


def test_asof_join_carried_columns_stay_atomic(spark):
    """The latest right row carries a NULL in one column; per-column
    last(ignorenulls) would backfill it from the older row — the struct
    carry must keep the whole row atomic (NULL stays NULL)."""
    left = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01 12:00:00"))], ["event_id", "user_id", "ts"]
    )
    right = spark.createDataFrame(
        [
            ("u", _ts("2024-01-01 10:00:00"), 5.0, "old"),
            ("u", _ts("2024-01-01 11:00:00"), None, "new"),
        ],
        "user_id string, ts timestamp, value double, tag string",
    )
    row = asof_join(left, right, on="user_id").collect()[0]
    assert row["tag_asof"] == "new"
    assert row["value_asof"] is None


def test_range_join_half_open_and_bucket_crossing(spark):
    intervals = spark.createDataFrame(
        [
            # crosses an hour-bucket boundary: 10:45 → 11:15
            (1, _ts("2024-01-01 10:45:00"), _ts("2024-01-01 11:15:00")),
        ],
        ["iid", "start_ts", "end_ts"],
    )
    points = spark.createDataFrame(
        [
            (_ts("2024-01-01 10:44:59"),),  # before start → out
            (_ts("2024-01-01 10:45:00"),),  # == start → in (closed)
            (_ts("2024-01-01 11:00:00"),),  # second bucket → in
            (_ts("2024-01-01 11:14:59"),),  # in
            (_ts("2024-01-01 11:15:00"),),  # == end → out (open)
        ],
        ["ev_ts"],
    )
    got = range_join_bucketed(
        points, intervals, "ev_ts", "start_ts", "end_ts", bucket_seconds=3600
    ).collect()
    assert len(got) == 3
    assert all(r["iid"] == 1 for r in got)


def test_range_join_no_duplicate_pairs_across_buckets(spark):
    # wide interval (4 buckets) with one point: exactly one output row
    intervals = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 14:00:00"))],
        ["iid", "start_ts", "end_ts"],
    )
    points = spark.createDataFrame([(_ts("2024-01-01 12:30:00"),)], ["ev_ts"])
    got = range_join_bucketed(
        points, intervals, "ev_ts", "start_ts", "end_ts", bucket_seconds=3600
    ).collect()
    assert len(got) == 1


def test_range_join_max_buckets_raises(spark):
    intervals = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:00"), _ts("2024-03-01 00:00:00"))],
        ["iid", "start_ts", "end_ts"],
    )
    points = spark.createDataFrame([(_ts("2024-01-05 00:00:00"),)], ["ev_ts"])
    with pytest.raises(Exception, match="range_join_bucketed"):
        range_join_bucketed(
            points,
            intervals,
            "ev_ts",
            "start_ts",
            "end_ts",
            bucket_seconds=3600,
            max_buckets=100,
        ).collect()


def test_time_rollup_levels_and_totals(spark):
    events = spark.createDataFrame(
        [
            (0, _ts("2024-01-01 10:10:00"), "click", 1.0),
            (1, _ts("2024-01-01 10:40:00"), "click", 2.0),
            (2, _ts("2024-01-01 11:10:00"), "click", 4.0),
            (3, _ts("2024-01-02 09:00:00"), "click", 8.0),
            (4, _ts("2024-01-01 10:00:00"), "view", 16.0),
        ],
        ["event_id", "ts", "event_type", "value"],
    )
    rows = time_rollup(events).collect()
    by_lvl = {}
    for r in rows:
        by_lvl.setdefault(r["lvl"], []).append(r)
    # lvl 0 = (type, day, hour): click has 3 hour cells, view 1
    assert len(by_lvl[0]) == 4
    # lvl 1 = (type, day): click 2 days, view 1
    assert len(by_lvl[1]) == 3
    # lvl 3 = (type,): 2 types
    assert len(by_lvl[3]) == 2
    total = {r["event_type"]: r["total_value"] for r in by_lvl[3]}
    assert total == {"click": 15.0, "view": 16.0}
    d1 = [
        r
        for r in by_lvl[1]
        if r["event_type"] == "click" and r["day"] == _ts("2024-01-01 00:00:00")
    ][0]
    assert d1["n_events"] == 3 and d1["total_value"] == 7.0


def test_temporal_query_plans_have_no_nested_loop(spark):
    from search_spark.queries import QUERIES
    from tests.test_plans import plan_of

    for name in ["asof_join_events", "range_join_incidents", "time_rollup"]:
        plan = plan_of(QUERIES[name].spark(spark, "/root/testdata/sf0.001"))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan
        assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    # the rollup is one Expand + one aggregation, not one job per level
    plan = plan_of(QUERIES["time_rollup"].spark(spark, "/root/testdata/sf0.001"))
    assert "Expand" in plan


def test_funnel_conversion_stages(spark):
    from search_spark.queries import QUERIES
    import pyspark.sql.functions as SF

    # build a micro events table shaped like the real one and monkey-run
    # the query logic against it via a temp parquet dir
    import tempfile, os
    ev = spark.createDataFrame(
        [
            # u1: signup -> click(+1h) -> purchase(+2h): stage 3
            (0, _ts("2024-01-01 10:00:00"), 1, "signup", 1.0, "{}"),
            (1, _ts("2024-01-01 11:00:00"), 1, "click", 1.0, "{}"),
            (2, _ts("2024-01-01 13:00:00"), 1, "purchase", 1.0, "{}"),
            # u2: signup -> click next day +25h (misses deadline): stage 1
            (3, _ts("2024-01-01 10:00:00"), 2, "signup", 1.0, "{}"),
            (4, _ts("2024-01-02 11:30:00"), 2, "click", 1.0, "{}"),
            # u3: click before signup only: stage 1 (order matters)
            (5, _ts("2024-01-01 09:00:00"), 3, "click", 1.0, "{}"),
            (6, _ts("2024-01-01 10:00:00"), 3, "signup", 1.0, "{}"),
            # u4: no signup at all: stage 0
            (7, _ts("2024-01-01 10:00:00"), 4, "view", 1.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    d = tempfile.mkdtemp()
    ev.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {
        r["stage"]: r["n_users"]
        for r in QUERIES["funnel_conversion"].spark(spark, d).collect()
    }
    assert got == {0: 1, 1: 2, 3: 1}


def test_retention_cohorts_offsets(spark):
    from search_spark.queries import QUERIES
    import tempfile, os

    ev = spark.createDataFrame(
        [
            # u1 first active Jan 1, returns Jan 3
            (0, _ts("2024-01-01 10:00:00"), 1, "view", 1.0, "{}"),
            (1, _ts("2024-01-03 09:00:00"), 1, "view", 1.0, "{}"),
            (2, _ts("2024-01-03 22:00:00"), 1, "click", 1.0, "{}"),
            # u2 first active Jan 1 only
            (3, _ts("2024-01-01 23:00:00"), 2, "view", 1.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    d = tempfile.mkdtemp()
    ev.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {
        (r["cohort_day"], r["day_offset"]): r["n_users"]
        for r in QUERIES["retention_cohorts"].spark(spark, d).collect()
    }
    day1 = _ts("2024-01-01 00:00:00")
    assert got == {(day1, 0): 2, (day1, 2): 1}
