"""Temporal join and rollup operators.

Spark's built-in join strategies cover equi-joins; the two temporal joins
every event pipeline eventually needs — *as-of* (latest right row at or
before each left row) and *interval containment* — would naively plan as
BroadcastNestedLoopJoin/CartesianProduct and die at scale. Both are
re-expressed here as shuffle-friendly compositions:

* :func:`asof_join` — the union-sort-window formulation: tag both sides,
  union, one window pass per key carrying the latest right-side struct
  forward. Exactly one shuffle (hash-partition on the key), sort within
  partitions, zero Python. This is the standard distributed as-of shape
  (kdb's ``aj``, DuckDB's ``ASOF JOIN``, pandas ``merge_asof`` — the
  oracle uses DuckDB's native operator as ground truth).
* :func:`range_join_bucketed` — interval⋈point containment turned into an
  equi-join by time bucketing: each interval explodes into the buckets it
  covers, each point maps to its single bucket, the join runs on the
  bucket key, and an exact containment filter + distinct removes bucket
  duplicates. Bucket width trades fan-out for selectivity; intervals
  bounded by ``max_buckets`` fail loudly rather than exploding.
* :func:`time_rollup` — the hypertable-style continuous aggregate: one
  scan, one Expand, one aggregation produces every requested granularity
  (hour/day/total) via ``GROUPING SETS`` instead of one pass per level.

At 10^12-row scale: the as-of state per key is one struct (vocabulary-
sized windows never materialize), the range join's shuffle volume is
|points| + Σ interval-spans (tunable by bucket), and the rollup reads the
fact table once for all granularities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: attach the latest ``right`` row with
    ``right_ts <= left_ts`` per ``on`` key; NULLs when none precedes.

    Every non-key, non-timestamp right column is carried as one struct so
    all carried values always come from the *same* right row (per-column
    ``last(ignorenulls)`` could otherwise mix rows); the struct unpacks
    to ``<col><suffix>`` columns plus ``<right_ts><suffix>``. Right
    timestamps should be unique per key (the usual as-of contract); at
    an exact tie the right row wins (``l.ts >= r.ts`` semantics, same as
    DuckDB's ASOF JOIN).

    Plan: union of the tagged sides → one hash shuffle on the key → an
    in-partition sort by (ts, side) → running ``last`` over the window —
    no nested-loop join, no per-row Python.
    """
    carried = [c for c in right.columns if c not in (on, right_ts)]
    r_struct = F.struct(
        F.col(right_ts).alias(right_ts + suffix),
        *[F.col(c).alias(c + suffix) for c in carried],
    )
    r2 = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__is_r"),
        r_struct.alias("__carry"),
    )
    l2 = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__is_r"),
        F.lit(None).cast(r2.schema["__carry"].dataType).alias("__carry"),
    )
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col("__is_r").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = l2.unionByName(r2, allowMissingColumns=True).withColumn(
        "__m", F.last("__carry", ignorenulls=True).over(w)
    )
    out_cols = [c for c in left.columns] + [
        F.col(f"__m.{right_ts}{suffix}").alias(right_ts + suffix)
    ] + [F.col(f"__m.{c}{suffix}").alias(c + suffix) for c in carried]
    return matched.filter(F.col("__is_r") == 0).select(*out_cols)


def _time_bucket(col, bucket_seconds: int):
    """Floor a timestamp to its bucket start (epoch-aligned)."""
    return F.timestamp_seconds(
        F.floor(F.unix_timestamp(col) / bucket_seconds).cast("bigint")
        * bucket_seconds
    )


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_seconds: int = 3600,
    max_buckets: int = 10_000,
) -> DataFrame:
    """Containment join: every (interval, point) pair with
    ``start_ts <= point_ts < end_ts`` (half-open), as an equi-join.

    Intervals explode into the epoch-aligned time buckets they overlap,
    points map to their single bucket, the join runs on the bucket key,
    and the exact predicate filters afterwards — each surviving pair
    meets in exactly one bucket (the point's own), so no distinct is
    needed. Intervals spanning more than ``max_buckets`` buckets raise
    (``raise_error`` executor-side) rather than silently fanning out.

    Plan shape at scale: shuffle volume is |points| + Σ per-interval
    bucket spans, hash-partitioned on the bucket key — never a
    nested-loop. Pick ``bucket_seconds`` near the typical interval
    length so the fan-out per interval stays O(1).
    """
    buckets = F.sequence(
        _time_bucket(F.col(start_ts), bucket_seconds),
        # half-open end: the bucket containing end_ts - 1µs
        _time_bucket(
            F.col(end_ts) - F.expr("INTERVAL 1 microsecond"), bucket_seconds
        ),
        F.expr(f"INTERVAL {bucket_seconds} SECOND"),
    )
    guarded = F.when(
        F.size(buckets) > max_buckets,
        F.raise_error(
            F.lit(
                f"range_join_bucketed: interval spans > {max_buckets} "
                f"buckets of {bucket_seconds}s; widen bucket_seconds"
            )
        ).cast("array<timestamp>"),
    ).otherwise(buckets)
    ivals = intervals.filter(F.col(start_ts) < F.col(end_ts)).withColumn(
        "__bucket", F.explode(guarded)
    )
    pts = points.withColumn(
        "__bucket", _time_bucket(F.col(point_ts), bucket_seconds)
    )
    joined = ivals.join(pts, on="__bucket").filter(
        (F.col(point_ts) >= F.col(start_ts))
        & (F.col(point_ts) < F.col(end_ts))
    )
    return joined.drop("__bucket")


def time_rollup(
    events: DataFrame,
    ts: str = "ts",
    group: str = "event_type",
    value: str = "value",
) -> DataFrame:
    """Multi-granularity continuous aggregate in one pass.

    Emits (group, day, hour) / (group, day) / (group) aggregate rows via
    ``GROUPING SETS`` — one scan + one Expand + one aggregation instead
    of three jobs; ``lvl`` (GROUPING_ID) disambiguates the levels.
    """
    df = events.select(
        F.col(group),
        F.date_trunc("day", F.col(ts)).alias("day"),
        F.date_trunc("hour", F.col(ts)).alias("hour"),
        F.col(value).alias("__v"),
    )
    df.createOrReplaceTempView("__rollup_in")
    return events.sparkSession.sql(
        f"""
        SELECT {group}, day, hour,
               CAST(GROUPING({group}) * 4 + GROUPING(day) * 2
                    + GROUPING(hour) AS BIGINT) AS lvl,
               COUNT(*) AS n_events,
               ROUND(SUM(__v), 6) AS total_value
        FROM __rollup_in
        GROUP BY GROUPING SETS (({group}, day, hour), ({group}, day),
                                ({group}))
        """
    )
