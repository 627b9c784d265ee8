"""Streaming continuous-aggregate maintenance (hypertable rollup).

The batch :func:`~search_spark.operators.temporal.time_rollup` answers
"aggregate the fact table at every granularity now"; a continuously
ingesting pipeline wants the hourly rollup *maintained* as events
arrive, without rescanning history. This wraps the merge step in
``foreachBatch``:

1. aggregate the micro-batch to (event_type, day, hour) partials;
2. read back ONLY the state partitions for the days the batch touched
   (day-partitioned parquet → partition pruning on the read);
3. re-aggregate old ∪ new and overwrite exactly those day partitions
   (dynamic partition overwrite).

Per batch the work is O(batch + touched-days' state), never O(history)
— the incremental-view-maintenance shape a 10^12-row fact table needs.
Coarser granularities (day/total) derive from the hourly state at query
time. Restart safety comes from the streaming checkpoint: a replayed
batch re-merges the same partials into the same day partitions, and the
overwrite makes that idempotent at the partition level.

``Trigger.AvailableNow`` drains the source and stops (deterministic,
batch-equivalent — what the test asserts); the identical code runs
unbounded with a processing-time trigger in production.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def rollup_stream(
    spark: SparkSession,
    events_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    ts: str = "ts",
    group: str = "event_type",
    value: str = "value",
    available_now: bool = True,
) -> list[dict]:
    """Maintain an hourly rollup over a streaming event source.

    Returns one record per non-empty micro-batch:
    ``{"batch_id", "n_rows", "n_days_touched"}``. The hourly state lives
    at ``{state_dir}/hourly`` (day-partitioned parquet; read it back
    with :func:`read_hourly_rollup`).
    """
    hourly_path = os.path.join(state_dir, "hourly")
    commits: list[dict] = []

    def _partials(df: DataFrame) -> DataFrame:
        return (
            df.select(
                F.col(group),
                F.date_trunc("day", F.col(ts)).alias("day"),
                F.date_trunc("hour", F.col(ts)).alias("hour"),
                F.col(value).alias("__v"),
            )
            .groupBy(group, "day", "hour")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("__v").alias("total_value"),
            )
        )

    def _step(batch_df: DataFrame, batch_id: int) -> None:
        new = _partials(batch_df).localCheckpoint(eager=True)
        days = [r["day"] for r in new.select("day").distinct().collect()]
        if not days:
            return
        n_rows = batch_df.count()
        merged = new
        if os.path.isdir(hourly_path):
            # partition-pruned read: only the touched days leave disk
            old = spark.read.option("basePath", hourly_path).parquet(
                hourly_path
            ).filter(F.col("day").isin(days))
            merged = (
                old.select(group, "day", "hour", "n_events", "total_value")
                .unionByName(new)
                .groupBy(group, "day", "hour")
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum("total_value").alias("total_value"),
                )
            )
        # materialize off the read path before overwriting it
        merged = merged.localCheckpoint(eager=True)
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("day")
            .parquet(hourly_path)
        )
        commits.append(
            {
                "batch_id": batch_id,
                "n_rows": n_rows,
                "n_days_touched": len(days),
            }
        )

    writer = events_stream.writeStream.foreachBatch(_step).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        query = writer.trigger(availableNow=True).start()
        query.awaitTermination()
    else:  # pragma: no cover - unbounded production path
        query = writer.start()
    return commits


def read_hourly_rollup(spark: SparkSession, state_dir: str) -> DataFrame:
    """The maintained hourly aggregate: (event_type, day, hour,
    n_events, total_value)."""
    return spark.read.option(
        "basePath", os.path.join(state_dir, "hourly")
    ).parquet(os.path.join(state_dir, "hourly"))
