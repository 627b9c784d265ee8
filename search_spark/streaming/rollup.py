"""Streaming continuous-aggregate maintenance (hypertable rollup).

The batch :func:`~search_spark.operators.temporal.time_rollup` answers
"aggregate the fact table at every granularity now"; a continuously
ingesting pipeline wants the hourly rollup *maintained* as events
arrive, without rescanning history. This wraps the upkeep in
``foreachBatch``:

1. aggregate the micro-batch to (event_type, day, hour) partials;
2. overwrite exactly the ``batch_id=<id>`` partition of a
   batch-partitioned partials table with them.

Keying the state by **batch id** is what makes restarts safe: if a
batch commits its files but crashes before the streaming checkpoint
records it, the replay rewrites the *same partition* with the *same
partials* — idempotent by construction. (A read-merge-overwrite of
running SUMs would double-count on exactly that crash window; MIN-style
sketch state tolerates it, SUM state does not.) The queryable rollup is
merge-on-read — :func:`read_hourly_rollup` sums the per-batch partials,
whose total size is O(active hours × batches), already aggregated down
from raw events; compact with :func:`compact_rollup` when the batch
count grows.

Per batch the work is O(batch) — never a history rescan.
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
    ``{"batch_id", "n_rows", "n_hours_touched"}``. State lives at
    ``{state_dir}/partials`` (batch_id-partitioned parquet); read the
    merged rollup with :func:`read_hourly_rollup`.
    """
    partials_path = os.path.join(state_dir, "partials")
    commits: list[dict] = []

    def _step(batch_df: DataFrame, batch_id: int) -> None:
        new = (
            batch_df.select(
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
            .localCheckpoint(eager=True)
        )
        n_hours = new.count()
        if n_hours == 0:
            return
        n_rows = batch_df.count()
        (
            new.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(partials_path)
        )
        commits.append(
            {
                "batch_id": batch_id,
                "n_rows": n_rows,
                "n_hours_touched": n_hours,
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
    """The merged hourly aggregate: (event_type, day, hour, n_events,
    total_value) — a sum over the per-batch partials (merge-on-read)."""
    partials = spark.read.option(
        "basePath", os.path.join(state_dir, "partials")
    ).parquet(os.path.join(state_dir, "partials"))
    group = [c for c in partials.columns
             if c not in ("n_events", "total_value", "batch_id")]
    return partials.groupBy(*group).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("total_value").alias("total_value"),
    )


def compact_rollup(spark: SparkSession, state_dir: str) -> int:
    """Fold all per-batch partials into a single ``batch_id=0``
    partition (bounds the merge-on-read fan-in between maintenance
    windows). Returns the number of rows after compaction. Run it only
    after a CLEAN stop (e.g. an ``availableNow`` drain that terminated):
    folding a batch whose checkpoint commit never landed would
    double-count when the engine replays it into a fresh partition."""
    partials_path = os.path.join(state_dir, "partials")
    merged = read_hourly_rollup(spark, state_dir).localCheckpoint(
        eager=True
    )
    n = merged.count()
    import shutil

    # write-aside then swap: deleting the live partials before the
    # compacted write lands would lose ALL state on a crash in between;
    # with the aside write the crash window shrinks to two renames
    tmp = partials_path + ".compact-tmp"
    trash = partials_path + ".old"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(trash, ignore_errors=True)
    (
        merged.withColumn("batch_id", F.lit(0))
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .parquet(tmp)
    )
    os.rename(partials_path, trash)
    os.rename(tmp, partials_path)
    shutil.rmtree(trash, ignore_errors=True)
    return n
