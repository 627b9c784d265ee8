"""Structured Streaming operators over the events stream.

The reference is batch-only (SURVEY.md §2.11) — its incrementality is
Luigi task-completeness plus delete-then-repopulate. The Spark-native
incremental path is Structured Streaming: the same bounded pipeline runs as
``readStream → window agg → writeStream`` with ``Trigger.AvailableNow``,
which processes everything currently in the source and stops — giving
batch-identical, deterministic results (what the oracle checks) while the
identical code keeps running incrementally on an unbounded source in
production.

Watermarking bounds state for the unbounded case: events later than the
watermark delay below their window close are dropped instead of growing
state forever. With AvailableNow over a bounded source nothing is dropped,
so the result equals the batch GROUP BY.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(
    spark: SparkSession,
    events_path: str,
    window_length: str = "1 day",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Tumbling-window event counts per type, computed via a real
    streaming query (file source → memory sink, AvailableNow).

    Returns a bounded DataFrame ``(w_start, event_type, n)`` equal to the
    batch ``GROUP BY date_trunc(window), event_type``.
    """
    schema = spark.read.parquet(events_path).schema
    name = "win_counts_" + hashlib.md5(
        f"{events_path}:{window_length}".encode()
    ).hexdigest()[:10]

    # a previous run of the same query in this session holds the sink name
    for q in spark.streams.active:
        if q.name == name:
            q.stop()

    # the file-stream source wants a directory; point it at the parent and
    # glob-filter down to the one table file
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", os.path.basename(events_path))
        .parquet(os.path.dirname(events_path) or ".")
    )
    # event-time ops require TIMESTAMP (parquet yields TIMESTAMP_NTZ);
    # session TZ is pinned to UTC so the cast is value-preserving
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window_length).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    query = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name).select(
        F.col("w.start").alias("w_start"), "event_type", "n"
    )
