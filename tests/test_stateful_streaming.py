"""applyInPandasWithState sessionization: streamed sessions must agree
with batch-computed sessions."""

from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from search_spark.streaming.stateful import sessionize_stream

SF_DIR = "/root/testdata/sf0.001"
GAP = 3600


def _batch_sessions(df):
    w = Window.partitionBy("user_id").orderBy("ts")
    with_prev = df.withColumn("prev_ts", F.lag("ts").over(w))
    new_sess = (
        F.col("prev_ts").isNull()
        | (F.col("ts").cast("long") - F.col("prev_ts").cast("long") > GAP)
    ).cast("long")
    sess = df.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "sid", F.sum(new_sess).over(w)
    )
    return (
        sess.groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("sid")
    )


def test_stateful_sessionization_matches_batch(spark, tmp_path):
    events = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    )
    # split into 4 event-time-ordered files so AvailableNow processes
    # multiple micro-batches and the watermark advances between them
    src_dir = str(tmp_path / "stream_src")
    os.makedirs(src_dir)
    bounds = events.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).collect()[0]
    lo, hi = bounds["lo"], bounds["hi"]
    span = (hi - lo) / 4
    for i in range(4):
        a = lo + i * span
        b = hi if i == 3 else lo + (i + 1) * span
        cond = (F.col("ts") >= a) & (
            (F.col("ts") <= b) if i == 3 else (F.col("ts") < b)
        )
        events.filter(cond).coalesce(1).write.parquet(f"{src_dir}/part={i}")

    schema = events.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("basePath", src_dir)
        .parquet(f"{src_dir}/part=*")
    )
    out = sessionize_stream(stream, gap_seconds=GAP)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.table("sessions_test").collect()
    }
    want = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in _batch_sessions(events).collect()
    }
    # every emitted session must be a real batch session (exact rows) —
    # sessions still open at end-of-stream are legitimately unemitted
    assert got, "no sessions were emitted"
    assert got <= want, f"spurious sessions: {sorted(got - want)[:5]}"
    # the watermark crossed ¾ of the stream → the bulk must have emitted
    assert len(got) >= len(want) * 0.5, (len(got), len(want))
