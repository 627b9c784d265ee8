"""Streaming hourly-rollup maintenance: after draining a 2-file event
stream, the merged read-back must equal the batch aggregation over the
union — including the cross-batch merge of an hour both batches touch.
Replaying a committed batch (same state, fresh checkpoint) must leave
totals unchanged: the batch-keyed partials make the overwrite
idempotent. Compaction folds partials without changing the answer."""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import functions as F

from search_spark.streaming.rollup import (
    compact_rollup,
    read_hourly_rollup,
    rollup_stream,
)


def _ts(s):
    return datetime.fromisoformat(s)


BATCH_1 = [
    (0, _ts("2024-01-01 10:10:00"), "click", 1.0),
    (1, _ts("2024-01-01 10:40:00"), "click", 2.0),
    (2, _ts("2024-01-01 11:10:00"), "view", 4.0),
]
BATCH_2 = [
    # same (click, Jan-1 10:00) hour as batch 1 → must merge, not append
    (3, _ts("2024-01-01 10:55:00"), "click", 8.0),
    # a new day
    (4, _ts("2024-01-02 09:00:00"), "view", 16.0),
]

SCHEMA = "event_id long, ts timestamp, event_type string, value double"


def _write_batch(spark, rows, path, mtime):
    df = spark.createDataFrame(rows, SCHEMA)
    df.coalesce(1).write.parquet(path)
    for root, _, files in os.walk(path):
        for f in files:
            os.utime(os.path.join(root, f), (mtime, mtime))


def _drain(spark, src_dir, state_dir, ckpt_dir):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("basePath", src_dir)
        .parquet(f"{src_dir}/part=*")
    )
    return rollup_stream(
        spark, stream, state_dir=state_dir, checkpoint_dir=ckpt_dir
    )


def _rollup_dict(spark, state_dir):
    return {
        (r["event_type"], r["day"], r["hour"]): (
            r["n_events"],
            r["total_value"],
        )
        for r in read_hourly_rollup(spark, state_dir).collect()
    }


def _expected(spark):
    df = (
        spark.createDataFrame(BATCH_1 + BATCH_2, SCHEMA)
        .groupBy(
            "event_type",
            F.date_trunc("day", "ts").alias("day"),
            F.date_trunc("hour", "ts").alias("hour"),
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
    )
    return {
        (r["event_type"], r["day"], r["hour"]): (r["n"], r["v"])
        for r in df.collect()
    }


def test_rollup_stream_matches_batch_aggregate(spark, tmp_path):
    src_dir = str(tmp_path / "events_src")
    os.makedirs(src_dir)
    _write_batch(spark, BATCH_1, f"{src_dir}/part=0", 1_000_000_000)
    _write_batch(spark, BATCH_2, f"{src_dir}/part=1", 1_000_000_100)
    state_dir = str(tmp_path / "state")

    commits = _drain(spark, src_dir, state_dir, str(tmp_path / "ckpt"))
    assert [c["batch_id"] for c in commits] == [0, 1]
    assert commits[0]["n_rows"] == 3 and commits[1]["n_rows"] == 2
    assert commits[1]["n_hours_touched"] == 2

    got = _rollup_dict(spark, state_dir)
    assert got == _expected(spark)
    # the cross-batch hour really merged: 3 clicks totalling 11.0
    assert got[("click", _ts("2024-01-01 00:00:00"),
                _ts("2024-01-01 10:00:00"))] == (3, 11.0)


def test_rollup_stream_replay_is_idempotent(spark, tmp_path):
    """A replayed batch must not double-count: draining the same source
    again with a FRESH checkpoint (the worst case — every batch
    replays) rewrites the same batch partitions with the same partials,
    leaving the merged rollup unchanged."""
    src_dir = str(tmp_path / "events_src")
    os.makedirs(src_dir)
    _write_batch(spark, BATCH_1, f"{src_dir}/part=0", 1_000_000_000)
    _write_batch(spark, BATCH_2, f"{src_dir}/part=1", 1_000_000_100)
    state_dir = str(tmp_path / "state")

    _drain(spark, src_dir, state_dir, str(tmp_path / "ckpt1"))
    before = _rollup_dict(spark, state_dir)
    _drain(spark, src_dir, state_dir, str(tmp_path / "ckpt2"))
    assert _rollup_dict(spark, state_dir) == before == _expected(spark)


def test_rollup_stream_redrain_same_checkpoint_is_noop(spark, tmp_path):
    src_dir = str(tmp_path / "events_src")
    os.makedirs(src_dir)
    _write_batch(spark, BATCH_1, f"{src_dir}/part=0", 1_000_000_000)
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    assert len(_drain(spark, src_dir, state_dir, ckpt)) == 1
    before = _rollup_dict(spark, state_dir)
    assert _drain(spark, src_dir, state_dir, ckpt) == []
    assert _rollup_dict(spark, state_dir) == before


def test_rollup_compaction_preserves_answer(spark, tmp_path):
    src_dir = str(tmp_path / "events_src")
    os.makedirs(src_dir)
    _write_batch(spark, BATCH_1, f"{src_dir}/part=0", 1_000_000_000)
    _write_batch(spark, BATCH_2, f"{src_dir}/part=1", 1_000_000_100)
    state_dir = str(tmp_path / "state")
    _drain(spark, src_dir, state_dir, str(tmp_path / "ckpt"))

    before = _rollup_dict(spark, state_dir)
    n = compact_rollup(spark, state_dir)
    assert n == len(before)
    assert _rollup_dict(spark, state_dir) == before
    # exactly one batch partition remains
    parts = os.listdir(os.path.join(state_dir, "partials"))
    assert [p for p in parts if p.startswith("batch_id=")] == ["batch_id=0"]
