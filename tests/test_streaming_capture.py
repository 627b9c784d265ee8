"""Streaming keep-latest-capture maintenance: after draining a 2-file
capture stream, the read-back winners must equal the batch keep-latest
over the concatenated input, and a re-drain with the same checkpoint is
a no-op."""

from __future__ import annotations

import os

from search_spark.streaming.capture import (
    latest_capture_stream,
    read_latest_captures,
)

# url A recrawled in both batches (batch-2 capture is newer); url B only
# in batch 1; url C twice within batch 2 sharing an epoch (doc-id
# tie-break must pick the larger)
BATCH_1 = [
    ("example.org/a", 10, 1000),
    ("example.org/a", 11, 1005),
    ("example.org/b", 20, 2000),
]
BATCH_2 = [
    ("example.org/a", 12, 1010),
    ("example.org/c", 30, 3000),
    ("example.org/c", 31, 3000),
]

SCHEMA = "canonical_url string, doc_id long, ts_epoch long"


def _write_batch(spark, rows, path, mtime):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(path)
    for root, _, files in os.walk(path):
        for f in files:
            os.utime(os.path.join(root, f), (mtime, mtime))


def _drain(spark, src_dir, state_dir, ckpt):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("basePath", src_dir)
        .parquet(f"{src_dir}/part=*")
    )
    return latest_capture_stream(spark, stream, state_dir, ckpt)


def test_streamed_latest_capture_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_batch(spark, BATCH_1, f"{src}/part=0", 1_000_000_000)
    _write_batch(spark, BATCH_2, f"{src}/part=1", 1_000_000_100)
    state = str(tmp_path / "state")

    commits = _drain(spark, src, state, str(tmp_path / "ckpt"))
    assert [c["batch_id"] for c in commits] == [0, 1]
    assert commits[1]["n_urls"] == 3

    got = {
        r["canonical_url"]: (
            r["n_captures"], r["latest_epoch"], r["keep_doc_id"],
        )
        for r in read_latest_captures(spark, state).collect()
    }
    assert got == {
        "example.org/a": (3, 1010, 12),  # cross-batch: batch-2 wins
        "example.org/b": (1, 2000, 20),
        "example.org/c": (2, 3000, 31),  # epoch tie -> larger doc_id
    }


def test_streamed_latest_capture_redrain_is_noop(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_batch(spark, BATCH_1, f"{src}/part=0", 1_000_000_000)
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    first = _drain(spark, src, state, ckpt)
    assert len(first) == 1
    before = sorted(
        map(tuple, read_latest_captures(spark, state).collect())
    )
    again = _drain(spark, src, state, ckpt)
    assert again == []
    after = sorted(
        map(tuple, read_latest_captures(spark, state).collect())
    )
    assert after == before
