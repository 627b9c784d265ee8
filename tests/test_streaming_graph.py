"""Streaming PageRank maintenance: the rank vector after draining a
2-file edge stream must equal the batch incremental_pagerank over the
same batches in the same order (warm-start semantics end-to-end)."""

from __future__ import annotations

import os

import pytest

from search_spark.operators.graph import incremental_pagerank
from search_spark.streaming.graph import pagerank_stream, read_ranks

BATCH_1 = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "d"),
    ("d", "e"), ("e", "a"), ("b", "h"),
]
BATCH_2 = [
    ("h", "i"), ("i", "j"), ("j", "a"), ("b", "i"), ("e", "f"),
]


def _write_batch(spark, pairs, path, mtime):
    df = spark.createDataFrame(pairs, ["src", "dst"])
    df.coalesce(1).write.parquet(path)
    # FileStreamSource orders new files by modification time: pin the
    # mtimes so batch 1 is always discovered before batch 2
    for root, _, files in os.walk(path):
        for f in files:
            os.utime(os.path.join(root, f), (mtime, mtime))


def test_pagerank_stream_matches_batch_incremental(spark, tmp_path):
    src_dir = str(tmp_path / "edges_src")
    os.makedirs(src_dir)
    _write_batch(spark, BATCH_1, f"{src_dir}/part=0", 1_000_000_000)
    _write_batch(spark, BATCH_2, f"{src_dir}/part=1", 1_000_000_100)

    stream = (
        spark.readStream.schema("src string, dst string")
        .option("maxFilesPerTrigger", "1")
        .option("basePath", src_dir)
        .parquet(f"{src_dir}/part=*")
    )
    state_dir = str(tmp_path / "state")
    commits = pagerank_stream(
        spark,
        stream,
        state_dir=state_dir,
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_iter_per_batch=3,
    )
    assert [c["batch_id"] for c in commits] == [0, 1]
    assert commits[0]["n_edge_rows"] == len(BATCH_1)
    assert commits[1]["n_edge_rows"] == len(BATCH_2)

    got = {
        r["entity"]: r["rank"]
        for r in read_ranks(spark, state_dir).collect()
    }
    want = {
        r["entity"]: r["rank"]
        for r in incremental_pagerank(
            [
                spark.createDataFrame(BATCH_1, ["src", "dst"]),
                spark.createDataFrame(BATCH_2, ["src", "dst"]),
            ],
            n_iter_per_batch=3,
        ).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_stream_restart_is_idempotent(spark, tmp_path):
    """Re-running with the same checkpoint after the source is drained
    must process nothing and leave the rank vector unchanged."""
    src_dir = str(tmp_path / "edges_src")
    os.makedirs(src_dir)
    _write_batch(spark, BATCH_1, f"{src_dir}/part=0", 1_000_000_000)

    def _stream():
        return (
            spark.readStream.schema("src string, dst string")
            .option("maxFilesPerTrigger", "1")
            .option("basePath", src_dir)
            .parquet(f"{src_dir}/part=*")
        )

    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    first = pagerank_stream(
        spark, _stream(), state_dir=state_dir, checkpoint_dir=ckpt
    )
    assert len(first) == 1
    before = {
        r["entity"]: r["rank"]
        for r in read_ranks(spark, state_dir).collect()
    }
    second = pagerank_stream(
        spark, _stream(), state_dir=state_dir, checkpoint_dir=ckpt
    )
    assert second == []
    after = {
        r["entity"]: r["rank"]
        for r in read_ranks(spark, state_dir).collect()
    }
    assert after == before
