"""Incremental streaming ingest: the same pipeline, batch-equivalent per
AvailableNow drain, resumable across invocations and new file arrivals."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_spark import datagen
from search_spark.io.snapshots import SnapshotTable
from search_spark.pipeline import PipelineConfig, build_triples
from search_spark.streaming.ingest import ingest_stream

TRIPLE_COLS = ["subj", "pred", "obj", "prov"]


def _triple_multiset(df):
    out: dict[tuple, int] = {}
    for r in df.select(*TRIPLE_COLS).collect():
        out[tuple(r)] = out.get(tuple(r), 0) + 1
    return out


def test_streaming_ingest_matches_batch_and_resumes(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out_root = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    first = datagen.generate_web_pages(spark, 15, seed=31, partitions=2)
    first.write.parquet(pages_dir)

    commits = ingest_stream(spark, pages_dir, out_root, ckpt)
    assert sum(c["n_docs"] for c in commits) == 15
    got = _triple_multiset(SnapshotTable(spark, out_root).load())
    expected = _triple_multiset(build_triples(spark, first, PipelineConfig()))
    assert got == expected

    # drained source → a second invocation commits nothing
    assert ingest_stream(spark, pages_dir, out_root, ckpt) == []

    # new files arriving → only the delta is processed
    more = datagen.generate_web_pages(spark, 25, seed=31, partitions=2)
    delta = more.join(first.select("url"), on="url", how="left_anti")
    delta.write.mode("append").parquet(pages_dir)
    commits2 = ingest_stream(spark, pages_dir, out_root, ckpt)
    assert sum(c["n_docs"] for c in commits2) == 10
    got2 = _triple_multiset(SnapshotTable(spark, out_root).load())
    expected2 = _triple_multiset(build_triples(spark, more, PipelineConfig()))
    assert got2 == expected2
