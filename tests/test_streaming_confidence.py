"""Streaming noisy-or triple-confidence maintenance: after draining a
2-file extraction stream, the read-back scores must equal the batch
fusion over the concatenated input (log-space sums fold exactly at the
6-dp contract), and a re-drain with the same checkpoint is a no-op."""

from __future__ import annotations

import math
import os

import pytest

from search_spark.streaming.confidence import (
    read_triple_confidence,
    triple_confidence_stream,
)

# (subj, pred, obj, p): triple A seen in both batches, B only in the
# first, C only in the second — fused scores must span batch boundaries
BATCH_1 = [
    ("join", "acts_on", "table", 0.5),
    ("join", "acts_on", "table", 0.25),
    ("sort", "acts_on", "row", 0.5),
]
BATCH_2 = [
    ("join", "acts_on", "table", 0.125),
    ("scan", "acts_on", "column", 1.0 / 3.0),
    ("scan", "acts_on", "column", 0.2),
]

SCHEMA = "subj string, pred string, obj string, p double"


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
    return triple_confidence_stream(spark, stream, state_dir, ckpt)


def _python_fusion(rows):
    want = {}
    for s, pr, o, p in rows:
        n, log1m, mx = want.get((s, pr, o), (0, 0.0, 0.0))
        want[(s, pr, o)] = (n + 1, log1m + math.log(1.0 - p), max(mx, p))
    return {
        k: (n, round(1.0 - math.exp(log1m), 6), round(mx, 6))
        for k, (n, log1m, mx) in want.items()
    }


def test_streamed_fusion_equals_batch_fusion(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_batch(spark, BATCH_1, f"{src}/part=0", 1_000_000_000)
    _write_batch(spark, BATCH_2, f"{src}/part=1", 1_000_000_100)
    state = str(tmp_path / "state")

    commits = _drain(spark, src, state, str(tmp_path / "ckpt"))
    assert [c["batch_id"] for c in commits] == [0, 1]
    assert commits[1]["n_triples"] == 3

    got = {
        (r["subj"], r["pred"], r["obj"]): (
            r["n_prov"], r["noisy_or"], r["max_p"],
        )
        for r in read_triple_confidence(spark, state).collect()
    }
    want = _python_fusion(BATCH_1 + BATCH_2)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        assert got[k][1] == pytest.approx(want[k][1], abs=1e-6), k
        assert got[k][2] == pytest.approx(want[k][2], abs=1e-9), k
    # the cross-batch triple fused both extractions:
    # 1 - (1-0.5)(1-0.25)(1-0.125) = 0.671875
    assert got[("join", "acts_on", "table")] == (3, 0.671875, 0.5)


def test_streamed_fusion_redrain_is_noop(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_batch(spark, BATCH_1, f"{src}/part=0", 1_000_000_000)
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    first = _drain(spark, src, state, ckpt)
    assert len(first) == 1
    before = {
        (r["subj"], r["pred"], r["obj"]): r["noisy_or"]
        for r in read_triple_confidence(spark, state).collect()
    }
    again = _drain(spark, src, state, ckpt)
    assert again == []  # checkpoint remembers: nothing reprocessed
    after = {
        (r["subj"], r["pred"], r["obj"]): r["noisy_or"]
        for r in read_triple_confidence(spark, state).collect()
    }
    assert after == before
