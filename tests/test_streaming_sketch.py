"""Streaming distinct-sketch maintenance: after draining a 2-file
stream, the read-back estimates must be BIT-IDENTICAL to the batch
sketch over the concatenated input (mergeability end-to-end), and a
re-drain with the same checkpoint must be a no-op."""

from __future__ import annotations

import os

from search_spark.operators.sketches import distinct_sketch
from search_spark.streaming.sketch import (
    distinct_sketch_stream,
    read_distinct_estimates,
)

BATCH_1 = [("a", f"v{i}") for i in range(300)] + [
    ("b", f"w{i}") for i in range(50)
]
BATCH_2 = [("a", f"v{i}") for i in range(150, 450)] + [
    ("c", f"x{i}") for i in range(80)
]

SCHEMA = "grp string, v string"


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
    return distinct_sketch_stream(
        spark, stream, state_dir, ckpt, group="grp", col="v"
    )


def test_streamed_sketch_equals_batch_sketch(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_batch(spark, BATCH_1, f"{src}/part=0", 1_000_000_000)
    _write_batch(spark, BATCH_2, f"{src}/part=1", 1_000_000_100)
    state = str(tmp_path / "state")

    commits = _drain(spark, src, state, str(tmp_path / "ckpt"))
    assert [c["batch_id"] for c in commits] == [0, 1]
    assert commits[1]["n_groups"] == 3

    got = {
        r["grp"]: (r["sum_min"], r["est_distinct"])
        for r in read_distinct_estimates(spark, state, "grp").collect()
    }
    want = {
        r["grp"]: (r["sum_min"], r["est_distinct"])
        for r in distinct_sketch(
            spark.createDataFrame(BATCH_1 + BATCH_2, SCHEMA), "grp", "v"
        ).collect()
    }
    assert got == want  # bit-identical, not approximately equal
    # sanity: the estimates are in the right ballpark (450/50/80 distinct)
    assert abs(got["a"][1] - 450) / 450 < 0.35


def test_streamed_sketch_redrain_is_noop(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_batch(spark, BATCH_1, f"{src}/part=0", 1_000_000_000)
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    assert len(_drain(spark, src, state, ckpt)) == 1
    before = sorted(
        map(tuple, read_distinct_estimates(spark, state, "grp").collect())
    )
    assert _drain(spark, src, state, ckpt) == []
    after = sorted(
        map(tuple, read_distinct_estimates(spark, state, "grp").collect())
    )
    assert before == after
