"""Deterministic small-scale twin of the kill/resume probe
(tools/resume_probe.py; VERDICT r4 item 4).

A SIGKILL's landing point is timing-dependent, so CI reconstructs the
exact post-crash state the commit protocol defines instead: a crash
between the snapshot DATA write and the lineage-JSON commit rename
leaves (a) a full uncommitted ``data/snapshot=k`` dir, (b) possibly an
uncommitted ``processed/snapshot=k`` sidecar, (c) possibly a
half-written ``.json.tmp``. From that state, a rerun must
  * not see the uncommitted urls as processed (no silent data loss),
  * reprocess exactly the un-committed batches,
  * converge to the identical triple multiset as an uninterrupted run,
with or without an explicit orphan sweep first (append self-heals the
id collision).
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from search_spark.io.snapshots import SnapshotTable
from search_spark.pipeline import run_to_snapshot


def _pages(spark, n=60):
    from search_spark import datagen

    return datagen.generate_web_pages(
        spark, n, seed=7, partitions=4
    )


def _batch(pages, k, n_batches=3):
    return pages.filter(
        F.pmod(F.xxhash64("url"), F.lit(n_batches)) == k
    )


def _fp(spark, root):
    df = SnapshotTable(spark, root).load()
    if df is None:
        return (0, 0)
    r = (
        df.select(F.xxhash64("subj", "pred", "obj", "url").alias("h"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("h").cast("decimal(38,0)")).alias("s"),
        )
        .collect()[0]
    )
    return (r["n"], str(r["s"]))


@pytest.fixture()
def crashed_root(spark, tmp_path):
    """Root with batches 1-2 committed and batch 3 crashed mid-commit:
    data written, processed sidecar written, lineage rename never ran."""
    pages = _pages(spark)
    ref_root = str(tmp_path / "ref")
    root = str(tmp_path / "crashed")
    for k in range(3):
        run_to_snapshot(spark, _batch(pages, k), ref_root)
    for k in range(2):
        run_to_snapshot(spark, _batch(pages, k), root)
    # batch 3 "crash": write its committed form into a scratch root,
    # then transplant data+processed WITHOUT the lineage commit
    scratch = str(tmp_path / "scratch")
    for k in range(3):
        run_to_snapshot(spark, _batch(pages, k), scratch)
    shutil.copytree(
        f"{scratch}/data/snapshot=3", f"{root}/data/snapshot=3"
    )
    shutil.copytree(
        f"{scratch}/processed/snapshot=3",
        f"{root}/processed/snapshot=3",
    )
    with open(f"{root}/_lineage/.snapshot=3.json.tmp", "w") as f:
        f.write('{"snapshot_id": 3')  # half-written metadata
    return pages, root, ref_root


def test_uncommitted_work_is_not_marked_processed(spark, crashed_root):
    pages, root, _ = crashed_root
    done = SnapshotTable(spark, root).processed_urls()
    batch3_urls = {r["url"] for r in _batch(pages, 2).collect()}
    seen = {r["url"] for r in done.collect()}
    assert not (seen & batch3_urls)  # crash left no processed claim


def test_rerun_reprocesses_only_missing_and_matches(spark, crashed_root):
    pages, root, ref_root = crashed_root
    walls = {}
    for k in range(3):
        m = run_to_snapshot(spark, _batch(pages, k), root)
        walls[k] = m["n_docs"]
    # committed batches resumed as no-ops; only the crashed batch ran
    assert walls[0] == 0 and walls[1] == 0
    assert walls[2] == _batch(pages, 2).count() > 0
    assert _fp(spark, root) == _fp(spark, ref_root)


def test_rerun_after_orphan_sweep_matches_too(spark, crashed_root):
    pages, root, ref_root = crashed_root
    stats = SnapshotTable(spark, root).remove_orphans()
    assert stats["orphans_removed"] >= 2  # data debris + json.tmp
    assert not os.path.exists(f"{root}/data/snapshot=3")
    for k in range(3):
        run_to_snapshot(spark, _batch(pages, k), root)
    assert _fp(spark, root) == _fp(spark, ref_root)
