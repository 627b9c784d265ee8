"""Crash-window behavior of the versioned streaming-state protocol."""

from __future__ import annotations

import os

from search_spark.streaming.state import (
    commit_state,
    current_state_path,
    read_state,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, schema="k string, n long")


def test_commit_and_read_roundtrip(spark, tmp_path):
    state = str(tmp_path)
    commit_state(_df(spark, [("a", 1)]), state, "s", 0)
    assert {(r.k, r.n) for r in read_state(spark, state, "s").collect()} == {
        ("a", 1)
    }
    commit_state(_df(spark, [("a", 2), ("b", 1)]), state, "s", 1)
    assert {(r.k, r.n) for r in read_state(spark, state, "s").collect()} == {
        ("a", 2),
        ("b", 1),
    }
    # superseded version dropped, marker points at v1
    assert current_state_path(state, "s").endswith("s_v1")
    assert not os.path.isdir(os.path.join(state, "s_v0"))


def test_crash_before_marker_flip_keeps_old_state(spark, tmp_path):
    state = str(tmp_path)
    commit_state(_df(spark, [("a", 1)]), state, "s", 0)
    # simulate a crash AFTER the new version dir was (partially) written
    # but BEFORE the marker flipped: readers must still see v0
    partial = os.path.join(state, "s_v1")
    os.makedirs(partial)
    with open(os.path.join(partial, "part-garbage.parquet"), "wb") as fh:
        fh.write(b"not parquet")
    assert current_state_path(state, "s").endswith("s_v0")
    assert {(r.k, r.n) for r in read_state(spark, state, "s").collect()} == {
        ("a", 1)
    }
    # the replayed batch rewrites the same version dir and commits cleanly
    commit_state(_df(spark, [("a", 2)]), state, "s", 1)
    assert {(r.k, r.n) for r in read_state(spark, state, "s").collect()} == {
        ("a", 2)
    }


def test_marker_pointing_at_missing_dir_reads_as_empty(spark, tmp_path):
    state = str(tmp_path)
    commit_state(_df(spark, [("a", 1)]), state, "s", 0)
    import shutil

    shutil.rmtree(os.path.join(state, "s_v0"))
    assert current_state_path(state, "s") is None
