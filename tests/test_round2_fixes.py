"""Round-2 regression tests for the ADVICE fixes: full deprioritization
weight table + zero-norm guard, production file-sink streaming path, and
cache-registry release of pipeline intermediates."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from search_spark.operators.search import (
    DEPRIORITIZATION_WEIGHTS,
    combine_queries,
    semantic_topk,
)

SF_DIR = "/root/testdata/sf0.001"


def test_all_five_reference_strengths_present():
    # search.py:166-177 — the reference accepts exactly these five
    assert DEPRIORITIZATION_WEIGHTS == {
        "None": (1.0, 0.0),
        "Weak": (0.9, 0.1),
        "Mild": (0.8, 0.3),
        "Strong": (0.5, 0.5),
        "Stronger": (0.5, 0.7),
    }


def test_weak_and_strong_strengths_execute(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = [float(x) for x in
         emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    for strength in ("Weak", "Strong"):
        out = semantic_topk(
            emb, q, k=3, deprioritize_vec=q, strength=strength
        ).collect()
        assert len(out) == 3
        assert all(r["score"] is not None for r in out)


def test_zero_norm_guard_yields_zero_scores_not_nan(spark):
    # Strong = (0.5, 0.5): combining q with itself cancels to the zero
    # vector; the reference divides by 1 instead of 0 (search.py:180-183)
    df = spark.range(1).select(
        combine_queries(
            F.array(F.lit(1.0), F.lit(2.0)),
            F.array(F.lit(1.0), F.lit(2.0)),
            "Strong",
        ).alias("v")
    )
    vec = df.collect()[0]["v"]
    assert vec == [0.0, 0.0]
    assert not any(math.isnan(x) for x in vec)


def test_file_sink_emits_only_watermark_closed_windows(spark, tmp_path):
    from search_spark.streaming.windowed import (
        windowed_event_counts,
        windowed_event_counts_to_files,
    )

    path = f"{SF_DIR}/events.parquet"
    complete = {
        (r["w_start"], r["event_type"]): r["n"]
        for r in windowed_event_counts(spark, path).collect()
    }
    emitted = windowed_event_counts_to_files(
        spark,
        path,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    ).collect()
    got = {(r["w_start"], r["event_type"]): r["n"] for r in emitted}
    # append mode: every emitted window is correct…
    for k, n in got.items():
        assert complete[k] == n, k
    # …and exactly the non-final (watermark-closed) windows are emitted
    last_window = max(w for w, _ in complete)
    expected_closed = {k for k in complete if k[0] < last_window}
    assert set(got) == expected_closed


def test_run_to_snapshot_releases_cached_intermediates(spark, tmp_path):
    from search_spark import datagen
    from search_spark.pipeline import run_to_snapshot

    spark.catalog.clearCache()
    pages = datagen.generate_web_pages(spark, 12, seed=3, partitions=2)
    run_to_snapshot(spark, pages, str(tmp_path / "t"))
    # all pipeline-persisted intermediates were unpersisted after the write
    jspark = spark._jsparkSession
    n_cached = jspark.sharedState().cacheManager().numCachedEntries()
    assert n_cached == 0, f"{n_cached} cached entries leaked"
