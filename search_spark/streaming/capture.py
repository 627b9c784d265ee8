"""Streaming maintenance of keep-latest-capture recrawl dedup.

The batch `latest_capture` query (queries.py) keeps only the newest
capture per canonical url. On a live crawl the captures arrive in
batches, and the keep-latest decision is mergeable: per canonical url
the state is ``(n_captures, latest_epoch, keep_doc_id)``, folded by
``sum`` / ``max`` / "doc id at the max epoch" — the last one via the
portable two-step (max epoch, then max doc id at that epoch), carried
as a single packed ``(epoch, doc_id)`` struct whose max IS the
lexicographic argmax. State stays one row per distinct canonical url
(frontier-sized, not crawl-sized).

``Trigger.AvailableNow`` drains the source and stops (deterministic,
batch-equivalent); the identical code runs unbounded with a
processing-time trigger in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_spark.streaming.state import (
    commit_state,
    current_state_path,
    read_state,
)


def _fold(batch_df: DataFrame) -> DataFrame:
    """Partial keep-latest state for one batch of capture rows
    ``(canonical_url, doc_id, ts_epoch)``."""
    return batch_df.groupBy("canonical_url").agg(
        F.count(F.lit(1)).alias("n_captures"),
        F.max(F.struct("ts_epoch", "doc_id")).alias("best"),
    )


def latest_capture_stream(
    spark: SparkSession,
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> list[dict]:
    """Maintain keep-latest-capture state over a capture stream.

    ``stream`` rows are ``(canonical_url, doc_id, ts_epoch)``. Returns
    one record per non-empty micro-batch: ``{"batch_id", "n_rows",
    "n_urls"}``. State lives in atomically-swapped versioned dirs under
    ``state_dir`` (streaming/state.py); read the current winners with
    :func:`read_latest_captures`.
    """
    commits: list[dict] = []

    def _step(batch_df: DataFrame, batch_id: int) -> None:
        n_rows = batch_df.count()
        if n_rows == 0:
            return
        merged = _fold(batch_df)
        current = current_state_path(state_dir, "latest")
        if current is not None:
            old = spark.read.parquet(current)
            merged = old.unionByName(merged).groupBy("canonical_url").agg(
                F.sum("n_captures").alias("n_captures"),
                F.max("best").alias("best"),
            )
        n_urls = merged.count()
        commit_state(merged, state_dir, "latest", batch_id)
        commits.append(
            {"batch_id": batch_id, "n_rows": n_rows, "n_urls": n_urls}
        )

    writer = stream.writeStream.foreachBatch(_step).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        query = writer.trigger(availableNow=True).start()
        query.awaitTermination()
    else:  # pragma: no cover - unbounded production path
        query = writer.start()
    return commits


def read_latest_captures(
    spark: SparkSession, state_dir: str
) -> DataFrame:
    """Current ``(canonical_url, n_captures, latest_epoch, keep_doc_id)``
    from the maintained state — the batch `latest_capture` shape."""
    state = read_state(spark, state_dir, "latest")
    return state.select(
        "canonical_url",
        "n_captures",
        F.col("best.ts_epoch").alias("latest_epoch"),
        F.col("best.doc_id").alias("keep_doc_id"),
    )
