"""Streaming PageRank maintenance over an edge stream.

Batch graph analytics (operators/graph.py) answer "what are the ranks of
the KG I built"; a constructor that ingests continuously also wants the
rank vector maintained as edges arrive. This wraps
:func:`~search_spark.operators.graph.incremental_pagerank`'s warm-start
step in ``foreachBatch``: each micro-batch of new ``(src, dst)`` rows is
appended to a cumulative edge table, and PageRank is recomputed warm from
the previous batch's final vector (new vertices at ``1/N``, renormalized
— a few warm iterations track the stationary distribution of the grown
graph instead of a cold full run).

State layout under ``state_dir``::

    edges/          cumulative distinct-able edge appends (parquet)
    ranks_v<id>/    (entity, rank) vector versions behind an atomic
                    ranks.CURRENT marker (streaming/state.py)

Both live on the same storage as the snapshot tables; together with the
streaming checkpoint the state is restart-safe — a replayed batch appends
duplicate edge rows, which the ``distinct`` inside ``pagerank`` collapses
(idempotent), and the rank vector commits via versioned write + marker
swap (and is in any case recomputable cold from ``edges/``).

``Trigger.AvailableNow`` drains the source and stops (deterministic,
batch-equivalent — what the test asserts); the identical code runs
unbounded with a processing-time trigger in production.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from search_spark.operators.graph import LOCAL_PR_THRESHOLD, pagerank
from search_spark.streaming.state import (
    commit_state,
    current_state_path,
    read_state,
)


def pagerank_stream(
    spark: SparkSession,
    edges_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    n_iter_per_batch: int = 4,
    damping: float = 0.85,
    local_threshold: int = LOCAL_PR_THRESHOLD,
    available_now: bool = True,
) -> list[dict]:
    """Maintain PageRank over a streaming ``(src, dst)`` edge source.

    Returns one record per non-empty micro-batch:
    ``{"batch_id", "n_edge_rows", "n_vertices"}``. The final rank vector
    lives in atomically-swapped versioned dirs under ``state_dir``
    (streaming/state.py); read it back with :func:`read_ranks`.
    """
    edges_path = os.path.join(state_dir, "edges")
    commits: list[dict] = []

    def _step(batch_df: DataFrame, batch_id: int) -> None:
        batch_edges = batch_df.select("src", "dst")
        n_rows = batch_edges.count()
        if n_rows == 0:
            return
        batch_edges.write.mode("append").parquet(edges_path)
        cumulative = spark.read.parquet(edges_path)
        current = current_state_path(state_dir, "ranks")
        init = spark.read.parquet(current) if current is not None else None
        ranks = pagerank(
            cumulative,
            n_iter=n_iter_per_batch,
            damping=damping,
            local_threshold=local_threshold,
            init_ranks=init,
        )
        n_vertices = ranks.count()
        commit_state(ranks, state_dir, "ranks", batch_id)
        commits.append(
            {
                "batch_id": batch_id,
                "n_edge_rows": n_rows,
                "n_vertices": n_vertices,
            }
        )

    writer = edges_stream.writeStream.foreachBatch(_step).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        query = writer.trigger(availableNow=True).start()
        query.awaitTermination()
    else:  # pragma: no cover - unbounded production path
        query = writer.start()
    return commits


def read_ranks(spark: SparkSession, state_dir: str) -> DataFrame:
    """Current ``(entity, rank)`` vector from the maintained state."""
    return read_state(spark, state_dir, "ranks")
