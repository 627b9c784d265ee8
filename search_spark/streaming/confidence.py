"""Streaming maintenance of noisy-or triple confidence.

The batch `kg_triple_confidence` query (Knowledge-Vault-style fusion,
``queries.py``) collapses every extraction of a triple into one score
``1 - Π(1 - pᵢ)``. On a continuously-crawled corpus the extractions
arrive in batches, and recomputing the fusion over all history per
batch re-reads the whole extraction log. The noisy-or is mergeable
through its log-space sum — ``Σ log(1 - pᵢ)`` folds by addition, the
provenance count by addition, the max confidence by max — so the
streaming state is THREE numbers per distinct triple forever (bounded
by the KG size, not the crawl size), and each micro-batch costs one
partial aggregate over its own rows plus one fold against the persisted
state.

``Trigger.AvailableNow`` drains the source and stops (deterministic,
batch-equivalent); the identical code runs unbounded with a
processing-time trigger in production. Distinct-document counts are
deliberately NOT maintained here — exact distinct state is unbounded;
compose with :mod:`search_spark.streaming.sketch` keyed on the triple
when an approximate doc count is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_spark.streaming.state import (
    commit_state,
    current_state_path,
    read_state,
)

TRIPLE_KEY = ["subj", "pred", "obj"]


def _fold(batch_df: DataFrame) -> DataFrame:
    """Partial fusion state for one batch of extraction rows
    ``(subj, pred, obj, p)`` with confidences in [0, 1)."""
    return batch_df.groupBy(*TRIPLE_KEY).agg(
        F.count(F.lit(1)).alias("n_prov"),
        F.sum(F.log(F.lit(1.0) - F.col("p"))).alias("log1m_sum"),
        F.max("p").alias("max_p"),
    )


def triple_confidence_stream(
    spark: SparkSession,
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> list[dict]:
    """Maintain fused triple-confidence state over an extraction stream.

    ``stream`` rows are per-extraction ``(subj, pred, obj, p)``.
    Returns one record per non-empty micro-batch:
    ``{"batch_id", "n_rows", "n_triples"}``. State lives in versioned
    ``{state_dir}/fused_v<batch>`` directories behind an atomically-
    swapped ``CURRENT`` marker (one row per distinct triple); read the
    current scores with :func:`read_triple_confidence`.
    """
    commits: list[dict] = []

    def _step(batch_df: DataFrame, batch_id: int) -> None:
        n_rows = batch_df.count()
        if n_rows == 0:
            return
        merged = _fold(batch_df)
        current = current_state_path(state_dir, "fused")
        if current is not None:
            old = spark.read.parquet(current)
            merged = old.unionByName(merged).groupBy(*TRIPLE_KEY).agg(
                F.sum("n_prov").alias("n_prov"),
                F.sum("log1m_sum").alias("log1m_sum"),
                F.max("max_p").alias("max_p"),
            )
        n_triples = merged.count()
        commit_state(merged, state_dir, "fused", batch_id)
        commits.append(
            {"batch_id": batch_id, "n_rows": n_rows, "n_triples": n_triples}
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


def read_triple_confidence(
    spark: SparkSession, state_dir: str
) -> DataFrame:
    """Current ``(subj, pred, obj, n_prov, noisy_or, max_p)`` from the
    maintained state — the same score the batch fusion computes."""
    fused = read_state(spark, state_dir, "fused")
    return fused.select(
        *TRIPLE_KEY,
        "n_prov",
        F.round(F.lit(1.0) - F.exp("log1m_sum"), 6).alias("noisy_or"),
        F.round("max_p", 6).alias("max_p"),
    )
