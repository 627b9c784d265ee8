"""Streaming cardinality-sketch maintenance.

Exact distinct-counting over a stream needs per-group value sets —
unbounded state. The order-statistics sketch
(:mod:`search_spark.operators.sketches`) is mergeable by elementwise
MIN, so the streaming state is R bigints per group forever: each
micro-batch sketches its own rows and folds into the persisted state
with one ``union → groupBy → MIN`` pass. The estimate read back after
N batches is bit-identical to sketching the concatenated batches — the
mergeability contract, asserted end-to-end by the test.

``Trigger.AvailableNow`` drains the source and stops (deterministic,
batch-equivalent); the identical code runs unbounded with a
processing-time trigger in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_spark.operators.sketches import (
    HASH_MOD,
    R_DEFAULT,
    sketch_mins,
)
from search_spark.streaming.state import (
    commit_state,
    current_state_path,
    read_state,
)


def distinct_sketch_stream(
    spark: SparkSession,
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    group: str,
    col: str,
    r: int = R_DEFAULT,
    available_now: bool = True,
) -> list[dict]:
    """Maintain per-group distinct-count sketches over a stream.

    Returns one record per non-empty micro-batch:
    ``{"batch_id", "n_rows", "n_groups"}``. Sketch state (one row of R
    minima per group) lives in atomically-swapped versioned dirs under
    ``state_dir`` (streaming/state.py); read the current estimates with
    :func:`read_distinct_estimates`.
    """
    commits: list[dict] = []

    def _step(batch_df: DataFrame, batch_id: int) -> None:
        n_rows = batch_df.count()
        if n_rows == 0:
            return
        new = sketch_mins(batch_df, group, col, r)
        merged = new
        current = current_state_path(state_dir, "mins")
        if current is not None:
            old = spark.read.parquet(current)
            merged = old.unionByName(new).groupBy(group).agg(
                *[F.min(f"m{i}").alias(f"m{i}") for i in range(r)]
            )
        n_groups = merged.count()
        commit_state(merged, state_dir, "mins", batch_id)
        commits.append(
            {"batch_id": batch_id, "n_rows": n_rows, "n_groups": n_groups}
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


def read_distinct_estimates(
    spark: SparkSession,
    state_dir: str,
    group: str,
    r: int = R_DEFAULT,
) -> DataFrame:
    """Current ``(group, sum_min, est_distinct)`` from the maintained
    sketch state — the same exact-integer estimator as the batch
    operator."""
    mins = read_state(spark, state_dir, "mins")
    total = F.expr(" + ".join(f"m{i}" for i in range(r)))
    scale = (r - 1) * HASH_MOD
    return mins.select(F.col(group), total.alias("sum_min")).select(
        group,
        "sum_min",
        F.expr(f"CAST({scale} AS BIGINT) div sum_min").alias(
            "est_distinct"
        ),
    )
