"""Sequence packing for pretraining batches: a distributed prefix sum.

A training-data pipeline ends by concatenating tokenized documents in a
deterministic order and slicing the stream into fixed-size context
windows (GPT-style packing with document spanning). The core primitive is
a **global cumulative sum** over a total order — inherently sequential,
but exactly parallelizable with the classic two-phase scan:

1. range-partition the rows by the order key (``repartitionByRange`` —
   partition *p* holds a contiguous key range),
2. per-partition local cumsum (a window over rows *within* one
   partition — no cross-partition shuffle),
3. per-partition totals (one tiny aggregate, |partitions| rows) are
   prefix-summed on the driver-free path: a broadcast join of each
   partition's *offset* (sum of all earlier partitions) back onto the
   rows.

At 10^12 documents the only global data movement is the range shuffle;
phase 3's offset table has one row per partition and broadcasts. The
result is bit-identical to a single sequential scan, which is what the
plain ``SUM() OVER (ORDER BY ...)`` oracle computes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PART = "__part_id"
_LOCAL = "__local_cum"
_OFFSET = "__part_offset"


def global_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    result_col: str = "cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Inclusive cumulative sum of ``value_col`` in ``order_col`` order.

    ``order_col`` must be a total order (unique keys); ties would make
    the result nondeterministic. Returns ``df`` plus ``result_col``.
    """
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n_parts, F.col(order_col)).withColumn(
        _PART, F.spark_partition_id()
    )
    local = ranged.withColumn(
        _LOCAL,
        F.sum(value_col).over(
            Window.partitionBy(_PART)
            .orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    # one row per partition: (part_id, exclusive prefix of earlier totals).
    # |partitions| rows — broadcast by construction.
    totals = (
        local.groupBy(_PART)
        .agg(F.max(_LOCAL).alias("__total"))
        .withColumn(
            _OFFSET,
            F.coalesce(
                F.sum("__total").over(
                    Window.orderBy(_PART).rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select(_PART, _OFFSET)
    )
    return (
        local.join(F.broadcast(totals), on=_PART)
        .withColumn(result_col, F.col(_LOCAL) + F.col(_OFFSET))
        .drop(_PART, _LOCAL, _OFFSET)
    )


def pack_sequences(
    df: DataFrame,
    order_col: str,
    length_col: str,
    capacity: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign each document a context-window id and offset (GPT-style
    packing with document spanning).

    Documents are concatenated in ``order_col`` order; the token stream is
    sliced every ``capacity`` tokens. A document *starts* in window
    ``floor(start / capacity)`` at offset ``start % capacity`` where
    ``start`` is the exclusive prefix sum of lengths; ``n_windows`` is how
    many windows the document touches (≥2 when it straddles boundaries).

    Adds columns ``window_id``, ``offset``, ``n_windows``.
    """
    with_cum = global_cumsum(
        df, order_col, length_col, result_col="__incl", num_partitions=num_partitions
    )
    start = F.col("__incl") - F.col(length_col)
    end = F.col("__incl")  # exclusive
    return (
        with_cum.withColumn(
            "window_id", F.floor(start / capacity).cast("bigint")
        )
        .withColumn("offset", (start % capacity).cast("bigint"))
        # windows touched: ceil(end/capacity) - floor(start/capacity),
        # with zero-length docs touching their start window only
        .withColumn(
            "n_windows",
            F.greatest(
                (F.ceil(end / capacity) - F.floor(start / capacity)),
                F.lit(1),
            ).cast("bigint"),
        )
        .drop("__incl")
    )
