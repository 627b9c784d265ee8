"""Sequence packing for pretraining batches: a distributed prefix sum.

A training-data pipeline ends by concatenating tokenized documents in a
deterministic order and slicing the stream into fixed-size context
windows (GPT-style packing with document spanning). The core primitive is
a **global cumulative sum** over a total order — inherently sequential,
but exactly parallelizable with the classic two-phase scan:

1. assign each row a contiguous *block* derived from its key —
   ``floor((key - min) / width)`` with width sized so there is roughly
   one block per target partition (one O(1) min/max aggregate up front;
   blocks are a pure function of the key, so the assignment is
   deterministic across runs and engines, unlike sampled range
   partitioning),
2. per-block local cumsum: one window ``partitionBy(block)`` — the
   plan's **only full-data shuffle**,
3. block totals come straight from a ``groupBy(block).sum(value)`` on the
   *unshuffled* input — partial aggregation collapses each input
   partition to one row per block map-side, so this branch's exchange
   moves a block-count-sized table, not the corpus — then get
   prefix-summed by a window over that tiny table and broadcast-join
   back as per-block offsets.

At 10^12 documents the only corpus-sized data movement is the one hash
shuffle on the block id; the offset table has one row per block and
broadcasts. A skewed key *density* degrades block balance (more rows in
some blocks), never correctness — the result is bit-identical to a
single sequential scan, which is what the plain ``SUM() OVER (ORDER
BY ...)`` oracle computes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_BLOCK = "__block"
_LOCAL = "__local_cum"
_OFFSET = "__block_offset"


def global_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    result_col: str = "cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Inclusive cumulative sum of ``value_col`` in ``order_col`` order.

    ``order_col`` must be a numeric total order (unique keys); ties would
    make the result nondeterministic. Returns ``df`` plus ``result_col``.
    """
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    bounds = df.agg(
        F.min(order_col).alias("mn"), F.max(order_col).alias("mx")
    ).first()
    if bounds["mn"] is None:
        # keep the schema identical to the non-empty path: NULL typed as
        # what SUM(value_col) would produce (long for integral inputs)
        sum_type = (
            df.select(F.sum(value_col).alias("s")).schema["s"].dataType
        )
        return df.withColumn(result_col, F.lit(None).cast(sum_type))
    span = int(bounds["mx"]) - int(bounds["mn"]) + 1
    width = max(1, -(-span // n_parts))
    block = F.floor(
        (F.col(order_col) - F.lit(int(bounds["mn"]))) / F.lit(width)
    )
    local = df.withColumn(_BLOCK, block).withColumn(
        _LOCAL,
        F.sum(value_col).over(
            Window.partitionBy(_BLOCK)
            .orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    # block totals from the unshuffled input: partial aggregation makes
    # this branch's exchange block-count-sized; the exclusive prefix of
    # earlier block totals then runs over that tiny table
    totals = (
        df.withColumn(_BLOCK, block)
        .groupBy(_BLOCK)
        .agg(F.sum(value_col).alias("__total"))
        .withColumn(
            _OFFSET,
            F.coalesce(
                F.sum("__total").over(
                    Window.orderBy(_BLOCK).rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select(_BLOCK, _OFFSET)
    )
    return (
        local.join(F.broadcast(totals), on=_BLOCK)
        .withColumn(result_col, F.col(_LOCAL) + F.col(_OFFSET))
        .drop(_BLOCK, _LOCAL, _OFFSET)
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
