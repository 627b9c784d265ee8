"""Cardinality sketches: distinct counting without COUNT(DISTINCT).

At 10^12 rows, ``COUNT(DISTINCT col)`` per group shuffles every distinct
(group, value) pair — the sketch alternative keeps O(R) state per group
and partial-aggregates map-side like any plain ``min``. This module
implements the order-statistics estimator (the KMV/bottom-k family in
its stochastic-averaging form, cf. Lumbroso 2010; HyperLogLog is the
same idea with log-size registers):

* hash every value with R independent hashes ``md5(value ∥ r)``;
* per group, keep ``m_r = min_r`` for each of the R hashes — R plain
  ``MIN`` aggregates, fully combinable;
* the minimum of n uniform(0,1) draws is ≈ 1/n, so the MLE over R
  independent minima is ``n̂ = (R-1) / Σ_r m_r`` (relative error
  ≈ 1/√(R-2)).

Everything stays exact-integer for oracle parity: hashes are the first
12 hex chars of md5 (48 bits), the estimate is computed with integer
division ``(R-1)·2^48 div Σ m_r`` — bit-identical in Spark and DuckDB,
no floating point anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HASH_BITS = 48  # 12 hex chars of md5
R_DEFAULT = 32


def _hash48(col, salt: int):
    """First 48 bits of md5(value ∥ salt) as a bigint in [0, 2^48)."""
    return F.conv(
        F.substring(F.md5(F.concat(col, F.lit(f"#{salt}"))), 1, 12), 16, 10
    ).cast("bigint")


def distinct_sketch(
    df: DataFrame, group: str, col: str, r: int = R_DEFAULT
) -> DataFrame:
    """Estimated distinct ``col`` per ``group`` with O(r) state.

    Returns ``(group, sum_min, est_distinct)`` — ``sum_min`` is the raw
    sketch (Σ of the r per-hash minima; mergeable across shards by
    taking mins before summing), ``est_distinct`` the integer MLE
    ``(r-1)·2^48 div sum_min``. One shuffle, map-side combinable.
    """
    mins = [
        F.min(_hash48(F.col(col), i)).alias(f"m{i}") for i in range(r)
    ]
    agg = df.groupBy(group).agg(*mins)
    total = None
    for i in range(r):
        c = F.col(f"m{i}")
        total = c if total is None else total + c
    scale = (r - 1) * (1 << HASH_BITS)
    return agg.select(F.col(group), total.alias("sum_min")).select(
        group,
        "sum_min",
        # integer division (`div`), matching DuckDB's `//` exactly —
        # double division + cast could round differently at boundaries
        F.expr(f"CAST({scale} AS BIGINT) div sum_min").alias(
            "est_distinct"
        ),
    )


def distinct_sketch_oracle_sql(
    source_cte: str, group: str, col: str, r: int = R_DEFAULT
) -> str:
    """DuckDB twin of :func:`distinct_sketch` over a CTE named
    ``source_cte`` with columns ``group`` and ``col``; hex→int is a
    digit fold (DuckDB has no base-16 conv)."""

    def hash_expr(i: int) -> str:
        return (
            "list_reduce(list_transform(string_split_regex("
            f"substr(md5({col} || '#{i}'), 1, 12), ''), "
            "c -> CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)), "
            "(acc, x) -> acc * 16 + x)"
        )

    mins = ", ".join(f"MIN({hash_expr(i)}) AS m{i}" for i in range(r))
    total = " + ".join(f"m{i}" for i in range(r))
    scale = (r - 1) * (1 << HASH_BITS)
    return f"""
sk AS (SELECT {group}, {mins} FROM {source_cte} GROUP BY {group}),
sk2 AS (SELECT {group}, ({total}) AS sum_min FROM sk)
SELECT {group}, sum_min,
       CAST({scale} AS BIGINT) // sum_min AS est_distinct
FROM sk2
"""
