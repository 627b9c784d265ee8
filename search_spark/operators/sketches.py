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


def sketch_overlap(
    df: DataFrame, group: str, col: str, r: int = R_DEFAULT
) -> DataFrame:
    """Pairwise overlap estimates between groups, from sketches alone.

    The union sketch of two groups is the elementwise MIN of their
    per-hash minima (the mergeability property), so
    ``|A ∪ B|`` estimates without touching the raw data again and
    ``|A ∩ B| ≈ max(0, n̂_A + n̂_B − n̂_{A∪B})`` by inclusion–exclusion.
    The pair join runs over the *sketch table* — one row of R bigints
    per group — which is why the quadratic pair blow-up is affordable:
    at 10^12 rows the raw pairwise intersection is unthinkable, the
    sketch algebra is G²·R integer ops.

    Returns ``(<group>_a, <group>_b, est_a, est_b, est_union,
    est_overlap)`` for every unordered pair (a < b), all BIGINT.
    """
    sk = df.groupBy(group).agg(
        *[F.min(_hash48(F.col(col), i)).alias(f"m{i}") for i in range(r)]
    )
    a = sk.select(
        F.col(group).alias("ga"),
        *[F.col(f"m{i}").alias(f"a{i}") for i in range(r)],
    )
    b = sk.select(
        F.col(group).alias("gb"),
        *[F.col(f"m{i}").alias(f"b{i}") for i in range(r)],
    )
    pairs = a.join(b, F.col("ga") < F.col("gb"))

    def _sum(prefix):
        total = None
        for i in range(r):
            c = F.col(f"{prefix}{i}")
            total = c if total is None else total + c
        return total

    def _sum_least():
        total = None
        for i in range(r):
            c = F.least(F.col(f"a{i}"), F.col(f"b{i}"))
            total = c if total is None else total + c
        return total

    scale = (r - 1) * (1 << HASH_BITS)
    with_sums = pairs.select(
        F.col("ga").alias(f"{group}_a"),
        F.col("gb").alias(f"{group}_b"),
        _sum("a").alias("sa"),
        _sum("b").alias("sb"),
        _sum_least().alias("su"),
    )
    return with_sums.select(
        f"{group}_a",
        f"{group}_b",
        F.expr(f"CAST({scale} AS BIGINT) div sa").alias("est_a"),
        F.expr(f"CAST({scale} AS BIGINT) div sb").alias("est_b"),
        F.expr(f"CAST({scale} AS BIGINT) div su").alias("est_union"),
    ).select(
        f"{group}_a",
        f"{group}_b",
        "est_a",
        "est_b",
        "est_union",
        F.greatest(
            F.lit(0).cast("bigint"),
            F.col("est_a") + F.col("est_b") - F.col("est_union"),
        ).alias("est_overlap"),
    )


def sketch_overlap_oracle_sql(
    source_cte: str, group: str, col: str, r: int = R_DEFAULT
) -> str:
    """DuckDB twin of :func:`sketch_overlap` over CTE ``source_cte``."""

    def hash_expr(i: int) -> str:
        return (
            "list_reduce(list_transform(string_split_regex("
            f"substr(md5({col} || '#{i}'), 1, 12), ''), "
            "c -> CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)), "
            "(acc, x) -> acc * 16 + x)"
        )

    mins = ", ".join(f"MIN({hash_expr(i)}) AS m{i}" for i in range(r))
    sum_a = " + ".join(f"a.m{i}" for i in range(r))
    sum_b = " + ".join(f"b.m{i}" for i in range(r))
    sum_u = " + ".join(f"LEAST(a.m{i}, b.m{i})" for i in range(r))
    scale = (r - 1) * (1 << HASH_BITS)
    return f"""
sk AS (SELECT {group}, {mins} FROM {source_cte} GROUP BY {group}),
pr AS (
  SELECT a.{group} AS {group}_a, b.{group} AS {group}_b,
         ({sum_a}) AS sa, ({sum_b}) AS sb, ({sum_u}) AS su
  FROM sk a JOIN sk b ON a.{group} < b.{group}),
est AS (
  SELECT {group}_a, {group}_b,
         CAST({scale} AS BIGINT) // sa AS est_a,
         CAST({scale} AS BIGINT) // sb AS est_b,
         CAST({scale} AS BIGINT) // su AS est_union
  FROM pr)
SELECT {group}_a, {group}_b, est_a, est_b, est_union,
       GREATEST(CAST(0 AS BIGINT), est_a + est_b - est_union) AS est_overlap
FROM est
"""


CMS_DEPTH = 4
CMS_WIDTH = 1024


def count_min_sketch(
    df: DataFrame,
    col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Count-min sketch of a column's value frequencies.

    ``depth`` independent hash rows of ``width`` counters: every value
    increments counter ``(d, h_d(v) mod width)``; a point query reads
    its ``depth`` counters and takes the MIN (overestimates only, never
    under). The build is one explode (×depth) + one partial-aggregating
    count — O(depth·width) final state regardless of input size, the
    frequency-sketch complement to :func:`distinct_sketch`'s cardinality
    estimator. Returns ``(d, bucket, cnt)``.
    """
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        (_hash48(F.col(col), 1000 + d) % width).alias(
                            "bucket"
                        ),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("s")
    )
    return (
        rows.select("s.d", "s.bucket")
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_point_estimates(
    sketch: DataFrame,
    terms: list[str],
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Frequency estimates for a fixed term list from a CMS table: the
    (term, d, bucket) probe set is a literal (|terms|·depth rows) that
    broadcast-joins the sketch; estimate = MIN over depth rows (absent
    bucket → 0). Returns ``(term, est_count)``."""
    spark = sketch.sparkSession
    probes = spark.createDataFrame(
        [(t, d) for t in terms for d in range(depth)], ["term", "d"]
    )
    # same hash as count_min_sketch, but the salt is the d COLUMN (the
    # _hash48 helper takes a literal salt), so spell the md5 out
    probes = probes.withColumn(
        "bucket",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("term"),
                        F.concat(F.lit("#"), (F.col("d") + 1000)),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("bigint")
        % width,
    )
    # the sketch is the broadcast side: its final size is depth·width
    # rows no matter how big the input was — that bound is the point
    return (
        probes.join(F.broadcast(sketch), on=["d", "bucket"], how="left")
        .groupBy("term")
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count")
        )
    )


def cms_oracle_sql(
    source_cte: str,
    col: str,
    terms: list[str],
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> str:
    """DuckDB twin of build + point estimates for a fixed term list."""

    def hash_expr(expr: str, salt_expr: str) -> str:
        return (
            "list_reduce(list_transform(string_split_regex("
            f"substr(md5({expr} || '#' || {salt_expr}), 1, 12), ''), "
            "c -> CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)), "
            "(acc, x) -> acc * 16 + x)"
        )

    vals = ", ".join(f"('{t}')" for t in terms)
    ds = ", ".join(f"({d})" for d in range(depth))
    return f"""
depths AS (SELECT * FROM (VALUES {ds}) AS t(d)),
cms AS (
  SELECT d, {hash_expr(col, "CAST(d + 1000 AS VARCHAR)")} % {width} AS bucket,
         COUNT(*) AS cnt
  FROM {source_cte} CROSS JOIN depths GROUP BY 1, 2),
probes AS (
  SELECT term, d,
         {hash_expr("term", "CAST(d + 1000 AS VARCHAR)")} % {width} AS bucket
  FROM (VALUES {vals}) AS t(term) CROSS JOIN depths)
SELECT p.term, MIN(COALESCE(c.cnt, 0)) AS est_count
FROM probes p LEFT JOIN cms c ON c.d = p.d AND c.bucket = p.bucket
GROUP BY p.term
"""


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
