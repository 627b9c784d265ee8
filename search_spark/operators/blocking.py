"""Sorted-neighborhood blocking for entity resolution.

The dedup family already covers hash blocking (MinHash/LSH bands, SimHash,
sign buckets); sorted-neighborhood (Hernández & Stolfo 1995, public) is the
complementary classic — sort records by a blocking key and emit candidate
pairs within a sliding window of the sorted order. It catches near-matches
whose hashes never collide (typo in the banded shingle, prefix-similar
names) at a guaranteed |corpus|·(w−1) candidate budget.

Distributed shape: the global rank is the two-pass range-sort pattern —
``repartitionByRange`` + within-partition ``row_number``, then partition
row-counts (one tiny O(#partitions) collect) turn local ranks into global
ones via a broadcast offset map. No single-partition window anywhere, so
the sort scales exactly like any ORDER BY. The window pairing is NOT a
self-join on an inequality (Spark would nested-loop it) — each row explodes
its (w−1) forward offsets and equi-joins on the integer rank, so the plan
is a small fan-out plus one hash join on a unique key. Skew-free by
construction: ranks are unique.

At 10^12 rows a single global sort is one full shuffle — the standard cost
of this algorithm; for multi-pass sorted-neighborhood call it once per key
and union the pair sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from search_spark.checkpoints import chain as _ckpt


def global_rank(
    records: DataFrame, order_cols: list[str], out_col: str = "rank"
) -> DataFrame:
    """Scalable dense global rank 1..N over ``order_cols`` (must be a
    total order — append a unique id column to break ties).

    Two passes: range-partition + local ``row_number``, then add each
    partition's cumulative predecessor count (collected — #partitions rows
    — and rejoined as a broadcast map). Equivalent to a global ORDER BY
    window but never funnels the data through one task.
    """
    cols = [F.col(c) for c in order_cols]
    # materialize the range partitioning: its boundaries are SAMPLED per
    # exchange instance (RDD-id-seeded), and this subtree feeds both the
    # rank branch and the offsets branch — pin it so correctness never
    # depends on Spark's exchange-reuse keeping the two instances
    # identical (same discipline as sampling.global_index)
    parts = (
        records.repartitionByRange(*cols)
        .withColumn("_pid", F.spark_partition_id())
        .transform(_ckpt(eager=True))
    )
    wp = Window.partitionBy("_pid").orderBy(*cols)
    local = parts.withColumn("_lrank", F.row_number().over(wp))
    # cumulative predecessor counts, computed IN-PLAN (not collected):
    # the offsets window is single-partition over #shuffle-partitions
    # rows — request-sized.
    sizes = local.groupBy("_pid").agg(F.count("*").alias("_n"))
    wo = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = sizes.select(
        "_pid",
        F.coalesce(F.sum("_n").over(wo), F.lit(0)).alias("_off"),
    )
    return (
        local.join(F.broadcast(offs), "_pid")
        .withColumn(out_col, (F.col("_lrank") + F.col("_off")).cast("long"))
        .drop("_pid", "_lrank", "_off")
    )


def sorted_neighborhood_pairs(
    records: DataFrame,
    id_col: str,
    key_col: str,
    window: int = 3,
) -> DataFrame:
    """Candidate pairs ``(a_id, b_id, a_key, b_key, rank_gap)`` for all
    record pairs within ``window`` positions of the key-sorted order.

    Ties in ``key_col`` break on ``id_col``, so the output is a pure
    function of the input set. ``a`` is always the earlier row in sort
    order; ``rank_gap`` ∈ [1, window−1].
    """
    if window < 2:
        raise ValueError("window must be >= 2")
    ranked = global_rank(
        records.select(
            F.col(id_col).alias("rid"), F.col(key_col).alias("rkey")
        ),
        ["rkey", "rid"],
    )
    a = ranked.select(
        F.col("rid").alias("a_id"),
        F.col("rkey").alias("a_key"),
        F.col("rank").alias("a_rank"),
        F.explode(F.sequence(F.lit(1), F.lit(window - 1))).alias("gap"),
    ).withColumn("b_rank", F.col("a_rank") + F.col("gap"))
    b = ranked.select(
        F.col("rid").alias("b_id"),
        F.col("rkey").alias("b_key"),
        F.col("rank").alias("b_rank"),
    )
    return a.join(b, "b_rank").select(
        "a_id", "b_id", "a_key", "b_key", F.col("gap").alias("rank_gap")
    )


def ifp_candidates(
    triples: DataFrame,
    ifp_preds: list[str],
    max_group: int = 50,
) -> DataFrame:
    """sameAs candidates from inverse-functional predicates.

    If ``pred`` is inverse-functional (an email, an ISBN, a profile url),
    two subjects sharing the same ``(pred, obj)`` denote the same entity —
    the classic web-data identity heuristic. Emits each unordered subject
    pair once: ``(a, b, pred, obj)`` with ``a < b``, DISTINCT.

    Scale shape: group sizes are counted first and keys with more than
    ``max_group`` subjects are *purged* before the pair join (the standard
    blocking-purge step — a hot key like an empty-string email would
    otherwise fan out |group|² pairs). The join is then a self-equi-join
    on (pred, obj) with per-key work bounded by ``max_group``².
    """
    t = (
        triples.filter(
            F.col("pred").isin(*ifp_preds) & (F.col("obj") != "")
        )
        .select("subj", "pred", "obj")
        .distinct()
    )
    sizes = t.groupBy("pred", "obj").agg(F.count("*").alias("_n"))
    kept = t.join(
        sizes.filter(F.col("_n") <= max_group).select("pred", "obj"),
        ["pred", "obj"],
    )
    a = kept.select("pred", "obj", F.col("subj").alias("a"))
    b = kept.select("pred", "obj", F.col("subj").alias("b"))
    return (
        a.join(b, ["pred", "obj"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "pred", "obj")
        .distinct()
    )
