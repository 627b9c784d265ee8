"""Deterministic sampling and dataset splitting.

A training-data pipeline needs its train/holdout split and its corpus
subsamples to be *reproducible functions of the row key*, not of Spark's
partition-dependent RNG: ``df.sample()`` changes membership when the
partitioning changes, which silently leaks holdout documents into
training between runs. Both operators here key every decision off an MD5
of the row key, so membership is stable across runs, cluster sizes, and
engines (the DuckDB oracles compute the identical buckets).

* :func:`hash_split` — assign each row to a named split by comparing a
  hex prefix of ``md5(key)`` against cumulative thresholds. Pure
  projection: no shuffle, no UDF, pushes down with the scan.
* :func:`stratified_sample` — per-stratum top-k by ``md5(key)`` order
  (deterministic quota sampling, e.g. "≤ k docs per language"). One
  shuffle on the stratum key; the per-group ``row_number`` window is the
  standard distributed quota plan and the rank order is hash-uniform, so
  hot strata spread evenly across the hash space rather than biasing
  toward any natural ordering.

At web scale both are safe by construction: ``hash_split`` is stateless
per row, and ``stratified_sample``'s window partitions by stratum — a
skewed stratum is one sort partition, which AQE splits if oversized; the
output is bounded at ``k`` rows per stratum regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hex_prefix(key: Column, n_hex: int) -> Column:
    return F.substring(F.md5(key.cast("string")), 1, n_hex)


def hash_split(
    df: DataFrame,
    key: str | Column,
    splits: dict[str, float],
    split_col: str = "split",
    n_hex: int = 4,
) -> DataFrame:
    """Assign a stable named split per row from ``md5(key)``.

    ``splits`` maps name → fraction (must sum to ≤ 1; any remainder goes
    to the last split). Fractions are quantized to the ``16**n_hex``
    hash buckets, so the realized proportions are exact over the hash
    space and membership never depends on partitioning or run order.
    """
    if not splits:
        raise ValueError("splits must name at least one split")
    total = sum(splits.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {total} > 1")
    space = 16 ** n_hex
    key_col = F.col(key) if isinstance(key, str) else key
    prefix = _hex_prefix(key_col, n_hex)
    names = list(splits)
    expr = None
    cum = 0.0
    for name in names[:-1]:
        cum += splits[name]
        # lexicographic compare of fixed-width hex == numeric compare
        bound = format(min(space, round(cum * space)), f"0{n_hex}x")
        cond = prefix < F.lit(bound)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, out)


def stratified_sample(
    df: DataFrame,
    stratum: str | Column,
    key: str | Column,
    k: int,
    n_hex: int = 8,
) -> DataFrame:
    """Deterministic quota sample: the ``k`` rows of each stratum whose
    ``md5(key)`` sorts first (ties broken by the key itself, so the
    result is a pure function of the data)."""
    if k <= 0:
        raise ValueError("k must be positive")
    stratum_col = F.col(stratum) if isinstance(stratum, str) else stratum
    key_col = F.col(key) if isinstance(key, str) else key
    w = Window.partitionBy(stratum_col).orderBy(
        _hex_prefix(key_col, n_hex), key_col.cast("string")
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def weighted_sample(
    df: DataFrame,
    key: str | Column,
    prob: Column,
    n_hex: int = 8,
) -> DataFrame:
    """Per-row Bernoulli sample with row-specific acceptance probability,
    derandomized: keep a row iff ``uniform(key) < prob`` where
    ``uniform(key)`` is the first ``n_hex`` hex digits of ``md5(key)``
    mapped to [0, 1).

    This is the quality-weighted subsampling step of web-corpus pipelines
    (keep high-quality documents with probability ~1, boilerplate with
    probability ~p) made reproducible: membership is a pure function of
    the row key and the probability column, stable across runs, cluster
    sizes, and engines. ``prob`` is clamped to [0, 1]. Pure projection —
    no shuffle, no UDF; the filter pushes down with the scan.
    """
    key_col = F.col(key) if isinstance(key, str) else key
    space = float(16 ** n_hex)
    u = F.conv(_hex_prefix(key_col, n_hex), 16, 10).cast("double") / space
    p = F.least(F.lit(1.0), F.greatest(F.lit(0.0), prob))
    return df.filter(u < p)


def global_index(
    df: DataFrame, col: str, num_partitions: int | None = None
) -> DataFrame:
    """Dense 0-based index of the distinct values of ``col`` in sorted
    order — ``ROW_NUMBER() OVER (ORDER BY col) - 1`` without a
    single-partition sort.

    Two-phase (the standard distributed global-rank recipe): range-
    partition + sort locally, rank within each partition, then add the
    exclusive prefix of partition counts (a partition-count-sized table,
    broadcast back). The result depends only on the total order of the
    values, not on where the sampled range boundaries land, so it is
    deterministic across runs and cluster sizes. Returns
    ``(col, idx)``.
    """
    n_parts = (
        num_partitions or df.sparkSession.sparkContext.defaultParallelism
    )
    e = (
        df.select(col)
        .distinct()
        .repartitionByRange(n_parts, col)
        .sortWithinPartitions(col)
        .withColumn("__pid", F.spark_partition_id())
        # materialize: the range shuffle samples its boundaries per
        # exchange instance, and this subtree feeds BOTH the rank branch
        # and the offsets branch — without pinning it, correctness would
        # silently depend on Spark's exchange-reuse optimization keeping
        # the two instances identical
        .localCheckpoint(eager=True)
    )
    local = e.withColumn(
        "__rn",
        F.row_number().over(Window.partitionBy("__pid").orderBy(col)),
    )
    counts = e.groupBy("__pid").agg(F.count(F.lit(1)).alias("__c"))
    offsets = counts.withColumn(
        "__off",
        F.coalesce(
            F.sum("__c").over(
                Window.orderBy("__pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("__pid", "__off")
    return (
        local.join(F.broadcast(offsets), on="__pid")
        .select(
            col,
            (F.col("__rn") - 1 + F.col("__off"))
            .cast("bigint")
            .alias("idx"),
        )
    )


NEG_SEP = "\x1f"  # unit separator: cannot appear in entity/pred tokens


def negative_samples(
    triples: DataFrame, k: int = 4, num_partitions: int | None = None
) -> DataFrame:
    """KG-embedding training negatives: ``k`` corrupted-tail triples per
    true ``(subj, pred, obj)``, TransE-style.

    Replacement entities are drawn deterministically — the md5 of the
    triple plus the sample index, modulo the entity count, looked up in
    the :func:`global_index` of the entity vocabulary — so every run,
    partitioning, and engine draws identical negatives (the DuckDB
    oracle replays the same arithmetic). Corruptions that hit the true
    tail are dropped, and an anti-join removes any sampled triple that
    happens to be a real fact elsewhere in the KG (the standard
    "filtered negatives" protocol). Returns
    ``(subj, pred, obj_neg, sample_i)``.

    Scale shape: the entity index is vocabulary-sized (two-phase global
    rank, never a single-partition sort); the candidate join on ``idx``
    is broadcast-eligible under AQE; the anti-join shuffles on the
    triple key only.
    """
    # cache: the distinct triple set feeds THREE consumers (the entity
    # index, the candidate expansion, and the filtered-negatives
    # anti-join) and the entity index two (lookup join + count) — without
    # pinning, the upstream extraction lineage executes once per
    # consumer. It is the algorithm's working set; Spark spills it.
    t = triples.select("subj", "pred", "obj").distinct().cache()
    ents = global_index(
        t.select(F.col("subj").alias("entity")).unionByName(
            t.select(F.col("obj").alias("entity"))
        ),
        "entity",
        num_partitions,
    ).cache()
    n = ents.agg(F.count(F.lit(1)).alias("__n"))
    expanded = t.withColumn(
        "sample_i", F.explode(F.sequence(F.lit(0), F.lit(k - 1)))
    ).crossJoin(F.broadcast(n))
    target = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    NEG_SEP,
                    F.col("subj"),
                    F.col("pred"),
                    F.col("obj"),
                    F.col("sample_i").cast("string"),
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("bigint") % F.col("__n")
    candidates = (
        expanded.withColumn("idx", target)
        .join(ents, on="idx")
        .filter(F.col("entity") != F.col("obj"))
        .select(
            "subj",
            "pred",
            F.col("entity").alias("obj_neg"),
            "sample_i",
        )
    )
    return candidates.join(
        t.select(
            "subj", "pred", F.col("obj").alias("obj_neg")
        ),
        on=["subj", "pred", "obj_neg"],
        how="left_anti",
    )
