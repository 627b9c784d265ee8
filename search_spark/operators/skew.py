"""Explicit skew handling: two-phase (salted) aggregation.

The north rule demands explicit skew handling for head entities. AQE's
skew-join splitting covers joins; for *aggregations* over heavily skewed
keys (a head entity holding 40% of all mentions — datagen.HEAD_ENTITIES),
the classic remedy is salting: shard each hot key across ``n_salt``
partial groups, aggregate the shards in parallel, then merge the partials.
Both phases are map-side-combinable hash aggregations, so the first shuffle
moves only ``n_keys × n_salt`` partial rows instead of routing every row of
a hot key to one reducer.

Reference analogue: none (the reference's per-article work units are
uniform, SURVEY.md §4 "Data partitioning"); this is the scale piece the
north rule adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_N_SALT = 16


def salted_count_sum(
    df: DataFrame,
    key_cols: list[str],
    value_col: str | None = None,
    salt_source: str | Column | None = None,
    n_salt: int = DEFAULT_N_SALT,
) -> DataFrame:
    """Skew-proof ``groupBy(key).agg(count, sum(value))``.

    Parameters
    ----------
    key_cols
        Grouping keys (potentially heavily skewed).
    value_col
        Optional numeric column; when given, the output carries
        ``sum_value`` next to ``n_rows``.
    salt_source
        Column whose hash spreads a hot key's rows across salts. Defaults
        to ``rand()``-free deterministic spreading over all columns via
        ``spark_partition_id`` — pass a unique id column for a stable,
        input-deterministic salt (recommended).
    n_salt
        Shards per key. ``n_keys × n_salt`` partial rows flow through the
        final shuffle — keep it ≪ rows-per-hot-key.
    """
    if salt_source is None:
        salt = F.spark_partition_id() % n_salt
    else:
        src = F.col(salt_source) if isinstance(salt_source, str) else salt_source
        salt = F.pmod(F.xxhash64(src), F.lit(n_salt))

    partial_aggs = [F.count(F.lit(1)).alias("_n")]
    if value_col is not None:
        partial_aggs.append(F.sum(value_col).alias("_s"))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(*partial_aggs)
    )

    final_aggs = [F.sum("_n").alias("n_rows")]
    if value_col is not None:
        final_aggs.append(F.sum("_s").alias("sum_value"))
    return partial.groupBy(*key_cols).agg(*final_aggs)


def salted_equi_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    n_salt: int = DEFAULT_N_SALT,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join of a head-skewed probe stream against a
    unique-per-key build table too big to broadcast.

    The shuffled-join failure mode for head entities: every probe row
    carrying the hot key hashes to ONE reducer, so the join runs at the
    speed of its worst key. AQE's skew-join splitting
    (``OptimizeSkewedJoin``) fixes this at runtime by splitting the
    oversized probe partition and replicating the matching build
    partition — when it fires. This operator is the explicit,
    plan-guaranteed form of the same trade for the joins where a
    straggler is not acceptable (the canonicalization mapping join on a
    web-scale vocabulary — north rule: "salted, url-hash-partitioned
    ... explicit skew handling for head entities"):

    * probe rows get a uniform salt in ``[0, n_salt)`` (hash of a
      per-row id — which rows share a salt never affects the result),
    * the build side replicates ``n_salt``× via ``explode`` (the same
      replication OptimizeSkewedJoin performs, paid explicitly),
    * the join key becomes ``(on, _salt)``, so a hot key's rows spread
      over ``n_salt`` reducers.

    ``build`` must be unique per ``on`` (a mapping/dimension table —
    duplicates would duplicate probe rows, same as any equi-join).
    ``how`` supports ``inner``/``left``. Cost: build-side shuffle bytes
    ×``n_salt`` — keep ``n_salt`` at tens, sized to the straggler ratio,
    not hundreds.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_equi_join: unsupported how={how!r}")
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salt))
    salted_probe = probe.withColumn("_salt", salt)
    replicated = build.withColumn(
        "_salt",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.lit(n_salt - 1).cast("long"))
        ),
    )
    return salted_probe.join(
        replicated, on=[on, "_salt"], how=how
    ).drop("_salt")
