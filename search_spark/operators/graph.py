"""Graph analytics over the materialized triple table.

The reference stops at materializing ``(subj, pred, obj, prov)`` rows into
the mining cache (``database/mining_cache.py``); any downstream analysis
happens ad hoc in notebooks. A KG constructor at web scale needs the first
round of graph diagnostics to be engine-native — hub detection (degree),
global importance (PageRank), and neighborhood expansion (two-hop) — so
they are implemented here as pure DataFrame compositions:

* :func:`entity_degrees` — one shuffle per direction, map-side partial
  aggregation absorbs head-entity skew (the hot keys are exactly the hub
  entities this query exists to find).
* :func:`pagerank` — the classic iterative rank computation expressed as a
  per-iteration join-aggregate plan; lineage is truncated with
  ``localCheckpoint`` each round (same discipline as the large-star/
  small-star connected-components loop in ``canonicalize.py``). Dangling
  mass is carried as a 1-row aggregate broadcast into the rank update —
  no scalar ever round-trips through the driver.
* :func:`two_hop` — edge-table self-join on the hop key; the join shuffles
  on ``dst``/``src`` (hash-partitioned co-location) and the path-count
  aggregation partial-combines before the final shuffle.

At 10^12-document scale the edge table is huge but these plans keep the
right shape: degree and path counts are partial-aggregated, PageRank's
per-iteration state is one row per *entity* (vocabulary-sized, far smaller
than the edge table), and the only broadcast is the 1-row dangling-mass
aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def entity_degrees(edges: DataFrame) -> DataFrame:
    """Weighted in/out degree + distinct-neighbor counts per entity.

    ``edges`` is the relation-instance table (one row per extracted
    relation, column ``src``/``dst``): counts are provenance-weighted,
    ``*_neighbors`` collapse to the distinct adjacent vertex set.
    """
    out = edges.groupBy(F.col("src").alias("entity")).agg(
        F.count(F.lit(1)).alias("out_edges"),
        F.countDistinct("dst").alias("out_neighbors"),
    )
    in_ = edges.groupBy(F.col("dst").alias("entity")).agg(
        F.count(F.lit(1)).alias("in_edges"),
        F.countDistinct("src").alias("in_neighbors"),
    )
    return (
        out.join(in_, on="entity", how="full")
        .fillna(0, ["out_edges", "out_neighbors", "in_edges", "in_neighbors"])
    )


# below this many distinct edges the graph collects to the driver — the
# same adaptive principle as connected_components' union-find fallback
# (canonicalize.py): entity vocabularies are usually tiny even when the
# corpus is not, and 10 driver-loop rounds of Spark jobs cost far more
# than a numpy power iteration on a small graph
LOCAL_PR_THRESHOLD = 100_000

# iteration state is one (entity, rank) row ≈ 64 B Tungsten-encoded;
# ~2M rows per partition keeps each state partition near 128 MB
STATE_ROWS_PER_PARTITION = 2_000_000

_PR_SCHEMA = "entity string, rank double"


def pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 1,
    local_threshold: int = LOCAL_PR_THRESHOLD,
) -> DataFrame:
    """PageRank over the distinct edge set of ``(src, dst)`` rows.

    Standard formulation with uniform teleport and dangling-mass
    redistribution::

        rank'(v) = (1-d)/N + d * (Σ_{u→v} rank(u)/outdeg(u) + D/N)

    where ``D`` is the total rank held by dangling vertices (no
    out-edges). Ranks always sum to 1. Returns ``(entity, rank)``.

    Edge sets at or below ``local_threshold`` skip the iterative loop and
    power-iterate on the driver (identical math, double precision); set
    ``0`` to force the distributed path. Distributed: the per-iteration
    state is one double per vertex — vocabulary-sized, far smaller than
    the edge table — partitioned by :data:`STATE_ROWS_PER_PARTITION` and
    size-gate-broadcast (``joins.maybe_broadcast``) into the contribution
    join so the *edge table never reshuffles* when the state fits the
    session's broadcast threshold. The dangling total is a 1-row
    aggregate joined via broadcast-nested-loop; lineage is truncated with
    ``localCheckpoint`` every ``checkpoint_every`` rounds. Nothing except
    the O(1) vocabulary count crosses the driver.
    """
    from search_spark.joins import maybe_broadcast

    spark = edges.sparkSession
    e = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    n_edges = e.count()
    if n_edges == 0:
        return spark.createDataFrame([], schema=_PR_SCHEMA)
    if n_edges <= local_threshold:
        return _pagerank_local(spark, e.collect(), n_iter, damping)

    nodes = (
        e.select(F.col("src").alias("entity"))
        .unionByName(e.select(F.col("dst").alias("entity")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()  # also materializes the persist
    state_parts = max(1, -(-n_nodes // STATE_ROWS_PER_PARTITION))
    outdeg = e.groupBy(F.col("src").alias("entity")).agg(
        F.count(F.lit(1)).alias("od")
    )
    # (src, dst, od): out-degree denormalized onto the edge once, up front
    e_od = (
        e.join(
            maybe_broadcast(
                outdeg.withColumnRenamed("entity", "src"), n_nodes
            ),
            on="src",
        ).persist()
    )
    e_od.count()

    ranks = nodes.repartition(state_parts, "entity").withColumn(
        "rank", F.lit(1.0 / n_nodes)
    )
    has_out = outdeg.select("entity")
    for i in range(n_iter):
        contrib = (
            e_od.join(
                maybe_broadcast(ranks, n_nodes),
                e_od["src"] == ranks["entity"],
            )
            .select("dst", (F.col("rank") / F.col("od")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        dangling = (
            ranks.join(
                maybe_broadcast(has_out, n_nodes),
                on="entity",
                how="left_anti",
            )
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dmass"))
        )
        ranks = (
            nodes.join(
                maybe_broadcast(
                    contrib.withColumnRenamed("dst", "entity"), n_nodes
                ),
                on="entity",
                how="left",
            )
            .crossJoin(F.broadcast(dangling))
            .select(
                "entity",
                (
                    F.lit((1.0 - damping) / n_nodes)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("dmass") / n_nodes
                    )
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def _pagerank_local(spark, edge_rows, n_iter: int, damping: float):
    """Driver power iteration — same math as the distributed loop."""
    import numpy as np

    pairs = [(r["src"], r["dst"]) for r in edge_rows]
    names = sorted({u for u, _ in pairs} | {v for _, v in pairs})
    idx = {n: i for i, n in enumerate(names)}
    n = len(names)
    out = np.zeros(n)
    for u, _ in pairs:
        out[idx[u]] += 1.0
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        nxt = np.full(n, (1.0 - damping) / n)
        nxt += damping * r[out == 0.0].sum() / n
        for u, v in pairs:
            nxt[idx[v]] += damping * r[idx[u]] / out[idx[u]]
        r = nxt
    return spark.createDataFrame(
        [(name, float(r[idx[name]])) for name in names], schema=_PR_SCHEMA
    )


def two_hop(edges: DataFrame) -> DataFrame:
    """Distinct-edge two-hop reachability with path counts.

    Self-join of the distinct edge set on the hop vertex; rows with
    ``src == dst`` (cycles back to the origin) are excluded, matching the
    usual neighborhood semantics. Returns ``(src, dst, n_paths)``.
    """
    e = edges.select("src", "dst").distinct()
    hop1 = e.select(F.col("src"), F.col("dst").alias("mid"))
    hop2 = e.select(F.col("src").alias("mid"), F.col("dst"))
    return (
        hop1.join(hop2, on="mid")
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n_paths"))
    )
