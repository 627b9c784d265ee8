"""Knowledge fusion: reconcile triples extracted by independent sources.

A web-scale KG constructor extracts the same facts through several
independent paths — running-text NER/RE (pipeline.py), web tables
(webtables.py), JSON-LD markup (jsonld.py), anchor-text aliases
(linkgraph.py).  Fusion unions them with provenance, scores each candidate
``(subj, pred, obj)`` by cross-source agreement, and — for functional
predicates where one true value is expected — resolves conflicts by the
knowledge-fusion recipe (Dong et al., "From Data Fusion to Knowledge
Fusion", VLDB 2014): more independent sources beat more repetitions beat
higher-priority extractors, with a deterministic final tie-break.

Everything is hash aggregation + one equi-join:

* :func:`fuse` — ``unionByName`` + one groupBy on ``(subj, pred, obj)``
  with map-side partial aggregation; the per-source priority is a codegen
  ``CASE`` chain (no dimension table needed for a handful of extractors).
* :func:`resolve_functional` — the argmax is encoded as one exact-integer
  rank (``n_sources``, ``n_prov``, inverted priority, lexicographic
  tie-break) and picked with the portable two-step (max rank per
  ``(subj, pred)``, then min obj at that rank), so the DuckDB oracle
  traces it exactly — no float scores, no struct-comparison semantics.

Skew: hot subjects (head entities) spread across their predicates and
objects in the evidence aggregation; the resolution join keys on
``(subj, pred)`` whose fan-in is the number of *distinct conflicting
values*, small by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# rank components: counts are clipped into fixed-width fields so the
# combined rank stays an exact 64-bit integer
_FIELD = 1_000_000
_PRIO_FIELD = 1_000


def fuse(sources: list[tuple[str, DataFrame]]) -> DataFrame:
    """Union ``(name, triples)`` pairs into one evidence table.

    Returns one row per distinct ``(subj, pred, obj)`` with ``n_prov``
    (total supporting extractions) and ``n_sources`` (distinct extractors
    that produced it).
    """
    tagged = [
        df.select("subj", "pred", "obj", F.lit(name).alias("source"))
        for name, df in sources
    ]
    all_rows = tagged[0]
    for t in tagged[1:]:
        all_rows = all_rows.unionByName(t)
    return all_rows.groupBy("subj", "pred", "obj").agg(
        F.count(F.lit(1)).alias("n_prov"),
        F.countDistinct("source").alias("n_sources"),
        F.min(
            # priority = position in the sources list (0 = most trusted)
            _priority_expr([name for name, _ in sources])
        ).alias("priority"),
    )


def _priority_expr(names: list[str]):
    expr = F.lit(len(names))
    for rank, name in enumerate(reversed(names)):
        expr = F.when(
            F.col("source") == name, F.lit(len(names) - 1 - rank)
        ).otherwise(expr)
    return expr


def resolve_functional(evidence: DataFrame) -> DataFrame:
    """One winning obj per ``(subj, pred)``: most sources, then most
    provenance, then best (lowest) priority, then lexicographic-min obj."""
    # pin: ranked feeds both the per-key max aggregate and the join back
    # onto it — uncached, the upstream extraction (e.g. the Arrow
    # web-table walk) runs twice. Evidence is (subj, pred, obj)-distinct
    # sized (the KG itself); Spark spills it.
    ranked = evidence.withColumn(
        "rank",
        (
            F.least(F.col("n_sources"), F.lit(_FIELD - 1))
            * F.lit(_FIELD * _PRIO_FIELD)
            + F.least(F.col("n_prov"), F.lit(_FIELD - 1)) * F.lit(_PRIO_FIELD)
            + (F.lit(_PRIO_FIELD - 1) - F.least(F.col("priority"),
                                                F.lit(_PRIO_FIELD - 1)))
        ).cast("long"),
    ).cache()
    best = ranked.groupBy("subj", "pred").agg(F.max("rank").alias("rank"))
    return (
        ranked.join(best, ["subj", "pred", "rank"])
        .groupBy("subj", "pred", "rank", "n_sources", "n_prov")
        .agg(F.min("obj").alias("obj"))
        .select(
            "subj",
            "pred",
            "obj",
            F.col("n_sources").cast("long").alias("n_sources"),
            F.col("n_prov").cast("long").alias("n_prov"),
        )
    )


def fuse_and_resolve(sources: list[tuple[str, DataFrame]]) -> DataFrame:
    """End-to-end: evidence union → functional resolution."""
    return resolve_functional(fuse(sources))
