"""SHACL-lite shape validation over the triple table.

A KG constructor needs constraint checking before triples ship: are the
edges well-typed (domain/range), are cardinalities sane, do literal
objects match their expected format? SHACL's core constraint kinds map
onto relational plans directly, so validation is a union of small
DataFrame queries — each shape one anti-join or one aggregate, never a
row-at-a-time rule engine.

Shape kinds (each yields violation rows ``(shape, node, detail)``):

* ``domain`` — every subject of ``pred`` must have ``(s, type_pred, cls)``:
  distinct subjects anti-joined against the typed set.
* ``range`` — same for objects of ``pred``.
* ``min_count`` / ``max_count`` — nodes typed ``cls`` must have between
  ``lo`` and ``hi`` distinct ``pred`` edges: one partial-aggregated count
  per focus node, left-joined so missing edges count as zero.
* ``pattern`` — objects of ``pred`` must match ``regex``: a plain codegen
  ``rlike`` filter.

All joins key on the focus node (hash-partitioned); the typed set used by
domain/range checks is vocabulary-sized, so AQE broadcasts it when it
fits — the same gate discipline as the pipeline's vocabulary joins.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_VIOLATION_SCHEMA = "shape string, node string, detail string"


@dataclass(frozen=True)
class Shape:
    """One constraint. ``kind`` ∈ domain|range|min_count|max_count|pattern."""

    name: str
    kind: str
    pred: str
    cls: str | None = None     # domain/range: required type; counts: focus type
    lo: int | None = None      # min_count
    hi: int | None = None      # max_count
    regex: str | None = None   # pattern
    type_pred: str = "has_type"


def _typed_nodes(t: DataFrame, shape: Shape) -> DataFrame:
    return (
        t.filter(
            (F.col("pred") == shape.type_pred) & (F.col("obj") == shape.cls)
        )
        .select(F.col("subj").alias("node"))
        .distinct()
    )


def _violations(t: DataFrame, shape: Shape) -> DataFrame:
    edge = t.filter(F.col("pred") == shape.pred)
    if shape.kind in ("domain", "range"):
        side = "subj" if shape.kind == "domain" else "obj"
        return (
            edge.select(F.col(side).alias("node"))
            .distinct()
            .join(_typed_nodes(t, shape), on="node", how="left_anti")
            .select(
                F.lit(shape.name).alias("shape"),
                "node",
                F.lit(f"missing {shape.type_pred} {shape.cls}").alias(
                    "detail"
                ),
            )
        )
    if shape.kind in ("min_count", "max_count"):
        counts = (
            edge.select(F.col("subj").alias("node"), "obj")
            .distinct()
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        focus = _typed_nodes(t, shape).join(counts, on="node", how="left")
        n = F.coalesce(F.col("n"), F.lit(0))
        if shape.kind == "min_count":
            bad = focus.filter(n < shape.lo)
        else:
            bad = focus.filter(n > shape.hi)
        return bad.select(
            F.lit(shape.name).alias("shape"),
            "node",
            F.concat(F.lit(f"{shape.pred} count "), n.cast("string")).alias(
                "detail"
            ),
        )
    if shape.kind == "pattern":
        return (
            edge.filter(~F.col("obj").rlike(shape.regex))
            .select(
                F.lit(shape.name).alias("shape"),
                F.col("subj").alias("node"),
                F.concat(F.lit("bad value "), F.col("obj")).alias("detail"),
            )
            .distinct()
        )
    raise ValueError(f"unknown shape kind: {shape.kind!r}")


def validate_shapes(triples: DataFrame, shapes: list[Shape]) -> DataFrame:
    """Validate every shape; return the union of violation rows.

    Empty result = the KG conforms. ``triples`` needs ``subj, pred, obj``
    (set semantics — provenance duplicates are collapsed per shape).
    """
    if not shapes:
        raise ValueError("no shapes to validate")
    # pin: every shape scans the triple set once or twice (edge side +
    # typed side) — uncached, a derived input's lineage re-executes per
    # scan. The set is KG-sized; Spark spills it.
    t = triples.select("subj", "pred", "obj").cache()
    out = None
    for shape in shapes:
        v = _violations(t, shape)
        out = v if out is None else out.unionByName(v)
    return out
