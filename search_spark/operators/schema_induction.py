"""Predicate schema induction over extracted triples.

Structured extraction from the open web (webtables.py, jsonld.py) yields
string-typed objects with no schema; downstream consumers (SHACL shapes,
typed Iceberg columns, unit-aware fusion) need per-predicate datatypes.
This induces them the WebTables way: classify every object value by
lexical shape, then take the per-predicate majority with an exact-integer
agreement score — a predicate whose values are 98% decimal is a decimal
column with a few extraction errors; one at 55% is genuinely mixed and
stays text.

All codegen: the shape classifier is a ``CASE``/``rlike`` chain, the
majority is two hash aggregations plus the portable two-step argmax
(max count per pred, then lexicographic-min type at that count — ties are
explicit, not engine-dependent), agreement ships as exact ppm.  Skew-safe
by construction: both aggregations partial-combine map-side, and the key
space is (predicate × 5 types).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# classification order matters only for documentation — the patterns are
# mutually exclusive; everything unmatched is text
_SHAPES = [
    ("integer", r"^-?\d+$"),
    ("decimal", r"^-?\d+\.\d+$"),
    ("date", r"^\d{4}-\d{2}-\d{2}$"),
    ("url", r"^https?://"),
]


def value_type_col(obj: str | Column) -> Column:
    c = F.col(obj) if isinstance(obj, str) else obj
    expr = F.lit("text")
    for name, pattern in reversed(_SHAPES):
        expr = F.when(c.rlike(pattern), F.lit(name)).otherwise(expr)
    return expr


def induce_predicate_types(triples: DataFrame) -> DataFrame:
    """``(pred, inferred_type, n_majority, n_values, agreement_ppm)``.

    ``inferred_type`` is the most frequent lexical shape of the
    predicate's object values (lexicographic-min shape on ties);
    ``agreement_ppm = n_majority * 1e6 div n_values``.
    """
    typed = triples.select("pred", value_type_col("obj").alias("vtype"))
    counts = typed.groupBy("pred", "vtype").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.groupBy("pred").agg(F.sum("n").alias("n_values"))
    best = (
        counts.groupBy("pred")
        .agg(F.max("n").alias("n"))
        .join(counts, ["pred", "n"])
        .groupBy("pred", "n")
        .agg(F.min("vtype").alias("inferred_type"))
    )
    return best.join(totals, "pred").select(
        "pred",
        "inferred_type",
        F.col("n").cast("long").alias("n_majority"),
        F.col("n_values").cast("long").alias("n_values"),
        F.floor(F.col("n") * F.lit(1_000_000) / F.col("n_values"))
        .cast("long")
        .alias("agreement_ppm"),
    )
