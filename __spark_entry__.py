"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship knowledge-graph pipeline (synthetic
web_pages → extract → segment → NER → relations → link → canonicalize →
triples). ``queries()`` / ``oracle_sql()`` expose the operator registry in
``search_spark/queries.py`` — each Spark implementation sits next to its
DuckDB oracle SQL there.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG-construction pipeline on a deterministic synthetic
    corpus (the documents/embeddings testdata parquet feeds the oracle
    queries; the KG pipeline's authoritative input shape is web_pages —
    BASELINE.json input_hint)."""
    from search_spark import datagen
    from search_spark.pipeline import PipelineConfig, build_triples

    pages = datagen.generate_web_pages(spark, 60, seed=42)
    return build_triples(spark, pages, PipelineConfig())


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from search_spark.queries import QUERIES

    return {name: q.spark for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from search_spark.queries import QUERIES

    return {name: q.sql for name, q in QUERIES.items() if q.sql is not None}
