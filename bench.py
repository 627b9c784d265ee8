"""Benchmark harness (driver contract).

Times every registry query from ``search_spark.queries`` at
``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) on
``local[$SPARK_GRAFT_CPUS]`` plus the flagship KG-construction pipeline
(synthetic web_pages corpus — BASELINE.json input_hint shape), and prints
ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall-seconds of the headline suite; ``extras``
carries the north-rule throughput numbers (triples/sec, docs/sec,
mentions/doc). Each query executes end-to-end via the ``noop`` sink (full
plan runs, nothing collected to the driver).

Each timing is **min-of-$SPARK_GRAFT_BENCH_REPS** (default 3): this
sandbox is a shared-host VM whose neighbors impose 1.5-4× run-to-run
interference (measured: an idle-repo suite run varies 74 s ↔ 144 s with
zero code change purely by wall-clock window), and the minimum is the
standard noise-robust location estimator for benchmark latencies. The
per-query rep walls are recorded under ``extras.rep_walls`` so the
single-number summary stays auditable.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

# KG-pipeline bench corpus size (docs). Small enough for per-round driver
# runs, large enough that per-stage fixed costs do not dominate.
N_BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "2000"))

# min-of-k reps per query (shared-host interference robustness)
N_REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))


def _run_to_noop(df) -> int:
    """Execute the full plan without driver-side materialization."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None

    from search_spark.queries import QUERIES
    from search_spark.session import get_spark

    spark = get_spark(
        "bench",
        master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": cpus},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Session warmup (untimed): spin up executors, whole-stage codegen,
    # the python-worker daemon and the parquet reader once, so the first
    # timed query measures the query rather than session fixed costs.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.limit(64).mapInPandas(lambda it: it, docs.schema).write.format(
        "noop"
    ).mode("overwrite").save()

    timings: dict[str, float] = {}
    rep_walls: dict[str, list[float]] = {}
    for name, q in QUERIES.items():
        walls = []
        for _ in range(N_REPS):
            t0 = time.time()
            _run_to_noop(q.spark(spark, sf_dir))
            walls.append(round(time.time() - t0, 3))
            # queries that cache/persist (kg_property_path's triples,
            # column_types' cell checkpoint) must not leak blocks into
            # later measurements: Spark's cache manager matches by plan
            # equality, so an identical subtree in a LATER query would
            # silently read this query's cache — timings stay independent
            # only if the cache is dropped between runs
            spark.catalog.clearCache()
        timings[name] = min(walls)
        rep_walls[name] = walls

    # flagship KG pipeline throughput (the BASELINE.json metric)
    from search_spark import datagen
    from search_spark.pipeline import PipelineConfig, build_triples
    from pyspark.sql import functions as F

    pages = datagen.generate_web_pages(spark, N_BENCH_DOCS, seed=42)
    walls = []
    for _ in range(N_REPS):
        t0 = time.time()
        triples = build_triples(spark, pages, PipelineConfig())
        n_triples = triples.count()
        walls.append(round(time.time() - t0, 3))
    kg_wall = min(walls)
    timings["kg_pipeline"] = kg_wall
    rep_walls["kg_pipeline"] = walls
    n_mentions = None
    try:
        n_mentions = triples.filter(F.col("pred") == "has_type").count()
    except Exception:  # noqa: BLE001 — extras only; never fail the bench
        pass

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "extras": {
            "cpus": int(cpus),
            "reps": N_REPS,
            "rep_walls": rep_walls,
            "kg_n_docs": N_BENCH_DOCS,
            "kg_n_triples": n_triples,
            "kg_wall_sec": round(kg_wall, 3),
            "docs_per_sec": round(N_BENCH_DOCS / kg_wall, 2),
            "triples_per_sec": round(n_triples / kg_wall, 2),
            "mentions_per_doc": (
                round(n_mentions / N_BENCH_DOCS, 3) if n_mentions else None
            ),
        },
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
