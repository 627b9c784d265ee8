"""Subprocess worker for the scaling bench: run the KG pipeline once at a
given parallelism and print one JSON line.

Usage: python tools/scaling_worker.py <cpus> <n_docs>

A short warmup run (JIT/codegen/python-worker spin-up) precedes the timed
run so the measurement reflects steady-state compute, not JVM warmup —
the quantity the north rule's scaling criterion is about.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    cpus = int(sys.argv[1])
    n_docs = int(sys.argv[2])

    from search_spark import datagen
    from search_spark.pipeline import PipelineConfig, build_triples
    from search_spark.session import get_spark

    spark = get_spark(
        f"scaling-{cpus}",
        master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": str(cpus)},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warmup (small corpus, different seed so no cached data is reused)
    warm = datagen.generate_web_pages(spark, 200, seed=7)
    build_triples(spark, warm, PipelineConfig()).count()
    spark.catalog.clearCache()

    pages = datagen.generate_web_pages(spark, n_docs, seed=42)
    t0 = time.time()
    n_triples = build_triples(spark, pages, PipelineConfig()).count()
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "cpus": cpus,
                "n_docs": n_docs,
                "n_triples": n_triples,
                "wall_sec": round(wall, 3),
                "docs_per_sec": round(n_docs / wall, 2),
                "triples_per_sec": round(n_triples / wall, 2),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
