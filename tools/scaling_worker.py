"""Subprocess worker for the scaling bench: run the KG pipeline at a given
parallelism on two corpus sizes and print one JSON line.

Usage: python tools/scaling_worker.py <cpus> <n_small> <n_large>

Measurement design:
  * The corpus is read from parquet — the input_hint shape (a table scan),
    not an in-job generator UDF. Corpora use realistic document sizes
    (8-12 paragraphs) so per-document parse/NER work resembles real pages.
  * The pipeline runs with ``ner_scoring=True`` — the batched model pass
    over sentence windows (operators/ner_scoring.py), giving the benchmark
    the production FLOP profile the north star specifies (batched
    transformer NER); the rule-only path is ~1000× lighter than any real
    model and would measure only driver orchestration overhead.
  * A warmup run precedes the timed runs (JIT/codegen/python-worker pool).
  * Each measurement is min-of-k (shared-host VM, 1.5-4× interference).
  * Two sizes are timed so **marginal throughput** — Δdocs / Δwall — can be
    reported alongside totals. Marginal throughput isolates the
    data-parallel portion (scan → UDFs → shuffles), which is what scales
    with cores; the per-job fixed driver orchestration (canonicalization
    loop, barriers, ~100 small jobs) is constant per job by construction.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_PARA_RANGE = (8, 12)
BENCH_SENT_RANGE = (2, 4)


def _corpus(spark, n_docs: int) -> str:
    from search_spark import datagen

    path = f"/tmp/scaling_corpus_v3_{n_docs}"
    if not os.path.isdir(path):
        # 128 files so the scan yields enough splits for every parallelism
        # level under test (a table written 8-wide caps the parse stage at
        # ~⌈size/maxPartitionBytes⌉ tasks regardless of cores)
        datagen.generate_web_pages(
            spark,
            n_docs,
            seed=42,
            partitions=128,
            n_para_range=BENCH_PARA_RANGE,
            n_sent_range=BENCH_SENT_RANGE,
        ).write.parquet(path)
    return path


def main() -> int:
    cpus = int(sys.argv[1])
    n_small = int(sys.argv[2])
    n_large = int(sys.argv[3])
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    from search_spark import datagen
    from search_spark.pipeline import PipelineConfig, build_triples
    from search_spark.session import get_spark

    spark = get_spark(
        f"scaling-{cpus}",
        master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": str(cpus)},
    )
    spark.sparkContext.setLogLevel("ERROR")

    small_path = _corpus(spark, n_small)
    large_path = _corpus(spark, n_large)

    # warmup (different seed → no cache reuse)
    warm = datagen.generate_web_pages(spark, 200, seed=7)
    build_triples(spark, warm, PipelineConfig(ner_scoring=True)).count()
    spark.catalog.clearCache()

    runs = {}
    for label, path, n in (
        ("small", small_path, n_small),
        ("large", large_path, n_large),
    ):
        pages = spark.read.parquet(path)
        walls, n_triples = [], 0
        # min-of-k: this sandbox is a shared-host VM with 1.5-4× run-to-run
        # interference; the minimum is the standard noise-robust estimator
        for _ in range(reps):
            t0 = time.time()
            n_triples = build_triples(
                spark, pages, PipelineConfig(ner_scoring=True)
            ).count()
            walls.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        wall = min(walls)
        runs[label] = {"n_docs": n, "n_triples": n_triples,
                       "wall_sec": wall, "all_walls": walls,
                       "docs_per_sec": round(n / wall, 2),
                       "triples_per_sec": round(n_triples / wall, 2)}

    d_docs = n_large - n_small
    d_wall = runs["large"]["wall_sec"] - runs["small"]["wall_sec"]
    d_triples = runs["large"]["n_triples"] - runs["small"]["n_triples"]
    print(
        json.dumps(
            {
                "cpus": cpus,
                "runs": runs,
                "marginal_docs_per_sec": round(d_docs / d_wall, 2)
                if d_wall > 0 else None,
                "marginal_triples_per_sec": round(d_triples / d_wall, 2)
                if d_wall > 0 else None,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
