"""Count Spark jobs per iteration round for the iterative family
(VERDICT r4 item 6 evidence: the round-latency floor of small-graph
iterative ops is jobs/round × scheduling+checkpoint latency).

Runs each op twice at two round counts on a fixed small graph and
reports (jobs(hi) - jobs(lo)) / (hi - lo) — the marginal jobs per
round, independent of fixed setup jobs. Uses the status tracker's job
id counter. Prints one JSON line; merge into BENCH.md by hand or via
bench_scaling regeneration.

Usage: python tools/jobs_per_round.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import functions as F

    from search_spark import datagen
    from search_spark.operators.canonicalize import connected_components
    from search_spark.operators.graph import (
        kcore_peel,
        label_propagation,
        pagerank,
    )
    from search_spark.operators.paths import Pred, Repeat, eval_path
    from search_spark.session import get_spark

    spark = get_spark(
        "jobs-per-round", master="local[8]",
        extra_conf={"spark.sql.shuffle.partitions": "8"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()

    triples = datagen.generate_kg_triples(spark, 300_000, seed=1,
                                          partitions=8)
    triples = triples.localCheckpoint(eager=True)
    edges = triples.filter(F.col("pred") == "linked_to").select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    seeds = spark.createDataFrame([("e29000",), ("e29500",)], "src string")
    chain = spark.range(100_000).select(
        F.concat(F.lit("n"), F.col("id")).alias("src"),
        F.concat(F.lit("n"), F.col("id") + 1).alias("dst"),
    ).localCheckpoint(eager=True)

    def n_jobs() -> int:
        ids = tracker.getJobIdsForGroup(None) or []
        return max(ids, default=0)

    def measure(fn_lo, fn_hi, lo_rounds, hi_rounds):
        a0 = n_jobs()
        fn_lo().count()
        a1 = n_jobs()
        fn_hi().count()
        a2 = n_jobs()
        return round(((a2 - a1) - (a1 - a0)) / (hi_rounds - lo_rounds), 2)

    out = {
        "pagerank": measure(
            lambda: pagerank(edges, n_iter=4, local_threshold=0),
            lambda: pagerank(edges, n_iter=8, local_threshold=0),
            4, 8,
        ),
        # chain graph: star-contraction needs ~log2(n) rounds, so the
        # 3- and 6-round caps both stop mid-convergence and the delta
        # isolates marginal per-round jobs
        "connected_components": measure(
            lambda: connected_components(
                chain, max_iterations=3, local_threshold=0
            ),
            lambda: connected_components(
                chain, max_iterations=6, local_threshold=0
            ),
            3, 6,
        ),
        "label_propagation": measure(
            lambda: label_propagation(edges, n_iter=3, local_threshold=0),
            lambda: label_propagation(edges, n_iter=6, local_threshold=0),
            3, 6,
        ),
        "kcore_peel": measure(
            lambda: kcore_peel(edges, k=3, n_rounds=3),
            lambda: kcore_peel(edges, k=3, n_rounds=6),
            3, 6,
        ),
        "path_repeat": measure(
            lambda: eval_path(
                triples, Repeat(Pred("affiliated_with"), 3), seeds
            ),
            lambda: eval_path(
                triples, Repeat(Pred("affiliated_with"), 6), seeds
            ),
            3, 6,
        ),
    }
    print(json.dumps({"marginal_jobs_per_round": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
