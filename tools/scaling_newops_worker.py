"""Subprocess worker for the round-5 new-op scale stress.

Runs the continuation-session graph family on the 20M-triple skewed KG
(same generator/table as scaling_graph_worker.py) at a given
parallelism and prints one JSON line: per-op wall, rows, and a
deterministic result fingerprint (order-independent xxhash64 sum) so
the harness can assert identical results across parallelism levels.

Ops under stress:
  * multi_source_bfs — 8 degree-chosen landmarks, 4 hops, labeled state
    (landmark, entity, dist): the k-landmarks-one-loop claim.
  * landmark_closeness — the full top-k dim + BFS + integer-unit
    harmonic aggregate.
  * wl_role_labels(signature="hashsum") — 2 WL rounds with the
    O(1)-state multiset hash-sum; the sorted form is deliberately NOT
    run here (a hub's sorted signature is O(degree) — the exact hazard
    the hashsum form exists to remove).

Usage: python tools/scaling_newops_worker.py <cpus> <n_triples> [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    cpus = int(sys.argv[1])
    n_triples = int(sys.argv[2])
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from search_spark import checkpoints, datagen
    from search_spark.session import get_spark

    ckpt_strategy = os.environ.get("SPARK_GRAFT_CKPT_STRATEGY", "reliable")
    default_mem = "48g" if ckpt_strategy == "local" else "8g"
    spark = get_spark(
        f"scaling-newops-{cpus}",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(2 * cpus),
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM_SCALING", default_mem
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(checkpoints.STRATEGY_KEY, ckpt_strategy)

    kg_path = f"/tmp/scaling_kg_v1_{n_triples}"
    if not os.path.isdir(kg_path):
        datagen.generate_kg_triples(
            spark, n_triples, seed=42, partitions=128
        ).write.parquet(kg_path)
    edges = spark.read.parquet(kg_path).filter(
        F.col("pred") == "linked_to"
    ).select(F.col("subj").alias("src"), F.col("obj").alias("dst"))

    from search_spark.operators.graph import (
        landmark_closeness,
        multi_source_bfs,
        select_landmarks,
        wl_role_labels,
    )

    def fp(df):
        """Order-independent result fingerprint + row count, one pass."""
        row = df.agg(
            F.coalesce(
                F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("f"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        return str(row["f"]), int(row["n"])

    # pin the 8-row landmark dim as driver literals: a shared
    # localCheckpoint would lose its blocks to the inter-op
    # _release_blocks sweep (checkpointRDDBlockIdNotFound)
    lmk_rows = [(r["entity"],) for r in select_landmarks(edges, 8).collect()]
    lmk = spark.createDataFrame(lmk_rows, "entity string")
    ops = {
        "multi_source_bfs_8x4": lambda: multi_source_bfs(
            edges, lmk, max_hops=4
        ),
        "landmark_closeness": lambda: landmark_closeness(
            edges, n_landmarks=8, max_hops=4
        ),
        "wl_roles_hashsum": lambda: wl_role_labels(
            edges, rounds=2, signature="hashsum"
        ),
    }

    # warmup: codegen + parquet footers
    multi_source_bfs(edges.limit(50000), lmk, max_hops=1).count()

    def _release_blocks() -> None:
        try:
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for jrdd in list(jmap.values()):
                jrdd.unpersist()
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    results = {}
    for name, fn in ops.items():
        walls, out_fp, out_n = [], None, 0
        for _ in range(reps):
            t0 = time.time()
            out_fp, out_n = fp(fn())
            walls.append(round(time.time() - t0, 3))
            _release_blocks()
        results[name] = {
            "wall_sec": min(walls),
            "all_walls": walls,
            "n_rows": out_n,
            "fingerprint": out_fp,
        }
        print(
            f"# [{cpus} cores] {name}: {min(walls)}s, {out_n} rows",
            flush=True,
        )

    print(json.dumps({
        "cpus": cpus,
        "n_triples": n_triples,
        "strategy": ckpt_strategy,
        "total_wall_sec": round(
            sum(r["wall_sec"] for r in results.values()), 3
        ),
        "ops": results,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
