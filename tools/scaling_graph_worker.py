"""Subprocess worker for the graph scale-stress bench (VERDICT r3 item 1).

Runs the iterative graph/SPARQL operators on their DISTRIBUTED paths
(``local_threshold=0`` everywhere a driver fallback exists) over a
synthetic skewed KG ~10-50× the bench's edge count, at a given
parallelism, and prints one JSON line with per-op wall / rounds /
shuffle-bytes.

Usage: python tools/scaling_graph_worker.py <cpus> <n_triples> [reps]

Measurement design:
  * The KG is read from parquet (a table scan, like production), generated
    once per size by ``datagen.generate_kg_triples`` — deterministic and
    heavily head-skewed (max degree ~100× median), so the loops face the
    stragglers the north rule's skew clause is about.
  * Every op that has a count-gated driver fallback is forced distributed
    (``local_threshold=0``): these runs time the actual iterative
    join-aggregate loops (the thing BENCH numbers never see at sf0.01),
    including per-round ``localCheckpoint`` lineage truncation.
  * PageRank runs at BOTH 4 and 8 iterations: wall(8)/wall(4) ≈ ~2 is the
    no-per-round-blowup check — a leaking lineage or growing state shows
    up as a super-linear ratio.
  * Shuffle read/write bytes per op come from the UI REST API
    (stage-level deltas); the UI is enabled just for this worker.
  * min-of-reps walls (shared-host VM); each level runs in its own JVM.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _rest(port: int, path: str):
    with urllib.request.urlopen(
        f"http://localhost:{port}/api/v1/{path}", timeout=15
    ) as r:
        return json.load(r)


def _shuffle_totals(port: int) -> tuple[int, int]:
    """(shuffle_read_bytes, shuffle_write_bytes) summed over completed
    stages — callers take deltas around an op."""
    try:
        apps = _rest(port, "applications")
        app_id = apps[0]["id"]
        stages = _rest(port, f"applications/{app_id}/stages?status=complete")
        rb = sum(int(s.get("shuffleReadBytes") or 0) for s in stages)
        wb = sum(int(s.get("shuffleWriteBytes") or 0) for s in stages)
        return rb, wb
    except Exception:
        return -1, -1


def main() -> int:
    cpus = int(sys.argv[1])
    n_triples = int(sys.argv[2])
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    port = 4040 + cpus

    from search_spark import checkpoints, datagen
    from search_spark.session import get_spark

    # Checkpoint strategy under test (VERDICT r4 item 1): "local" keeps
    # round state as executor-memory blocks and historically needs the
    # 48g heap at 20M triples; "reliable" writes round state to files —
    # the cluster-safe default — and must complete at the ordinary 8g.
    ckpt_strategy = os.environ.get("SPARK_GRAFT_CKPT_STRATEGY", "local")
    default_mem = "48g" if ckpt_strategy == "local" else "8g"
    spark = get_spark(
        f"scaling-graph-{cpus}",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(2 * cpus),
            "spark.ui.enabled": "true",
            "spark.ui.port": str(port),
            "spark.ui.retainedStages": "30000",
            "spark.ui.retainedJobs": "30000",
            # local strategy: iterative loops keep edge-sized state as
            # MEMORY_AND_DISK blocks every round; on a 10-50×-edges KG
            # those (plus skew-fattened single partitions) need real
            # heap. reliable strategy: state goes to checkpoint files,
            # so the ordinary 8g test heap must suffice — that bound is
            # part of what this harness evidences.
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM_SCALING", default_mem
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(checkpoints.STRATEGY_KEY, ckpt_strategy)

    n_entities = max(16, n_triples // 10)
    kg_path = f"/tmp/scaling_kg_v1_{n_triples}"
    sa_path = f"/tmp/scaling_sameas_v1_{n_triples}"
    if not os.path.isdir(kg_path):
        datagen.generate_kg_triples(
            spark, n_triples, seed=42, partitions=128
        ).write.parquet(kg_path)
    if not os.path.isdir(sa_path):
        datagen.generate_sameas_pairs(
            spark, max(1000, n_triples // 40), n_entities, seed=7
        ).write.parquet(sa_path)

    triples = spark.read.parquet(kg_path)
    sameas = spark.read.parquet(sa_path)
    edges = triples.filter(F.col("pred") == "linked_to").select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )

    from search_spark.operators.canonicalize import (
        connected_components,
        sameas_rewrite,
    )
    from search_spark.operators.graph import (
        kcore_peel,
        label_propagation,
        pagerank,
    )
    from search_spark.operators.paths import Pred, Repeat, Seq, eval_path

    # 64 low-degree seeds (tail ids) for the path op: bounded fan-out in,
    # realistic blow-up through head entities along the way
    seeds = spark.createDataFrame(
        [(f"e{n_entities - 1 - i}",) for i in range(64)], "src string"
    )
    path = Seq(Repeat(Pred("affiliated_with"), 3), Pred("mentions_topic"))

    ops = {
        "kg_pagerank_8iter": (
            lambda: pagerank(edges, n_iter=8, local_threshold=0),
            {"rounds": 8},
        ),
        "kg_pagerank_4iter": (
            lambda: pagerank(edges, n_iter=4, local_threshold=0),
            {"rounds": 4},
        ),
        "kg_components": (
            lambda: connected_components(
                edges, max_iterations=25, local_threshold=0
            ),
            {"rounds": "to-convergence (≤25)"},
        ),
        "kg_communities": (
            lambda: label_propagation(edges, n_iter=4, local_threshold=0),
            {"rounds": 4},
        ),
        "kg_kcore": (
            lambda: kcore_peel(edges, k=3, n_rounds=4),
            {"rounds": 4},
        ),
        "kg_sameas_rewrite": (
            lambda: sameas_rewrite(triples, sameas, local_threshold=0),
            {"rounds": "CC to-convergence (≤25)"},
        ),
        "sparql_property_path": (
            lambda: eval_path(triples, path, seeds),
            {"rounds": "3 hops, semi-naive"},
        ),
    }

    # warmup: JIT/codegen/python pool + parquet footer cache
    pagerank(edges.limit(50000), n_iter=2, local_threshold=0).count()

    def _release_blocks() -> None:
        """Unpersist every cached/checkpointed RDD between measurements so
        one op's blocks never crowd the next (the per-job analogue of job
        teardown on a real cluster). Under the reliable strategy, also
        sweep the checkpoint files the finished op left behind (a real
        cluster's job teardown deletes its checkpoint dir)."""
        try:
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for jrdd in list(jmap.values()):
                jrdd.unpersist()
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        if ckpt_strategy == "reliable":
            try:
                opt = spark.sparkContext._jsc.sc().getCheckpointDir()
                if opt.isDefined():
                    import shutil

                    d = opt.get().removeprefix("file:")
                    for sub in os.listdir(d):
                        shutil.rmtree(os.path.join(d, sub),
                                      ignore_errors=True)
            except Exception:
                pass

    results = {}
    for name, (fn, meta) in ops.items():
        walls, n_rows = [], 0
        sh = (-1, -1)
        for rep in range(reps):
            rb0, wb0 = _shuffle_totals(port)
            t0 = time.time()
            n_rows = fn().count()
            walls.append(round(time.time() - t0, 3))
            _release_blocks()
            if rep == 0:
                rb1, wb1 = _shuffle_totals(port)
                if rb0 >= 0 and rb1 >= 0:
                    sh = (rb1 - rb0, wb1 - wb0)
        results[name] = {
            "wall_sec": min(walls),
            "all_walls": walls,
            "n_rows": n_rows,
            "shuffle_read_bytes": sh[0],
            "shuffle_write_bytes": sh[1],
            **meta,
        }
        print(f"# [{cpus} cores] {name}: {min(walls)}s, {n_rows} rows",
              file=sys.stderr)

    total = round(sum(r["wall_sec"] for r in results.values()), 3)
    n_edges = edges.count()
    print(json.dumps({
        "cpus": cpus,
        "n_triples": triples.count(),
        "n_edges_linked_to": n_edges,
        "n_entities": n_entities,
        "reps": reps,
        "checkpoint_strategy": ckpt_strategy,
        "driver_memory": spark.conf.get("spark.driver.memory"),
        "total_wall_sec": total,
        "ops": results,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
