"""Head-entity skew probe (VERDICT r4 item 2).

Isolates the two joins the stress harness showed are exposed to head
skew — the canonicalization mapping join (triples ⋈ entity→component on
``subj``; canonicalize.sameas_apply / canonical-mapping application) and
the PageRank contribution join (e_od ⋈ ranks on ``src`` + groupBy dst;
graph.py pagerank loop) — on the 20M-triple skewed KG with the build
side FORCED onto the shuffle path (autoBroadcastJoinThreshold=-1: at
web scale the vocabulary doesn't broadcast, which is exactly when head
skew bites), and measures the per-task run-time distribution of the
join stage under three treatments:

* ``shuffled_aqe_skew_on``  — both sides freshly shuffled (the one
  shape OptimizeSkewedJoin can split) with the trigger threshold scaled
  to the sandbox's partition sizes; the finalized plan's ``skew=true``
  marker is recorded,
* ``shuffled_aqe_skew_off`` — the straggler baseline,
* ``cached_*_aqe_skew_on``  — the ENGINE's real shape (persisted
  mapping / rank state): no shuffle stage on the cached side means the
  rule can never fire, whatever the thresholds — recorded as the
  honest negative that motivates the explicit operator,
* ``salted``                — the explicit mitigation
  (operators/skew.salted_equi_join: probe salt + build replication),
  plan-guaranteed in every shape, including the cached one.

Per variant: wall, rows, and the join stage's task-time quantiles
(p05/p50/p95/max from the UI REST ``taskSummary``) plus max/median —
the straggler ratio the north rule's skew clause is about. Results
merge into SCALING_GRAPH.json under ``skew`` and print as one JSON
line.

Usage: python tools/skew_probe.py [n_triples [cpus]]
(defaults 20,000,000 and 32; reuses the harness KG parquet)
"""

from __future__ import annotations

import datetime as dt
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _rest(port, path):
    with urllib.request.urlopen(
        f"http://localhost:{port}/api/v1/{path}", timeout=20
    ) as r:
        return json.load(r)


def _stages(port, app_id):
    return _rest(port, f"applications/{app_id}/stages?status=complete")


def _task_summary(port, app_id, stage_id, attempt):
    q = "quantiles=0.05,0.5,0.95,1.0"
    return _rest(
        port,
        f"applications/{app_id}/stages/{stage_id}/{attempt}/taskSummary?{q}",
    )


def _join_stage_metrics(port, app_id, before_ids):
    """Among stages completed since ``before_ids``, pick the heaviest
    shuffle-read stage (the SMJ reduce stage reading both sides) and
    return its task-time distribution."""
    new = [
        s
        for s in _stages(port, app_id)
        if s["stageId"] not in before_ids
    ]
    if not new:
        return {}
    join_stage = max(new, key=lambda s: int(s.get("shuffleReadBytes") or 0))
    summ = _task_summary(
        port, app_id, join_stage["stageId"], join_stage["attemptId"]
    )
    rt = summ.get("executorRunTime") or []
    if len(rt) != 4:
        return {}
    p05, p50, p95, mx = (x / 1000.0 for x in rt)
    return {
        "stage_id": join_stage["stageId"],
        "n_tasks": join_stage.get("numCompleteTasks"),
        "shuffle_read_mb": round(
            int(join_stage.get("shuffleReadBytes") or 0) / 2**20, 1
        ),
        "task_sec_p05": round(p05, 2),
        "task_sec_p50": round(p50, 2),
        "task_sec_p95": round(p95, 2),
        "task_sec_max": round(mx, 2),
        "straggler_ratio_max_over_median": (
            round(mx / p50, 2) if p50 > 0 else None
        ),
    }


def main() -> int:
    n_triples = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    port = 4090

    from pyspark.sql import functions as F

    from search_spark import datagen
    from search_spark.operators.skew import salted_equi_join
    from search_spark.session import get_spark

    spark = get_spark(
        "skew-probe",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(2 * cpus),
            "spark.ui.enabled": "true",
            "spark.ui.port": str(port),
            "spark.ui.retainedStages": "30000",
            # web-scale regime under test: the vocabulary-sized build
            # side does NOT broadcast
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM_SCALING", "24g"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = _rest(port, "applications")[0]["id"]

    kg_path = f"/tmp/scaling_kg_v1_{n_triples}"
    if not os.path.isdir(kg_path):
        datagen.generate_kg_triples(
            spark, n_triples, seed=42, partitions=128
        ).write.parquet(kg_path)
    # The stress KG's zipf head (u**2) concentrates ~0.1% of rows on the
    # top entity — skewed for aggregation variance but not enough to
    # single out a join reducer. Head entities at web scale are far
    # hotter (the engine's own doc corpus puts ~40% of mentions on one
    # entity — datagen.HEAD_ENTITIES), so the probe table deterministically
    # remaps ``hot_frac`` of all subjects onto one head entity: the
    # worst-key regime where one reducer would receive hot_frac of the
    # probe side.
    hot_frac = float(os.environ.get("SPARK_GRAFT_SKEW_HOT", "0.3"))
    hot_path = f"/tmp/skew_kg_{n_triples}_h{int(hot_frac * 100)}"
    if not os.path.isdir(hot_path):
        base = spark.read.parquet(kg_path)
        (
            base.withColumn(
                "_u",
                (F.pmod(F.xxhash64("subj", "obj"), F.lit(10_000)))
                / 10_000.0,
            )
            .withColumn(
                "subj",
                F.when(F.col("_u") < hot_frac, F.lit("e0")).otherwise(
                    F.col("subj")
                ),
            )
            .drop("_u")
            .write.parquet(hot_path)
        )
    triples = spark.read.parquet(hot_path)
    edges = triples.filter(F.col("pred") == "linked_to").select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )

    # vocabulary-sized build sides. TWO physical shapes of the same
    # mapping, because they behave differently under OptimizeSkewedJoin:
    # * mapping_scan — written to parquet and re-read, so the join plans
    #   Scan->Exchange->Sort on BOTH sides: the shuffle-stage pattern
    #   AQE's skew rule requires;
    # * mapping (cached) — the ENGINE's real shape (canonical mapping /
    #   rank state is persisted and often pre-partitioned): the cached
    #   side has NO shuffle stage for the rule to replicate, so AQE
    #   skew-splitting can never fire there, whatever the thresholds.
    mapping_path = f"/tmp/skew_mapping_{n_triples}_h{int(hot_frac * 100)}"
    if not os.path.isdir(mapping_path):
        (
            triples.select(F.col("subj").alias("entity"))
            .union(triples.select(F.col("obj").alias("entity")))
            .distinct()
            .select(
                "entity",
                F.concat(
                    F.lit("c"),
                    F.pmod(F.xxhash64("entity"), F.lit(100_000)),
                ).alias("component"),
            )
            .write.parquet(mapping_path)
        )
    mapping_scan = spark.read.parquet(mapping_path)
    mapping = mapping_scan.persist()
    n_entities = mapping.count()
    # pre-partitioned cached mapping: hash-clustered on the join key and
    # persisted — the co-partitioned loop-state shape (graph.py pagerank
    # big_state regime). EnsureRequirements inserts NO exchange above
    # it, so there is no shuffle stage for OptimizeSkewedJoin to split:
    # the rule can never fire on this side, whatever the thresholds.
    mapping_prepart = (
        mapping_scan.withColumnRenamed("entity", "subj")
        .repartition(2 * cpus, "subj")
        .persist()
    )
    mapping_prepart.count()
    e = edges.distinct().persist()
    outdeg = e.groupBy(F.col("src").alias("entity")).agg(
        F.count(F.lit(1)).alias("od")
    )
    e_od = e.join(
        outdeg.withColumnRenamed("entity", "src"), on="src"
    ).persist()
    e_od.count()
    ranks = mapping.select(
        F.col("entity"), F.lit(1.0 / n_entities).alias("rank")
    ).persist()
    ranks.count()

    def canon_join_shuffled():
        return triples.join(
            mapping_scan.withColumnRenamed("entity", "subj"), on="subj"
        ).select("component", "pred", "obj")

    def canon_join_cached():
        # unpartitioned cache: the join still inserts an exchange above
        # the cached scan, so the skew rule CAN fire here — recorded to
        # show the boundary is the cached LAYOUT, not caching itself
        return triples.join(
            mapping.withColumnRenamed("entity", "subj"), on="subj"
        ).select("component", "pred", "obj")

    def canon_join_prepart():
        return triples.join(mapping_prepart, on="subj").select(
            "component", "pred", "obj"
        )

    def canon_join_salted():
        return salted_equi_join(
            triples,
            mapping.withColumnRenamed("entity", "subj"),
            on="subj",
            n_salt=32,
        ).select("component", "pred", "obj")

    def contrib_join_shuffled():
        return (
            e_od.join(
                mapping_scan.select(
                    F.col("entity"),
                    F.lit(1.0 / n_entities).alias("rank"),
                ),
                e_od["src"] == F.col("entity"),
            )
            .select("dst", (F.col("rank") / F.col("od")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )

    def contrib_join_cached():
        return (
            e_od.join(ranks, e_od["src"] == ranks["entity"])
            .select("dst", (F.col("rank") / F.col("od")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )

    def contrib_join_salted():
        return (
            salted_equi_join(
                e_od, ranks.withColumnRenamed("entity", "src"), on="src"
            )
            .select("dst", (F.col("rank") / F.col("od")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )

    cases = {
        "canonicalize_mapping_join": {
            "shuffled_aqe_skew_on": (canon_join_shuffled, True),
            "shuffled_aqe_skew_off": (canon_join_shuffled, False),
            "cached_mapping_aqe_skew_on": (canon_join_cached, True),
            "prepartitioned_state_aqe_skew_on": (canon_join_prepart, True),
            "salted": (canon_join_salted, False),
        },
        "pagerank_contribution_join": {
            "shuffled_aqe_skew_on": (contrib_join_shuffled, True),
            "shuffled_aqe_skew_off": (contrib_join_shuffled, False),
            "cached_state_aqe_skew_on": (contrib_join_cached, True),
            "salted": (contrib_join_salted, False),
        },
    }

    reps = int(os.environ.get("SPARK_GRAFT_SKEW_REPS", "2"))
    results = {}
    for join_name, variants in cases.items():
        results[join_name] = {}
        for var_name, (fn, skew_on) in variants.items():
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower()
            )
            # OptimizeSkewedJoin's absolute trigger
            # (skewedPartitionThresholdInBytes, default 256M) is sized
            # for production partitions; the sandbox's hot partition is
            # ~60MB, so scale the trigger proportionally (hot ≈ 4× the
            # 16M threshold, exactly the shape of a 1-GB-hot-partition
            # cluster run against the 256M default). aqe_skew_off keeps
            # the splitting disabled outright, so these only shape the
            # ON variant.
            spark.conf.set(
                "spark.sql.adaptive.skewJoin."
                "skewedPartitionThresholdInBytes",
                "16MB" if skew_on else "256MB",
            )
            spark.conf.set(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes",
                "8MB" if skew_on else "64MB",
            )
            best = None
            n_rows = 0
            for _ in range(reps):
                df = fn()
                before = {s["stageId"] for s in _stages(port, app_id)}
                t0 = time.time()
                # rdd.count() executes df's OWN query execution, so the
                # finalized adaptive plan is inspectable afterwards
                n_rows = df.rdd.count()
                wall = round(time.time() - t0, 2)
                plan = df._jdf.queryExecution().executedPlan().toString()
                metrics = _join_stage_metrics(port, app_id, before)
                metrics["skew_split_fired"] = "skew=true" in plan
                if best is None or wall < best["wall_sec"]:
                    best = {"wall_sec": wall, "n_rows": n_rows, **metrics}
            results[join_name][var_name] = best
            print(
                f"# {join_name}/{var_name}: {best['wall_sec']}s, "
                f"max/med="
                f"{best.get('straggler_ratio_max_over_median')}, "
                f"split={best.get('skew_split_fired')}",
                file=sys.stderr, flush=True,
            )
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    doc = {
        "generated_at": dt.datetime.now(dt.timezone.utc).isoformat(
            timespec="seconds"
        ),
        "n_triples": n_triples,
        "n_entities": n_entities,
        "hot_key_fraction": hot_frac,
        "cpus": cpus,
        "method": (
            "min-of-reps walls; autoBroadcastJoinThreshold=-1 (forced "
            "shuffle join, the non-broadcastable-vocabulary regime); "
            "shuffled_* variants join the parquet-scan mapping (both "
            "sides shuffle - the shape AQE skew-split supports; "
            "thresholds scaled: 16MB trigger / 8MB advisory vs the "
            "~60MB hot partition); cached_* variants join the persisted "
            "mapping/state (the engine's real shape - no shuffle stage "
            "to split, rule can never fire); per-variant join-stage "
            "task-time quantiles from UI REST taskSummary; "
            "skew_split_fired read from the finalized adaptive plan; "
            "salted = operators/skew.salted_equi_join n_salt=32"
        ),
        "joins": results,
    }
    out_path = os.path.join(REPO, "SCALING_GRAPH.json")
    try:
        with open(out_path) as f:
            existing = json.load(f)
    except (OSError, ValueError):
        existing = {}
    existing["skew"] = doc
    with open(out_path, "w") as f:
        json.dump(existing, f, indent=2)
    print(json.dumps(doc))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
