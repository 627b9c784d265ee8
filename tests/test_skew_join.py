"""Head-entity skew mitigation on joins (VERDICT r4 item 2).

Three layers of evidence, smallest here, biggest in tools/skew_probe.py:
1. salted_equi_join is result-identical to the plain join (inner + left)
   and its plan spreads the hot key (join keys include the salt).
2. AQE's OptimizeSkewedJoin actually fires on a head-skewed mapping join
   when thresholds are production-shaped (lowered proportionally for the
   test's data size) — asserted from the adaptive executed plan's
   ``skew=true`` markers.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_spark.operators.skew import salted_equi_join


def _skewed_probe(spark, n=40_000, n_keys=400):
    # ~50% of rows on one head key, remainder uniform — the head-entity
    # profile (datagen u**skew) in miniature
    return spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit("hub"))
        .otherwise(F.concat(F.lit("e"), F.col("id") % n_keys))
        .alias("subj"),
        F.col("id").alias("payload"),
    )


def _mapping(spark, n_keys=400):
    keys = spark.range(n_keys).select(
        F.concat(F.lit("e"), F.col("id")).alias("subj")
    ).union(spark.createDataFrame([("hub",)], "subj string"))
    return keys.select(
        "subj", F.concat(F.lit("c_"), F.col("subj")).alias("component")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_matches_plain_join(spark, how):
    probe = _skewed_probe(spark, n=5_000)
    build = _mapping(spark)
    plain = probe.join(build, on="subj", how=how)
    salted = salted_equi_join(probe, build, on="subj", n_salt=8, how=how)
    assert _rows(salted) == _rows(plain)
    assert salted.columns == plain.columns


def test_salted_join_key_includes_salt(spark):
    probe = _skewed_probe(spark, n=1_000)
    build = _mapping(spark)
    plan = salted_equi_join(
        probe, build, on="subj", n_salt=8
    )._jdf.queryExecution().optimizedPlan().toString()
    # the equi-join condition carries the salt column -> a hot subj
    # hashes to n_salt distinct reducers
    assert "_salt" in plan
    assert "Join" in plan


def test_salted_join_rejects_unknown_how(spark):
    probe = _skewed_probe(spark, n=10)
    with pytest.raises(ValueError):
        salted_equi_join(probe, _mapping(spark), on="subj", how="full")


def test_aqe_skew_join_fires_on_head_key(spark):
    """With thresholds scaled to the test's data, AQE splits the hot
    partition: the final adaptive plan carries ``skew=true``."""
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.coalescePartitions.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
            # AQE's RUNTIME broadcast threshold: if another test left it
            # >0, AQE converts this SMJ to broadcast (no skew path at
            # all) — pin it off so the test exercises the skew split
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "16KB",
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        probe = _skewed_probe(spark, n=60_000).withColumn(
            "pad", F.repeat(F.lit("x"), 64)
        )
        joined = probe.join(_mapping(spark), on="subj")
        # collect() executes joined's OWN plan (count() would wrap it in
        # a different query execution and leave this one un-finalized)
        n = len(joined.collect())
        assert n == probe.count()  # mapping covers every key
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final, final[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
