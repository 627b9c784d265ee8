"""Plan audits for the round-4 queries: the learned-model scorers keep
the weight join broadcast (never a shuffle of the mention/pair stream for
a 1-row dim) and nothing in the new family plans a cartesian product; the
distributed IOB tagger runs on window passes, not self-joins per span."""

from __future__ import annotations

import os

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "qname",
    ["learned_mention_score", "learned_relation_extract", "token_iob_tags"],
)
def test_no_cartesian(spark, qname):
    from search_spark.queries import QUERIES

    plan = _plan(QUERIES[qname].spark(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan


@pytest.mark.parametrize(
    "qname", ["learned_mention_score", "learned_relation_extract"]
)
def test_weights_join_is_broadcast(spark, qname):
    from search_spark.queries import QUERIES

    plan = _plan(QUERIES[qname].spark(spark, SF_DIR))
    assert (
        "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    ), plan


def test_token_iob_uses_windows(spark):
    from search_spark.queries import QUERIES

    plan = _plan(QUERIES["token_iob_tags"].spark(spark, SF_DIR))
    assert "Window" in plan
    assert "CartesianProduct" not in plan


def test_landmark_selection_is_topk(spark):
    """Landmark selection compiles to TakeOrderedAndProject over the
    partial-aggregated degree table — a per-partition top-k, never a
    full global sort. (The end-to-end closeness plan is lineage-
    truncated by the per-round checkpoints, so the dim is audited
    directly.)"""
    from search_spark.operators.graph import select_landmarks
    from search_spark.queries import _kg_edge_instances

    lmk = select_landmarks(_kg_edge_instances(spark, SF_DIR), 8)
    plan = _plan(lmk)
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_landmark_closeness_no_cartesian(spark):
    """The per-round labeled-BFS join is an equi-join on src; nothing in
    the family plans a cartesian product (checked on the pre-loop round
    plan: one frontier⋈edges expansion + min-aggregate)."""
    from pyspark.sql import functions as F
    from search_spark.operators.graph import multi_source_bfs
    from search_spark.queries import _kg_edge_instances

    edges = _kg_edge_instances(spark, SF_DIR).limit(500)
    lmk = edges.select(F.col("src").alias("entity")).limit(2)
    out = multi_source_bfs(edges, lmk, max_hops=1)
    assert "CartesianProduct" not in _plan(out)
