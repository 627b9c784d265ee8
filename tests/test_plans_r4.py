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
