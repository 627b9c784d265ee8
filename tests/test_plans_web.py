"""Physical-plan audits for the web-native source operators.

Same contract as tests/test_plans.py: the scale properties these operators
claim — zero Python in codegen-only extractions, exactly one Arrow pass
where Python is unavoidable, no cartesian products, no forced broadcasts —
must be visible in the executed plan.
"""

from __future__ import annotations

import re

from tests.test_plans import SF_DIR, plan_of


def _n_ops(plan: str, op: str) -> int:
    return len(re.findall(r"\(\d+\) " + op, plan))


def _no_python_ops(plan: str) -> bool:
    # the fixture scan's RDD description mentions applySchemaToPythonRDD;
    # what must be absent is any Python *operator* in the plan tree
    return not re.search(
        r"BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas",
        plan,
    )


def _q(name):
    from search_spark.queries import QUERIES

    return QUERIES[name].spark


def test_jsonld_extraction_is_pure_codegen(spark):
    # block scan + map parse + subject cascade: no Python operator at all
    plan = plan_of(_q("jsonld_triples")(spark, SF_DIR))
    assert _no_python_ops(plan)
    assert "codegen id" in plan
    assert "CartesianProduct" not in plan


def test_anchor_queries_are_pure_codegen_aggregations(spark):
    for name in ("anchor_aliases", "anchor_prior_link"):
        plan = plan_of(_q(name)(spark, SF_DIR))
        assert _no_python_ops(plan), name
        assert "CartesianProduct" not in plan, name
        # partial aggregation must absorb hub-dst skew map-side
        assert "partial_count" in plan or "HashAggregate" in plan, name


def test_webtable_cells_single_arrow_pass_no_shuffle(spark):
    plan = plan_of(_q("webtable_cells")(spark, SF_DIR))
    assert _n_ops(plan, "MapInPandas") == 1, plan
    assert "Exchange" not in plan, plan


def test_webtable_triples_single_arrow_pass_no_cartesian(spark):
    # the cell table crosses Arrow once; header/subject joins are plain
    # equi-joins (broadcast or shuffled-hash under AQE, never nested-loop)
    plan = plan_of(_q("webtable_triples")(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_boilerplate_joins_keyed_not_forced(spark):
    plan = plan_of(_q("boilerplate_strip")(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # the flag join keys on (host, pkey) — visible as an equi-join on md5
    assert "md5" in plan


def test_fusion_resolution_no_cartesian(spark):
    plan = plan_of(_q("kg_fused_triples")(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_canonical_links_pure_codegen(spark):
    plan = plan_of(_q("canonical_links")(spark, SF_DIR))
    assert _no_python_ops(plan)
    assert "Exchange" not in plan, plan  # narrow map over the page scan
