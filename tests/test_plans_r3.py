"""Physical-plan audits for the round-3 query surfaces.

Same contract as tests/test_plans.py: every optimization the round-3
operators rely on must be visible in the executed plan — one Arrow pass
per Python-boundary stage, broadcast joins for dim tables, top-k as
TakeOrderedAndProject, and no cartesian products anywhere.
"""

from __future__ import annotations

import re

from tests.test_plans import SF_DIR, plan_of


def _n_ops(plan: str, op: str) -> int:
    # formatted explain lists each operator in the tree AND the detail
    # section; count detail headers "(N) <op>" for an exact instance count
    return len(re.findall(r"\(\d+\) " + op, plan))


def test_tfidf_search_plan(spark):
    # fit state ships in the UDF closure → exactly one Arrow boundary
    # (the embed pass); cosine + top-k stay JVM-side (codegen + TakeOrdered)
    from search_spark.queries import QUERIES

    plan = plan_of(QUERIES["tfidf_search"].spark(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    assert _n_ops(plan, "MapInPandas") == 1, plan
    assert "codegen id" in plan


def test_prodigy_annotations_single_arrow_pass(spark):
    # JSONL → token rows is ONE mapInPandas over the raw lines: no join,
    # no shuffle, no second Python boundary
    from search_spark.queries import QUERIES

    plan = plan_of(QUERIES["prodigy_annotations"].spark(spark, SF_DIR))
    assert _n_ops(plan, "MapInPandas") == 1, plan
    assert "Exchange" not in plan, plan


def test_pubmed_topic_extract_single_arrow_pass(spark):
    # XML parse is one Arrow pass; posexplode adds no shuffle
    from search_spark.queries import QUERIES

    plan = plan_of(QUERIES["pubmed_topic_extract"].spark(spark, SF_DIR))
    assert _n_ops(plan, "MapInPandas") == 1, plan
    assert "Exchange" not in plan, plan


def test_topic_rules_extracted_catalog_join_is_broadcast(spark):
    # the NLM-catalog dim table (the reference's per-article HTTP call,
    # topic.py:489-517) must join broadcast-side — never a shuffle of the
    # article stream against a catalog-sized table
    from search_spark.queries import QUERIES

    plan = plan_of(QUERIES["topic_rules_extracted"].spark(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_ner_errors_no_cartesian(spark):
    # FN/FP listing = two anti-joins + a token range join; the range join
    # is request-sized broadcast, never a cartesian of the corpora
    from search_spark.queries import QUERIES

    plan = plan_of(QUERIES["ner_errors"].spark(spark, SF_DIR))
    assert "CartesianProduct" not in plan


def test_kg_bgp_queries_no_cartesian_and_pruned_union(spark):
    # every BGP join keys on shared variables (hash or broadcast, never
    # cartesian), and Catalyst constant-folds each pattern's pred filter
    # into the triples union so a has_type scan never runs the relation
    # self-join: the plan has fewer self-join instances than pattern count
    from search_spark.queries import QUERIES

    for name in ("kg_bgp_match", "kg_bgp_optional"):
        plan = plan_of(QUERIES[name].spark(spark, SF_DIR))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_kg_edge_pmi_single_row_broadcast(spark):
    # the corpus-total denominator is a 1-row aggregate broadcast into the
    # pair table — a BroadcastNestedLoopJoin over one row, not a shuffle
    # and never a driver round-trip (no collect in the query body)
    from search_spark.queries import QUERIES

    plan = plan_of(QUERIES["kg_edge_pmi"].spark(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan


def test_sequence_packing_single_shuffle_scan_plan(spark):
    # the global cumsum must be the two-phase scan with exactly ONE
    # corpus-sized shuffle: blocks derive from the key itself (no sampled
    # range partitioning anywhere), the window's block exchange moves raw
    # rows, every other block exchange sits above a partial HashAggregate
    # (block-count-sized), and the offset table joins broadcast-side —
    # never a single-partition global window over the corpus
    from search_spark.queries import QUERIES

    df = QUERIES["sequence_packing"].spark(spark, SF_DIR)
    df.collect()  # adaptive plans finalize on execution of this df
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in executed, executed
    assert "rangepartitioning" not in executed.lower(), executed
    assert "BroadcastExchange" in executed
    assert "CartesianProduct" not in executed
    lines = executed.splitlines()
    final_end = next(
        i for i, l in enumerate(lines) if "Initial Plan" in l
    ) if "Initial Plan" in executed else len(lines)
    raw_shuffles = 0
    for i, line in enumerate(lines[:final_end]):
        if "Exchange hashpartitioning(__block" in line:
            child = lines[i + 1] if i + 1 < final_end else ""
            if "HashAggregate" not in child:
                raw_shuffles += 1
    assert raw_shuffles == 1, executed


def test_contamination_check_broadcasts_benchmark(spark):
    # the eval-suite shingle set joins broadcast-side; the corpus shingle
    # stream is never shuffled against it
    from search_spark.queries import QUERIES

    plan = plan_of(QUERIES["contamination_check"].spark(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_final_r3_batch_no_cartesian(spark):
    # the last round-3 batch: every join must be keyed (or a deliberate
    # 1-row broadcast) — no CartesianProduct anywhere; the only
    # BroadcastNestedLoopJoins allowed are the documented single-row
    # broadcasts (bigram_lm_score's vocabulary size; mixture_plan's
    # weight total + binding cap, whose subtree repeats the total)
    from search_spark.queries import QUERIES

    # pq_adc_search's single BNLJ is the 1-row query-vector broadcast
    # into the codebook-sized LUT build; ivfpq_search composes the same
    # bounded broadcasts as ivf_search (n_cells centroid table, 1-row
    # query cell, 1-row query vector) — same ≤3 budget test_plans grants
    # ivf_search
    # ann_recall adds the exact-scan side's 1-row query broadcast to
    # pq_adc_search's LUT one
    bnlj_budget = {"bigram_lm_score": 1, "mixture_plan": 3,
                   "pq_adc_search": 1, "ivfpq_search": 3,
                   "ann_recall": 2}
    for name in (
        "kg_link_prediction",
        "exact_substring_dups",
        "bigram_lm_score",
        "kg_random_walks",
        "kg_walk_skipgram",
        "kg_hits",
        "kg_triple_confidence",
        "kg_pred_functionality",
        "ner_context_windows",
        "mixture_plan",
        "dedup_keep_best",
        "latest_capture",
        "kg_triple_versioning",
        "kg_node2vec_walks",
        "pq_codes",
        "pq_adc_search",
        "ivfpq_search",
        "ann_recall",
        "doc_chunks",
        "hard_negatives",
        "kg_clustering",
    ):
        plan = plan_of(QUERIES[name].spark(spark, SF_DIR))
        assert "CartesianProduct" not in plan, name
        n_bnlj = _n_ops(plan, "BroadcastNestedLoopJoin")
        assert n_bnlj <= bnlj_budget.get(name, 0), name


def test_kg_sameas_rewrite_broadcast_mapping_no_cartesian(spark):
    """The sameAs merge joins the (node, component) mapping onto the
    triple stream twice — both joins must be broadcast hash joins under
    the count gate (fixture vocabulary ≪ threshold) and nothing in the
    plan may degenerate to a cartesian product."""
    from search_spark.queries import QUERIES

    plan = plan_of(QUERIES["kg_sameas_rewrite"].spark(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
