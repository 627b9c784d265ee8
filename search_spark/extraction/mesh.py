"""MeSH topic-tree parsing and ancestor resolution — local RDF files only.

Reference analogues (``database/mesh.py``; same regexes and semantics
because the NLM MeSH RDF N-triples format dictates them):

  * ``parse_tree_numbers`` (mesh.py:157-239) — MeSH RDF ``.nt`` stream →
    ``tree_number → label``. The reference streams the ~half-GB file
    line-by-line on one core; here the lines are a DataFrame column and
    the whole parse is JVM-side regex over a distributed scan
    (:func:`tree_numbers_stage`) — no Python in the hot path.
  * ``MeSHTree.parents`` / ``parent_topics`` / ``resolve_parents``
    (mesh.py:91-155) — topic lists expand with all ancestor topics before
    topic-rule filtering (the reference applies this in
    ``topic_extract``, entrypoint/database/topic_extract.py:172-217).
    Here the tree is a ``(tree_number, label)`` dim table broadcast to a
    pure-JVM expansion (:func:`resolve_parent_topics`): ancestor tree
    numbers are prefix slices (``A0.1.2 → A0.1, A0``) computed with
    ``transform``/``slice`` higher-order functions — zero UDF, zero
    driver loop.

The pure-Python :func:`parse_tree_numbers` / :func:`resolve_parents`
mirror the reference's contracts one-to-one (parity-tested against the
vendored reference module) and serve as the independent ground truth for
the Spark implementations.
"""

from __future__ import annotations

import re
from collections import defaultdict
from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# same patterns as the reference (mesh.py:208-218); the formats are fixed
# by the NLM MeSH RDF publication
P_LINE = r"^(<.*>) (<.*>) (.*) \.$"
P_DESC = r"^<http://id\.nlm\.nih\.gov/mesh/\d{4}/(D\d{3,})>$"
P_EN_LABEL = r'^"(.*)"@en$'
P_TREE_NUMBER = r"^<http://id\.nlm\.nih\.gov/mesh/\d{4}/(.*)>$"
PRED_LABEL = "<http://www.w3.org/2000/01/rdf-schema#label>"
PRED_TREE_NUMBER = "<http://id.nlm.nih.gov/mesh/vocab#treeNumber>"


# -- pure-Python mirrors (parity contract + oracle ground truth) ----------

def parse_tree_numbers(lines: Iterable[str]) -> dict[str, str]:
    """MeSH RDF N-triples → ``tree_number → label`` (mesh.py:157-239)."""
    id_to_label: dict[str, str] = {}
    id_to_tree_numbers: dict[str, list[str]] = defaultdict(list)
    for line in lines:
        m_line = re.fullmatch(P_LINE, line.strip())
        if not m_line:
            raise RuntimeError(f"The line is not a valid triple: {line!r}")
        subj, pred, obj = m_line.groups()
        m_desc = re.fullmatch(P_DESC, subj)
        if not m_desc:
            continue
        id_ = m_desc.group(1)
        if pred == PRED_LABEL:
            m_label = re.fullmatch(P_EN_LABEL, obj)
            if not m_label:
                continue
            if id_ in id_to_label:
                raise RuntimeError(f"Multiple labels for ID={id_}")
            id_to_label[id_] = m_label.group(1)
        elif pred == PRED_TREE_NUMBER:
            m_tn = re.fullmatch(P_TREE_NUMBER, obj)
            if not m_tn:
                raise RuntimeError(f"Cannot parse tree number: {obj}")
            id_to_tree_numbers[id_].append(m_tn.group(1))
    tree_number_to_label: dict[str, str] = {}
    for id_, label in id_to_label.items():
        for tn in id_to_tree_numbers[id_]:
            if tn in tree_number_to_label:
                raise RuntimeError(f"Duplicate tree number: {tn}")
            tree_number_to_label[tn] = label
    return tree_number_to_label


def parents(tree_number: str) -> list[str]:
    """Ancestor tree numbers, nearest first (mesh.py:91-108)."""
    parts = tree_number.split(".")
    return [".".join(parts[:n]) for n in reversed(range(1, len(parts)))]


def resolve_parents(
    topics: Iterable[str], tree_number_to_label: dict[str, str]
) -> set[str]:
    """Topics ∪ all ancestor topics (mesh.py:110-155). Labels absent from
    the tree pass through unexpanded (defaultdict semantics)."""
    label_to_tns: dict[str, list[str]] = defaultdict(list)
    for tn, label in tree_number_to_label.items():
        label_to_tns[label].append(tn)
    resolved = set(topics)
    for topic in topics:
        for tn in label_to_tns[topic]:
            for parent in parents(tn):
                resolved.add(tree_number_to_label[parent])
    return resolved


# -- Spark implementations ------------------------------------------------

def tree_numbers_stage(
    df: DataFrame, line_col: str = "value", validate: bool = True
) -> DataFrame:
    """Distributed MeSH RDF parse: lines → ``(tree_number, label)``.

    Pure JVM regex (``regexp_extract`` over the scan); at the real file's
    scale (~10^7 lines) the parse is embarrassingly parallel and only the
    descriptor-sized result survives the joins. ``validate=True`` runs one
    cheap aggregation asserting the reference's fail-loud invariants
    (every line a triple; one English label per descriptor; globally
    unique tree numbers).
    """
    line = F.trim(F.col(line_col))
    triples = df.select(
        line.alias("_line"),
        F.regexp_extract(line, P_LINE, 1).alias("subj"),
        F.regexp_extract(line, P_LINE, 2).alias("pred"),
        F.regexp_extract(line, P_LINE, 3).alias("obj"),
    ).filter(line != "")
    if validate:
        n_bad = triples.filter(F.col("subj") == "").count()
        if n_bad:
            raise RuntimeError(f"{n_bad} lines are not valid triples")
    desc = triples.withColumn(
        "id", F.regexp_extract(F.col("subj"), P_DESC, 1)
    ).filter(F.col("id") != "")
    labels = (
        desc.filter(F.col("pred") == PRED_LABEL)
        .withColumn("label", F.regexp_extract(F.col("obj"), P_EN_LABEL, 1))
        .filter(F.col("obj").rlike(P_EN_LABEL))
        .select("id", "label")
    )
    trees = (
        desc.filter(F.col("pred") == PRED_TREE_NUMBER)
        .withColumn(
            "tree_number", F.regexp_extract(F.col("obj"), P_TREE_NUMBER, 1)
        )
        .select("id", "tree_number")
    )
    if validate:
        dup_labels = (
            labels.groupBy("id").count().filter(F.col("count") > 1).count()
        )
        if dup_labels:
            raise RuntimeError(f"{dup_labels} descriptors have >1 en label")
        dup_tns = (
            trees.groupBy("tree_number")
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        if dup_tns:
            raise RuntimeError(f"{dup_tns} duplicate tree numbers")
    return trees.join(labels, on="id", how="inner").select(
        "tree_number", "label"
    )


def ancestors_col(tree_number_col: str | F.Column) -> F.Column:
    """Array of ancestor tree numbers of a tree-number column — prefix
    slices computed entirely in codegen (``A0.1.2 → [A0.1, A0]``)."""
    col = (
        F.col(tree_number_col)
        if isinstance(tree_number_col, str)
        else tree_number_col
    )
    parts = F.split(col, r"\.")
    return F.when(
        F.size(parts) > 1,
        F.transform(
            F.sequence(F.size(parts) - 1, F.lit(1), F.lit(-1)),
            lambda n: F.array_join(F.slice(parts, 1, n), "."),
        ),
    ).otherwise(F.array().cast("array<string>"))


def resolve_parent_topics(
    df: DataFrame,
    tree_df: DataFrame,
    key_cols: list[str],
    topics_col: str = "article_topics",
) -> DataFrame:
    """Expand a topic-list column with all MeSH ancestor topics —
    the Spark form of ``resolve_parents`` applied per row.

    Returns ``(key_cols..., topic)`` rows: each row's original topics plus
    every ancestor topic, distinct. The tree is descriptor-count-sized
    (~60k labels for the real MeSH) → broadcast both lookups; expansion
    width is bounded by topics-per-row × tree depth (≤ ~13), so the
    explode never blows up. Rows with empty topic lists produce no rows
    (the reference's TopicInfo would carry an empty set). Unlike the
    reference — which KeyErrors on a tree number whose ancestor label is
    missing — unknown ancestors are dropped (left join), the
    web-scale-tolerant choice.
    """
    keys = [F.col(k) for k in key_cols]
    ex = df.select(*keys, F.explode(topics_col).alias("topic"))
    by_label = tree_df.select(
        F.col("label").alias("topic"), "tree_number"
    )
    with_tn = ex.join(F.broadcast(by_label), on="topic", how="left")
    anc = with_tn.select(
        *keys,
        F.explode(ancestors_col("tree_number")).alias("anc_tn"),
    )
    anc_labels = anc.join(
        F.broadcast(
            tree_df.select(
                F.col("tree_number").alias("anc_tn"),
                F.col("label").alias("topic"),
            )
        ),
        on="anc_tn",
        how="inner",
    ).select(*keys, "topic")
    return ex.select(*keys, "topic").unionByName(anc_labels).distinct()
