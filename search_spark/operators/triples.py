"""Stage 7 — materialize the mining cache / triples tables.

Reference analogue: the ``mining_cache`` table
(database/mining_cache.py:318-344) with the 10 canonical SPECS columns
(mining/pipeline.py:25-36) and ``paper_id = "{article_id}:{section}:{ppos}"``
(mining_cache.py:187), plus the ``ontology_source`` broadcast join the
mining server performs per request (server/mining_server.py:300-308).

Two outputs:

  * :func:`specs_stage` — the SPECS-faithful mining-cache DataFrame (union
    of entity rows and relation rows, ontology source joined on).
  * :func:`triples_stage` — the final KG orientation
    ``triples(subj, pred, obj, prov, …debug)``: relation rows become
    ``(subject entity, predicted relation, object entity)``, entity rows
    become ``(entity, "has_type", entity_type)`` so every detected mention
    is represented (the reference likewise emits one row per entity even
    without a relation, pipeline.py:119-129). When canonicalization has
    attached ``canonical_id`` columns, those replace surface forms as
    subj/obj.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SPECS = [
    "entity",
    "entity_type",
    "property",
    "property_value",
    "property_type",
    "property_value_type",
    "ontology_source",
    "paper_id",
    "start_char",
    "end_char",
]

HAS_TYPE_PRED = "has_type"


def _paper_id() -> F.Column:
    # "{uid}:{section}:{ppos}" — mining_cache.py:187 uses
    # "article_id:section_name:paragraph_pos"; uid is our article_id.
    return F.concat_ws(
        ":", F.col("uid"), F.coalesce(F.col("section"), F.lit("")), F.col("ppos")
    )


def specs_stage(
    mentions: DataFrame,
    relations: DataFrame,
    mining_schema: DataFrame,
) -> DataFrame:
    """Union entity + relation rows into the SPECS mining-cache shape.

    ``mining_schema`` is the tiny request table (entity_type →
    ontology_source); joined with an explicit ``broadcast`` hint.
    """
    entity_rows = mentions.select(
        F.col("mention").alias("entity"),
        "entity_type",
        F.lit(None).cast("string").alias("property"),
        F.lit(None).cast("string").alias("property_value"),
        F.lit(None).cast("string").alias("property_type"),
        F.lit(None).cast("string").alias("property_value_type"),
        _paper_id().alias("paper_id"),
        "start_char",
        "end_char",
        "url",
        "ppos",
    )
    relation_rows = relations.select(
        "entity",
        "entity_type",
        "property",
        "property_value",
        F.lit("relation").alias("property_type"),
        "property_value_type",
        _paper_id().alias("paper_id"),
        "start_char",
        "end_char",
        "url",
        "ppos",
    )
    unioned = entity_rows.unionByName(relation_rows)

    # deterministic pick when an entity type maps to several sources
    ontology = mining_schema.groupBy("entity_type").agg(
        F.min("ontology_source").alias("ontology_source")
    )
    joined = unioned.join(
        F.broadcast(ontology), on="entity_type", how="left"
    )
    return joined.select(*SPECS, "url", "ppos")


def triples_stage(specs: DataFrame) -> DataFrame:
    """SPECS rows → ``(subj, pred, obj, prov)`` + debug columns.

    If ``subj_canonical`` / ``obj_canonical`` columns are present (added by
    the linking/canonicalization stages), they take precedence over surface
    forms.
    """
    cols = set(specs.columns)
    subj = (
        F.coalesce(F.col("subj_canonical"), F.col("entity"))
        if "subj_canonical" in cols
        else F.col("entity")
    )
    obj_rel = (
        F.coalesce(F.col("obj_canonical"), F.col("property_value"))
        if "obj_canonical" in cols
        else F.col("property_value")
    )
    is_relation = F.col("property_type") == "relation"
    return specs.select(
        subj.alias("subj"),
        F.when(is_relation, F.col("property"))
        .otherwise(F.lit(HAS_TYPE_PRED))
        .alias("pred"),
        F.when(is_relation, obj_rel)
        .otherwise(F.col("entity_type"))
        .alias("obj"),
        F.col("paper_id").alias("prov"),
        "entity_type",
        "property_value_type",
        "ontology_source",
        "start_char",
        "end_char",
        "url",
    )
