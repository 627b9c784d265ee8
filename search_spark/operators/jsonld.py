"""JSON-LD (schema.org) structured-data extraction — entirely JVM-side.

Pages that carry ``<script type="application/ld+json">`` blocks hand the KG
constructor ready-made triples: the block's ``@type``/``@id`` name the
entity and every scalar property is a ``(subj, pred, obj)`` with perfect
precision — the highest-quality source on a Common-Crawl-style corpus and
the usual bootstrap for web KGs.  The reference has no equivalent (its
inputs are curated article formats); on webtext it is table stakes.

The whole extraction is codegen — no UDF touches the page bytes:

1. ``decode`` + ``regexp_extract_all`` pulls the raw JSON blocks (one
   array element per block, multiple blocks per page supported),
2. ``from_json(..., 'map<string,string>')`` parses each block into a
   key→value map (schema.org markup in the wild is overwhelmingly one
   entity of scalar properties per block); a *nested* value does NOT fail
   the map cast — Spark surfaces it as its canonical-JSON text, so the
   block's scalar properties still triple-ify and the nested one lands as
   a JSON literal (schema induction / shape validation see it as text).
   Only a syntactically malformed block parses to NULL and is skipped —
   counted, not crashed,
3. ``explode`` of the map emits property rows; ``@``-keys route to the
   entity header (``@id`` > ``name`` > url#block as the subject cascade)
   and the rest become triples with ``rdf:type`` from ``@type``.

Scale: the regex scan is part of the page-scan stage (no shuffle); the
only shuffle is whatever the caller aggregates afterwards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tolerate attribute order/extras and either quote style around the type —
# real markup is <script async type='application/ld+json' nonce=...>
_BLOCK_RE = (
    "<script[^>]*type\\s*=\\s*[\"']application/ld\\+json[\"'][^>]*>"
    "\\s*(\\{[^<]*\\})\\s*</script>"
)


def jsonld_blocks(web_pages: DataFrame) -> DataFrame:
    """``(url, b_idx, block)`` — one row per JSON-LD block on the page."""
    html_s = F.decode(F.col("html"), "UTF-8")
    return web_pages.select(
        "url",
        F.posexplode(
            F.regexp_extract_all(html_s, F.lit(_BLOCK_RE), F.lit(1))
        ).alias("b_idx", "block"),
    )


def jsonld_triples(web_pages: DataFrame) -> DataFrame:
    """Flat JSON-LD blocks → ``(subj, pred, obj, prov)`` triples.

    Subject cascade per block: ``@id`` if present, else ``name``, else
    ``url#b<idx>`` — the same deterministic-identifier discipline as the
    uid cascade in extraction/metadata.py.  ``@type`` emits an
    ``rdf:type`` triple; other ``@``-keys are JSON-LD keywords, not
    properties, and are dropped.  Nested property values surface as
    canonical-JSON string literals (see module docstring); only
    syntactically malformed blocks are skipped.
    """
    blocks = jsonld_blocks(web_pages).withColumn(
        "kv", F.from_json("block", "map<string,string>")
    )
    blocks = blocks.filter(F.col("kv").isNotNull()).select(
        "url",
        "b_idx",
        "kv",
        F.coalesce(
            F.col("kv")["@id"],
            F.col("kv")["name"],
            F.concat(F.col("url"), F.lit("#b"), F.col("b_idx")),
        ).alias("subj"),
        F.concat(F.col("url"), F.lit("#b"), F.col("b_idx")).alias("prov"),
    )
    props = blocks.select(
        "subj",
        "prov",
        F.explode("kv").alias("pred", "obj"),
    )
    type_triples = props.filter(F.col("pred") == "@type").select(
        "subj", F.lit("rdf:type").alias("pred"), "obj", "prov"
    )
    prop_triples = props.filter(
        ~F.col("pred").startswith("@") & F.col("obj").isNotNull()
    ).select("subj", "pred", "obj", "prov")
    return type_triples.unionByName(prop_triples)
