"""Lexical ranking primitives: BM25 top-k and inverted posting lists.

The reference's search stack ranks by embedding cosine
(``search.py``); a web-scale corpus engine also needs the lexical side —
BM25 is the standard first-stage ranker, and the inverted index is the
structure web search builds from exactly this kind of corpus table.
Both are pure DataFrame compositions:

* :func:`bm25_topk` — score a fixed query against every document. The
  only corpus-wide aggregations are doc lengths (one shuffle keyed by
  doc) and the 1-row (N, avgdl) statistic; the per-term work is
  *filtered to the query's terms before the first shuffle*, so the
  heavy (doc, term) aggregation only ever sees matching tokens. The
  per-document score folds term components in sorted-term order
  (``aggregate`` over ``sort_array(collect_list(struct))``) so the
  floating-point summation order is deterministic and bit-identical to
  the SQL oracle's ordered ``list_reduce``.
* :func:`inverted_postings` — term → (df, cf, sorted posting list).
  One shuffle to (doc, term) counts, one to the term key; posting
  arrays are bounded by ``max_postings`` with a loud overflow marker
  column instead of silent truncation.

At 10^12 documents: BM25's query-term filter makes the scored relation
|matching tokens|, not |tokens|; posting lists shard by term (the
natural key) and the hot-term bound is explicit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_spark.operators.tfidf import TOKEN_PATTERN

BM25_K1 = 1.2
BM25_B = 0.75


def _tokens(docs: DataFrame, doc_id: str, text_col: str) -> DataFrame:
    return docs.select(
        F.col(doc_id),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}', 0)")
        ).alias("term"),
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    doc_id: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
    topk: int = 10,
) -> DataFrame:
    """Okapi BM25 top-k for a fixed term set.

    ``score(D) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))``
    with ``idf(t) = ln(1 + (N-df+0.5)/(df+0.5))``; ``avgdl`` averages
    over all N docs (token-less docs count with length 0). Ties break on
    ascending doc id. Returns ``(doc_id, score)``, score rounded to 6.
    """
    toks = _tokens(docs, doc_id, text_col)
    dl = toks.groupBy(doc_id).agg(F.count(F.lit(1)).alias("dl"))
    stats = (
        docs.agg(F.count(F.lit(1)).alias("n_docs"))
        .crossJoin(
            dl.agg(
                F.coalesce(F.sum("dl"), F.lit(0)).alias("total_tokens")
            )
        )
        .select(
            "n_docs",
            (F.col("total_tokens") / F.col("n_docs")).alias("avgdl"),
        )
    )
    # restrict to query terms BEFORE the (doc, term) shuffle
    qt = toks.filter(F.col("term").isin(list(query_terms)))
    tf = qt.groupBy(doc_id, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    comp = (
        tf.join(F.broadcast(df_), on="term")
        .join(dl, on=doc_id)
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(doc_id),
            "term",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") / F.col("avgdl")
                    )
                )
            ).alias("comp"),
        )
    )
    scored = comp.groupBy(doc_id).agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("term", "comp"))),
            F.lit(0.0),
            lambda acc, x: acc + x["comp"],
        ).alias("score")
    )
    return (
        scored.orderBy(F.desc("score"), F.asc(doc_id))
        .limit(topk)
        .select(doc_id, F.round("score", 6).alias("score"))
    )


def inverted_postings(
    docs: DataFrame,
    doc_id: str = "doc_id",
    text_col: str = "text",
    max_postings: int = 10_000,
) -> DataFrame:
    """Inverted index rows: ``(term, df, cf, postings, truncated)``.

    ``df`` = documents containing the term, ``cf`` = total occurrences,
    ``postings`` = the ``max_postings`` smallest doc ids, ``truncated``
    flags terms that hit the cap. The cap is applied *before* the
    collect (row_number window over the per-term doc order), so a hot
    stop-word never materializes an unbounded array in one aggregation
    buffer — its exact df/cf still come from plain partial-aggregating
    counts.
    """
    from pyspark.sql import Window

    tf = _tokens(docs, doc_id, text_col).groupBy("term", doc_id).agg(
        F.count(F.lit(1)).alias("tf")
    )
    counts = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("cf"),
    )
    rn = F.row_number().over(
        Window.partitionBy("term").orderBy(F.col(doc_id).asc())
    )
    capped = (
        tf.withColumn("__rn", rn)
        .filter(F.col("__rn") <= max_postings)
        .groupBy("term")
        .agg(F.sort_array(F.collect_list(F.col(doc_id))).alias("postings"))
    )
    return counts.join(capped, on="term").select(
        "term",
        "df",
        "cf",
        "postings",
        (F.col("df") > max_postings).alias("truncated"),
    )
