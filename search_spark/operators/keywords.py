"""RAKE-style keyword extraction (Rose et al. 2010, public) — degree
scoring, fully JVM-side and integer-exact.

Candidate phrases are maximal stopword-free token runs; a word's *degree*
is the summed length of all phrases (corpus-wide) it appears in, and a
phrase scores the sum of its words' degrees. This is RAKE's deg(w) scoring
variant — kept integer so the score is engine-exact (no float-order drift
between Spark and the SQL oracle).

Distributed shape: one token explode with a running stopword-count (window
per doc — the same doc-grained single shuffle the segmenter uses), one
corpus-wide word-degree aggregate (hash agg, map-side partial), a
vocabulary-sized degree dim joined back (unhinted — AQE broadcasts when it
fits), and a per-doc top-k window. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rake_keywords(
    docs: DataFrame,
    stopwords: tuple[str, ...],
    top_k: int = 3,
    min_len: int = 2,
) -> DataFrame:
    """Top-``top_k`` keyword phrases per document.

    ``docs`` needs ``(doc_id, text)``; tokens are whitespace-split and
    lower-cased. Phrases shorter than ``min_len`` words are dropped (the
    usual single-word-noise guard). Returns ``(doc_id, phrase, n_words,
    score, kw_rank)`` with ties broken on the phrase text.
    """
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), " ")).alias("tpos", "tok"),
    ).withColumn("tok", F.regexp_replace("tok", r"[.,;:!?]+$", ""))
    stop = F.col("tok").isin(*stopwords) | (F.col("tok") == "")
    w_doc = (
        Window.partitionBy("doc_id")
        .orderBy("tpos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    runs = toks.withColumn(
        "phrase_id", F.sum(stop.cast("int")).over(w_doc)
    ).filter(~stop)
    # corpus-wide word degree: sum over containing phrases of phrase length
    phrase_words = runs.select("doc_id", "phrase_id", "tok")
    phrase_len = phrase_words.groupBy("doc_id", "phrase_id").agg(
        F.count("*").alias("p_len")
    )
    with_len = phrase_words.join(phrase_len, ["doc_id", "phrase_id"])
    degree = with_len.groupBy("tok").agg(
        F.sum("p_len").cast("long").alias("deg")
    )
    scored_words = with_len.join(degree, "tok")
    phrases = (
        runs.groupBy("doc_id", "phrase_id")
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(F.struct("tpos", "tok"))
                ).getField("tok"),
                " ",
            ).alias("phrase"),
            F.count("*").alias("n_words"),
        )
    )
    scores = scored_words.groupBy("doc_id", "phrase_id").agg(
        F.sum("deg").cast("long").alias("score")
    )
    cand = (
        phrases.join(scores, ["doc_id", "phrase_id"])
        .filter(F.col("n_words") >= min_len)
    )
    w_rank = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("phrase")
    )
    return (
        cand.withColumn("kw_rank", F.row_number().over(w_rank))
        .filter(F.col("kw_rank") <= top_k)
        .select("doc_id", "phrase", "n_words", "score", "kw_rank")
    )
