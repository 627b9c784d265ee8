"""TF-IDF embedding model — a second, genuinely different implementation of
the EmbeddingModel hook.

Reference analogue: ``SklearnVectorizer`` (embedding_models.py:171-237)
wraps a pickled sklearn ``TfidfVectorizer`` beside the transformer model;
both plug into the same ``embed_many`` contract. This module reimplements
the TF-IDF math from its public definition (sklearn semantics:
``token_pattern=r"\\b\\w\\w+\\b"`` on lowercased text, raw term counts,
smooth idf ``ln((1+n)/(1+df)) + 1``, ``max_features`` by corpus term
frequency with alphabetical tie-break) — no sklearn import.

Spark-first split:

* **fit** is one distributed aggregation over the corpus (tokenize in
  codegen via ``regexp_extract_all`` + ``explode``, aggregate counts /
  document frequencies, keep the top ``max_features`` terms); only the
  vocabulary-sized result reaches the driver.
* **transform** is the vectorization of each text against the *fitted*
  vocabulary — the fitted state (term → (index, idf), bounded by
  ``max_features``) is captured in the UDF closure and ships to executors
  once, the distributed form of the reference loading the pickled
  vectorizer per worker.

Vectors are ``array<double>`` (not float32): the driver's oracle gate
re-derives the same weights relationally in DuckDB, and double end-to-end
keeps the two engines bit-identical under sequential index-order folds.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# sklearn's (?u)\b\w\w+\b restricted to its ASCII core — identical
# semantics under Python re, Java regex and DuckDB/RE2 (no lookarounds,
# memory rule for cross-engine parity)
TOKEN_PATTERN = "[a-z0-9_]{2,}"


def tokenize(text: str) -> list[str]:
    return re.findall(TOKEN_PATTERN, text.lower())


class TfidfEmbeddingModel:
    """Fitted TF-IDF vectorizer implementing the EmbeddingModel contract
    (``dim`` / ``dtype`` / ``embed_many``) used by
    :func:`search_spark.operators.linking.embed_text_column`."""

    dtype = T.DoubleType()

    def __init__(self, vocab: list[tuple[str, int]], n_docs: int):
        """``vocab``: (term, document_frequency) pairs; terms are stored
        sorted alphabetically (sklearn vocabulary order)."""
        self.n_docs = n_docs
        terms = sorted(vocab)
        self.index = {t: i for i, (t, _) in enumerate(terms)}
        self.idf = [
            math.log((1.0 + n_docs) / (1.0 + df)) + 1.0 for _, df in terms
        ]
        self.dim = len(terms)

    @classmethod
    def fit(
        cls, df: DataFrame, text_col: str, max_features: int = 256
    ) -> "TfidfEmbeddingModel":
        """One aggregation pass over the corpus; tokenization stays in
        codegen (``regexp_extract_all``), only ``max_features`` rows are
        collected."""
        n_docs = df.count()
        toks = df.select(
            F.col(text_col),
            F.monotonically_increasing_id().alias("_fit_doc"),
        ).select(
            "_fit_doc",
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), 0
                )
            ).alias("term"),
        )
        stats = toks.groupBy("term").agg(
            F.count(F.lit(1)).alias("ctf"),
            F.countDistinct("_fit_doc").alias("dfreq"),
        )
        top = (
            stats.orderBy(F.desc("ctf"), F.asc("term"))
            .limit(max_features)
            .collect()
        )
        return cls([(r["term"], r["dfreq"]) for r in top], n_docs)

    def embed_many(self, texts) -> list[list[float]]:
        out = []
        for text in texts:
            vec = [0.0] * self.dim
            for tok in tokenize(text):
                i = self.index.get(tok)
                if i is not None:
                    vec[i] += 1.0
            for i, w in enumerate(vec):
                if w:
                    vec[i] = w * self.idf[i]
            out.append(vec)
        return out
