"""Semantic search: the search-server query lifecycle as DataFrame ops.

Reference analogue: ``SearchEngine.query`` (search.py:64-288) —
query embedding → optional *deprioritization* combine → normalize →
SentenceFilter restriction → cosine against the embedding matrix → top-k
sentences → top-k articles. Everything here is JVM-side (``zip_with`` /
``aggregate`` higher-order functions); the embedding matrix is a column,
not a side-file (SURVEY.md §1.1).

Deprioritization weights (search.py:166-177): the combined query is
``w1 * q - w2 * d`` (then re-normalized, search.py:180-183), pulling
results away from the deprioritized text's region of embedding space.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from search_spark.operators.linking import cosine_col

# search.py:166-177 verbatim weight table (all five strengths)
DEPRIORITIZATION_WEIGHTS: dict[str, tuple[float, float]] = {
    "None": (1.0, 0.0),
    "Weak": (0.9, 0.1),
    "Mild": (0.8, 0.3),
    "Strong": (0.5, 0.5),
    "Stronger": (0.5, 0.7),
}


def _lit_vec(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def combine_query_vectors(
    query_vec: list[float], deprioritize_vec: list[float], strength: str
) -> list[float]:
    """Driver-side ``w1*q - w2*d`` + unit-normalize (search.py:166-183).

    Query vectors are request-sized — combining them in Python keeps the
    per-row scoring expression a plain literal array instead of a
    re-evaluated combine/normalize expression tree (measured ~2× on the
    scoring scan). Zero-norm combinations divide by 1, like the reference.
    """
    import math

    w1, w2 = DEPRIORITIZATION_WEIGHTS[strength]
    comb = [w1 * float(q) - w2 * float(d)
            for q, d in zip(query_vec, deprioritize_vec)]
    norm = math.sqrt(sum(x * x for x in comb))
    if norm == 0:
        norm = 1.0
    return [x / norm for x in comb]


def combine_queries(
    query_col: Column, deprioritize_col: Column, strength: str = "None"
) -> Column:
    """``w1*q - w2*d``, unit-normalized — all inside codegen (column form
    for embedded per-row query vectors; for literal request vectors prefer
    :func:`combine_query_vectors`)."""
    w1, w2 = DEPRIORITIZATION_WEIGHTS[strength]
    combined = F.zip_with(
        query_col, deprioritize_col, lambda q, d: w1 * q - w2 * d
    )
    norm = F.sqrt(
        F.aggregate(combined, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    # zero-norm guard (search.py:180-183): a combination that cancels to the
    # zero vector divides by 1, not 0 — scores become 0, not NaN
    norm = F.when(norm == 0, F.lit(1.0)).otherwise(norm)
    return F.transform(combined, lambda x: x / norm)


def semantic_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    restrict_ids: DataFrame | None = None,
    deprioritize_vec: list[float] | None = None,
    strength: str = "None",
) -> DataFrame:
    """Top-k rows by cosine similarity to (the combined) query vector.

    ``restrict_ids`` (single-column DataFrame of ids) is applied as a
    left-semi join *before* scoring — the SentenceFilter restriction
    (search.py:185-198) — so filtered rows never pay for the dot product.
    Plan shape: semi-join → per-row codegen score → TakeOrderedAndProject.
    """
    qv = [float(x) for x in query_vec]
    if deprioritize_vec is not None:
        qv = combine_query_vectors(qv, deprioritize_vec, strength)
    q = _lit_vec(qv)

    src = embeddings
    if restrict_ids is not None:
        other = restrict_ids.columns[0]
        src = src.join(
            restrict_ids.withColumnRenamed(other, id_col),
            on=id_col,
            how="left_semi",
        )
    ed = F.transform(F.col(emb_col), lambda x: x.cast("double"))
    # a fully-cancelled (zero) combined query scores 0 everywhere, like the
    # reference's dot-product against its zero-guarded normalized vector —
    # decided driver-side so no per-row division by zero can occur
    score = (
        F.lit(0.0) if not any(qv) else F.round(cosine_col(ed, q), 4)
    )
    scored = src.select(id_col, score.alias("score"))
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
