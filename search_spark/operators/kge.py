"""KG-embedding scoring harness: TransE energy + tail ranking, distributed.

Completes the KG-representation-learning story started by
``kg_negative_samples`` (corruption sampling) and ``kg_walk_skipgram``
(DeepWalk pair export): given node/relation embeddings, score triples with
the TransE translation energy ‖h + r − t‖₁ and rank each true tail against
a candidate set — the standard link-prediction evaluation loop (Bordes et
al. 2013, public). Training itself (SGD) belongs to the ML stack; what a
Spark engine owns at 10^12-triple scale is exactly this part — batch
scoring and ranking over the full graph.

Embeddings here are **deterministic hash features** (hex digits of
``md5(name)``, one 0–15 integer per dimension): the same
engine-portable trick the dedup family uses, which keeps the whole operator
reproducible in ANSI SQL for the oracle gate while exercising the real
distributed shape — explode-free array arithmetic on the JVM
(``zip_with`` + ``aggregate``), a broadcast candidate join, and a hash
aggregation for the rank. Swapping in learned embeddings is a one-line
change (join a vectors table instead of :func:`embed`).

Scale shape: scoring is embarrassingly parallel (no shuffle). Ranking
joins each triple against the candidate-tail set — candidates broadcast
(entity vocabulary ≪ triples; for open-web vocabularies use the sampled
``kg_negative_samples`` output as the candidate set instead, which is the
standard filtered-ranking protocol anyway), then one hash agg per triple.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from search_spark.joins import maybe_broadcast

EMB_DIM = 16  # md5 yields 32 hex digits; 16 keeps the oracle SQL readable


def _digit(h: Column, i: int) -> Column:
    """Value (0–15) of the i-th (1-based) hex digit of an md5 string."""
    return F.conv(F.substring(h, i, 1), 16, 10).cast("int")


def embed(name: Column, dim: int = EMB_DIM) -> Column:
    """``array<int>``: first ``dim`` hex digits of ``md5(name)`` as 0–15."""
    h = F.md5(name)
    return F.array(*[_digit(h, i + 1) for i in range(dim)])


def transe_energy(
    h: Column, r: Column, t: Column
) -> Column:
    """L1 translation energy Σᵢ |hᵢ + rᵢ − tᵢ| over int arrays — pure
    codegen (``zip_with`` twice + ``aggregate``), no Python."""
    hr = F.zip_with(h, r, lambda a, b: a + b)
    d = F.zip_with(hr, t, lambda a, b: F.abs(a - b))
    return F.aggregate(d, F.lit(0), lambda acc, x: acc + x)


def distmult_score(h: Column, r: Column, t: Column) -> Column:
    """DistMult bilinear score Σᵢ hᵢ·rᵢ·tᵢ (Yang et al., ICLR 2015 —
    public) over int arrays — higher is better, unlike TransE's energy.
    Same codegen shape: two ``zip_with`` + one ``aggregate``, no Python."""
    hr = F.zip_with(h, r, lambda a, b: a * b)
    d = F.zip_with(hr, t, lambda a, b: a * b)
    return F.aggregate(d, F.lit(0), lambda acc, x: acc + x)


def complex_score(h: Column, r: Column, t: Column) -> Column:
    """ComplEx score Re(Σᵢ hᵢ·rᵢ·conj(tᵢ)) (Trouillon et al., ICML 2016 —
    public) — higher is better. Each input is a ``2·dim`` array holding
    the real half then the imaginary half (md5 digits 1–16 / 17–32), so
    the (h, r, t)-array hook contract is unchanged; the four bilinear
    terms reduce to Re(h∘r)·Re(t) + Im(h∘r)·Im(t), six ``zip_with`` and
    one ``aggregate`` — still pure codegen. ``half`` derives from the
    actual array width, so any even ``dim`` works (not just the
    registered default)."""
    half = (F.size(h) / F.lit(2)).cast("int")
    one = F.lit(1)
    re_h, im_h = F.slice(h, one, half), F.slice(h, half + one, half)
    re_r, im_r = F.slice(r, one, half), F.slice(r, half + one, half)
    re_t, im_t = F.slice(t, one, half), F.slice(t, half + one, half)
    hr_re = F.zip_with(
        F.zip_with(re_h, re_r, lambda a, b: a * b),
        F.zip_with(im_h, im_r, lambda a, b: a * b),
        lambda a, b: a - b,
    )
    hr_im = F.zip_with(
        F.zip_with(re_h, im_r, lambda a, b: a * b),
        F.zip_with(im_h, re_r, lambda a, b: a * b),
        lambda a, b: a + b,
    )
    g = F.zip_with(
        F.zip_with(hr_re, re_t, lambda a, b: a * b),
        F.zip_with(hr_im, im_t, lambda a, b: a * b),
        lambda a, b: a + b,
    )
    return F.aggregate(g, F.lit(0), lambda acc, x: acc + x)


#: model hook: name → (score function, True when higher scores are better,
#: embedding width). Three built-in implementations — translation
#: (TransE), bilinear (DistMult), complex bilinear (ComplEx, packed
#: re‖im) — the canonical trio; learned models plug in by registering a
#: Column-level score function here. The ranking and metrics machinery
#: below is model-agnostic.
MODELS = {
    "transe": (transe_energy, False, EMB_DIM),
    "distmult": (distmult_score, True, EMB_DIM),
    "complex": (complex_score, True, 2 * EMB_DIM),
}


def score_triples(
    triples: DataFrame, dim: int | None = None, model: str = "transe"
) -> DataFrame:
    """Add ``energy`` (int) to ``(subj, pred, obj)`` rows using the named
    scoring model from :data:`MODELS` (column keeps the name ``energy``
    for schema stability across models). ``dim`` defaults to the model's
    registered embedding width."""
    score_fn, _, model_dim = MODELS[model]
    dim = model_dim if dim is None else dim
    if model == "complex" and dim % 2:
        raise ValueError(
            f"complex embeddings pack re\u2016im halves; dim must be even, got {dim}"
        )
    return triples.withColumn(
        "energy",
        score_fn(
            embed(F.col("subj"), dim),
            embed(F.col("pred"), dim),
            embed(F.col("obj"), dim),
        ),
    )


def rank_tails(
    triples: DataFrame,
    candidates: DataFrame,
    dim: int | None = None,
    model: str = "transe",
) -> DataFrame:
    """Rank each triple's true tail among candidate tails by model score.

    ``candidates`` needs one ``entity`` column (the tail vocabulary or a
    sampled subset). Rank = 1 + #candidates scoring strictly better +
    #candidates tied but lexicographically smaller (fully deterministic);
    the true tail itself is excluded from the corruption set (standard
    filtered ranking). ``model`` names an entry in :data:`MODELS` —
    "better" means lower energy for TransE, higher score for DistMult.
    Returns ``(subj, pred, obj, energy, rank, n_candidates)``.
    """
    score_fn, higher_is_better, model_dim = MODELS[model]
    dim = model_dim if dim is None else dim
    if model == "complex" and dim % 2:
        raise ValueError(
            f"complex embeddings pack re\u2016im halves; dim must be even, got {dim}"
        )
    # Embeddings materialize as array columns BEFORE the corruption join:
    # the join emits |triples| × |candidates| rows, and recomputing the
    # md5→digit chains there would put ~3·dim hash+conv calls in the hot
    # loop per pair — precomputed, the per-pair work is only the zip_with
    # arithmetic (the candidate arrays ride inside the broadcast table).
    scored = (
        triples.withColumn("_h", embed(F.col("subj"), dim))
        .withColumn("_r", embed(F.col("pred"), dim))
    )
    scored = scored.withColumn(
        "energy", score_fn(F.col("_h"), F.col("_r"), embed(F.col("obj"), dim))
    )
    cand = (
        candidates.select(F.col("entity").alias("cand"))
        .distinct()
        .withColumn("_c", embed(F.col("cand"), dim))
    )
    # entity vocabulary ≪ triples; gate the hint on the materialized count
    cand = maybe_broadcast(cand, cand.count())
    x = scored.join(cand, F.col("cand") != F.col("obj"))
    c_energy = score_fn(F.col("_h"), F.col("_r"), F.col("_c"))
    strictly_better = (
        c_energy > F.col("energy")
        if higher_is_better
        else c_energy < F.col("energy")
    )
    beats = strictly_better | (
        (c_energy == F.col("energy")) & (F.col("cand") < F.col("obj"))
    )
    return (
        x.groupBy("subj", "pred", "obj", "energy")
        .agg(
            (F.sum(beats.cast("int")) + 1).cast("int").alias("rank"),
            F.count("*").cast("int").alias("n_candidates"),
        )
    )


def ranking_metrics(ranked: DataFrame) -> DataFrame:
    """Standard filtered link-prediction metrics over :func:`rank_tails`
    output: MRR, Hits@1/3/10, mean rank, triple count — the evaluation
    protocol of the TransE line of work (Bordes et al., NeurIPS 2013).

    One global hash aggregate (the metrics are corpus-level by
    definition; group upstream for per-relation breakdowns). Values are
    rounded to 6 decimals so the numbers are stable across engines and
    summation orders."""
    def hits(k: int) -> Column:
        return F.round(
            F.avg((F.col("rank") <= k).cast("double")), 6
        ).alias(f"hits_at_{k}")

    return ranked.agg(
        F.round(F.avg(F.lit(1.0) / F.col("rank")), 6).alias("mrr"),
        hits(1),
        hits(3),
        hits(10),
        F.round(F.avg(F.col("rank").cast("double")), 6).alias("mean_rank"),
        F.count(F.lit(1)).alias("n_triples"),
    )
