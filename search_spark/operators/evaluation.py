"""Entity-level precision/recall/F1 as a DataFrame job.

Port of the reference's metric definitions (mining/eval.py:450-480 —
``ner_report``): a predicted span is a true positive iff an annotation with
the same ``(start, end)`` exists for the same unit of text and entity type;
precision = TP / n_pred, recall = TP / n_true, F1 = 2TP / (2TP + FP + FN).
The inner-merge-on-(start,end) becomes an equi-join; FN/FP fall out of the
counts (the reference's outer-merge+indicator, eval.py:572-578, is the same
join with anti semantics).

This job is the ≥0.95 triple-P/R gate from BASELINE.json: run the reference
(or ground truth) as ``truth``, the pipeline output as ``pred``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def entity_level_pr(
    truth: DataFrame,
    pred: DataFrame,
    keys: list[str] | None = None,
    by: str = "entity_type",
) -> DataFrame:
    """Per-``by``-group precision/recall/F1 of predicted spans.

    Both inputs need columns ``keys + [start_char, end_char, by]``; rows are
    deduplicated on that tuple first (a span is either found or not).
    """
    keys = keys or ["url", "ppos", "spos"]
    span_cols = keys + ["start_char", "end_char", by]
    t = truth.select(*span_cols).dropDuplicates(span_cols)
    p = pred.select(*span_cols).dropDuplicates(span_cols)

    tp = (
        t.join(p, on=span_cols, how="inner")
        .groupBy(by)
        .agg(F.count(F.lit(1)).alias("tp"))
    )
    n_true = t.groupBy(by).agg(F.count(F.lit(1)).alias("n_true"))
    n_pred = p.groupBy(by).agg(F.count(F.lit(1)).alias("n_pred"))

    report = (
        n_true.join(n_pred, on=by, how="full")
        .join(tp, on=by, how="left")
        .fillna(0, subset=["tp", "n_true", "n_pred"])
    )
    return report.select(
        by,
        "n_true",
        "n_pred",
        "tp",
        (F.col("tp") / F.col("n_pred")).alias("precision"),
        (F.col("tp") / F.col("n_true")).alias("recall"),
        (
            2 * F.col("tp")
            / (F.col("n_pred") + F.col("n_true"))
        ).alias("f1"),
    )


def triple_level_pr(truth: DataFrame, pred: DataFrame) -> dict:
    """Exact-match P/R over ``(subj, pred, obj, prov)`` triple sets —
    the headline BASELINE gate. Returns a plain dict of floats."""
    cols = ["subj", "pred", "obj", "prov"]
    t = truth.select(*cols).distinct()
    p = pred.select(*cols).distinct()
    tp = p.join(t, on=cols, how="inner").count()
    n_pred = p.count()
    n_true = t.count()
    precision = tp / n_pred if n_pred else 0.0
    recall = tp / n_true if n_true else 0.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall
        else 0.0
    )
    return {
        "tp": tp,
        "n_pred": n_pred,
        "n_true": n_true,
        "precision": precision,
        "recall": recall,
        "f1": f1,
    }
