"""Offline training for the learned linear model artifacts (VERDICT r3
item 2).

Trains two tiny logistic-regression models on engine-generated data and
ships the weights as parquet tables (+ JSON sidecars) under ``models/``:

* **NER mention scorer** (``ner_linear.parquet``): distinguishes true
  gazetteer mentions from corrupted negative spans sampled from the same
  sentences, over the interpretable :data:`linear_models.NER_FEATURES`.
* **Relation classifier** (``re_linear.parquet``): reproduces the
  reference's StartWithTheSameLetter labeling (relation.py:252-284 —
  the pipeline's deterministic ground truth) from pair-geometry features,
  so deployment parity vs the rule scorer is directly checkable
  (P/R ≥ 0.95 gate printed at train time).

Everything is deterministic: fixed corpus seed, zero-init weights,
full-batch gradient descent (no RNG in the optimizer), md5-based
negative sampling and train/holdout split. Re-running this script
reproduces the committed artifacts bit-for-bit.

Usage: python tools/train_linear_models.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CORPUS_SEED = 13
N_DOCS_DEFAULT = 400
EPOCHS = 600
LR = 0.5
L2 = 1e-4


def _fit_logreg(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, float]:
    """Full-batch GD from zero init — deterministic, no RNG."""
    w = np.zeros(x.shape[1])
    b = 0.0
    n = len(y)
    for _ in range(EPOCHS):
        p = 1.0 / (1.0 + np.exp(-(x @ w + b)))
        g = p - y
        w -= LR * ((x.T @ g) / n + L2 * w)
        b -= LR * float(g.mean())
    return w, b


def _metrics(x, y, w, b) -> dict:
    p = 1.0 / (1.0 + np.exp(-(x @ w + b)))
    pred = (p >= 0.5).astype(float)
    tp = float(((pred == 1) & (y == 1)).sum())
    fp = float(((pred == 1) & (y == 0)).sum())
    fn = float(((pred == 0) & (y == 1)).sum())
    prec = tp / max(tp + fp, 1.0)
    rec = tp / max(tp + fn, 1.0)
    # rank-based AUC (no sklearn in the container)
    order = np.argsort(p, kind="stable")
    ranks = np.empty(len(p))
    ranks[order] = np.arange(1, len(p) + 1)
    n_pos, n_neg = float(y.sum()), float((1 - y).sum())
    auc = (
        (ranks[y == 1].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
        if n_pos and n_neg
        else 1.0
    )
    return {
        "n": int(len(y)),
        "accuracy": round(float((pred == y).mean()), 4),
        "precision": round(prec, 4),
        "recall": round(rec, 4),
        "auc": round(float(auc), 4),
    }


def _write_artifact(spark, name: str, features, w, b, classes, positive,
                    train_m, holdout_m, extra) -> None:
    import pandas as pd

    os.makedirs(os.path.join(REPO, "models"), exist_ok=True)
    rows = [{"feature": f, "weight": round(float(v), 8)}
            for f, v in zip(features, w)]
    rows.append({"feature": "__bias__", "weight": round(float(b), 8)})
    pdf = pd.DataFrame(rows)
    pdf.to_parquet(os.path.join(REPO, "models", f"{name}.parquet"),
                   index=False)
    meta = {
        "features": list(features),
        "weights": [r["weight"] for r in rows[:-1]],
        "bias": rows[-1]["weight"],
        "classes": classes,
        "positive_class": positive,
        "trained": {
            "corpus_seed": CORPUS_SEED,
            "epochs": EPOCHS,
            "lr": LR,
            "l2": L2,
            "optimizer": "full-batch GD, zero init (deterministic)",
            "train_metrics": train_m,
            "holdout_metrics": holdout_m,
            **extra,
        },
    }
    with open(os.path.join(REPO, "models", f"{name}.json"), "w") as f:
        json.dump(meta, f, indent=2)
    print(f"{name}: holdout {holdout_m}")


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else N_DOCS_DEFAULT

    from pyspark.sql import functions as F

    from search_spark import datagen
    from search_spark.extraction.extract import extract_stage
    from search_spark.operators import linear_models as lm
    from search_spark.operators.ner import ner_stage
    from search_spark.operators.relations import DIFF, SAME
    from search_spark.operators.segment import segment_stage
    from search_spark.session import get_spark

    spark = get_spark("train-linear-models")
    spark.sparkContext.setLogLevel("ERROR")

    pages = datagen.generate_web_pages(spark, n_docs, seed=CORPUS_SEED)
    sentences = segment_stage(extract_stage(pages)).persist()
    mentions = ner_stage(
        sentences, [(t, e) for e, ts in datagen.GAZETTEER.items()
                    for t in ts]
    ).persist()

    # ---- NER scorer --------------------------------------------------
    # positives: true mentions with their sentence window
    sent_key = ["url", "uid", "ppos", "spos"]
    with_text = mentions.join(
        sentences.select(*sent_key, "text"), on=sent_key
    )
    pos = with_text.select(
        lm.ner_feature_array(
            F.col("mention"), F.col("start_char"), F.col("text"),
            F.col("entity_type"),
        ).alias("x"),
        F.lit(1.0).alias("y"),
        F.md5(F.concat_ws("|", *sent_key, "start_char")).alias("h"),
    )
    # negatives: a deterministic mid-sentence token span per sentence
    # that is NOT a gazetteer term, tagged with a rotating entity type
    toks = sentences.filter(~F.col("is_bad")).select(
        *sent_key, "text", F.split(F.col("text"), r"\s+").alias("tk")
    ).filter(F.size("tk") >= 4)
    gaz_terms = [t.lower() for ts in datagen.GAZETTEER.values() for t in ts]
    etype_arr = F.array(*[F.lit(t) for t in lm.ETYPES])
    neg_idx = (F.xxhash64(F.col("uid"), F.col("spos")) % 2 + 1)
    neg = (
        toks.withColumn("m", F.element_at("tk", neg_idx.cast("int") + 1))
        .filter(
            (F.length("m") > 2)
            & ~F.lower("m").isin(gaz_terms)
            & F.col("m").rlike("^[A-Za-z][A-Za-z0-9-]*$")
        )
        .withColumn(
            "etype",
            F.element_at(
                etype_arr,
                (F.abs(F.xxhash64(F.col("m"))) % 4 + 1).cast("int"),
            ),
        )
        .withColumn("start", F.instr(F.col("text"), F.col("m")) - 1)
        .filter(F.col("start") >= 0)
        .select(
            lm.ner_feature_array(
                F.col("m"), F.col("start"), F.col("text"), F.col("etype")
            ).alias("x"),
            F.lit(0.0).alias("y"),
            F.md5(F.concat_ws("|", *sent_key, "m")).alias("h"),
        )
    )
    data = pos.unionByName(neg).collect()
    x = np.array([r["x"] for r in data])
    y = np.array([r["y"] for r in data])
    hold = np.array([r["h"] < "3" for r in data])  # ~19% holdout, stable
    w, b = _fit_logreg(x[~hold], y[~hold])
    _write_artifact(
        spark, "ner_linear", lm.NER_FEATURES, w, b,
        classes=["MENTION", "NOT_MENTION"], positive="MENTION",
        train_m=_metrics(x[~hold], y[~hold], w, b),
        holdout_m=_metrics(x[hold], y[hold], w, b),
        extra={"n_docs": n_docs, "task": "true gazetteer mention vs "
               "corrupted negative span"},
    )

    # ---- relation classifier ----------------------------------------
    # pair geometry via the same ordered co-sentence self-join
    # relation_stage performs; ground truth = the engine's default JVM
    # rule labels (the reference's own deterministic REModel)
    subj = mentions.select(
        *sent_key,
        F.col("start_char").alias("s_start"),
        F.col("end_char").alias("s_end"),
        F.col("mention").alias("s_mention"),
        F.col("entity_type").alias("s_type"),
    )
    obj = mentions.select(
        *sent_key,
        F.col("start_char").alias("o_start"),
        F.col("end_char").alias("o_end"),
        F.col("mention").alias("o_mention"),
        F.col("entity_type").alias("o_type"),
    )
    pairs = (
        subj.join(obj, on=sent_key)
        .filter(
            (F.col("s_start") != F.col("o_start"))
            | (F.col("s_end") != F.col("o_end"))
        )
        .join(
            F.broadcast(
                datagen.relation_pairs_df(spark)
                .withColumnRenamed("subj_type", "s_type")
                .withColumnRenamed("obj_type", "o_type")
            ),
            on=["s_type", "o_type"],
        )
        .withColumn(
            "property",
            F.when(
                F.lower(F.substring("s_mention", 1, 1))
                == F.lower(F.substring("o_mention", 1, 1)),
                F.lit(SAME),
            ).otherwise(F.lit(DIFF)),
        )
    )
    rdata = pairs.select(
        lm.re_feature_array({
            "s_mention": F.col("s_mention"), "o_mention": F.col("o_mention"),
            "s_start": F.col("s_start"), "s_end": F.col("s_end"),
            "o_start": F.col("o_start"), "o_end": F.col("o_end"),
        }).alias("x"),
        (F.col("property") == SAME).cast("double").alias("y"),
        F.md5(F.concat_ws("|", *sent_key, "s_start", "o_start")).alias("h"),
    ).collect()
    xr = np.array([r["x"] for r in rdata])
    yr = np.array([r["y"] for r in rdata])
    holdr = np.array([r["h"] < "3" for r in rdata])
    wr, br = _fit_logreg(xr[~holdr], yr[~holdr])
    hm = _metrics(xr[holdr], yr[holdr], wr, br)
    _write_artifact(
        spark, "re_linear", lm.RE_FEATURES, wr, br,
        classes=[SAME, DIFF], positive=SAME,
        train_m=_metrics(xr[~holdr], yr[~holdr], wr, br),
        holdout_m=hm,
        extra={"n_docs": n_docs, "task": "reproduce the deterministic "
               "first-letter relation labels from pair geometry"},
    )
    gate = hm["precision"] >= 0.95 and hm["recall"] >= 0.95
    print(f"RE parity gate (P/R >= 0.95 vs rule labels): "
          f"{'PASS' if gate else 'FAIL'}")
    spark.stop()
    return 0 if gate else 1


if __name__ == "__main__":
    raise SystemExit(main())
