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

import string

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

PUNCTUATION = tuple(string.punctuation)


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


def remove_punctuation_iob(
    df: DataFrame,
    tag_cols: list[str],
    order_col: str,
    group_cols: list[str] | None = None,
    text_col: str = "text",
    punct_col: str | None = None,
) -> DataFrame:
    """Move ``B-`` tags off punctuation tokens, then drop punctuation rows.

    Port of the reference's ``remove_punctuation`` (mining/eval.py:231-263),
    verified against its golden fixtures
    (tests/data/mining/eval/iob_punctuation_{before,after}.csv): for every
    punctuation token carrying a ``B-`` tag, the first following
    non-punctuation token is promoted to a ``B-`` tag of *its own* entity
    type (``I-X`` → ``B-X``; ``O`` stays ``O``); punctuation rows are
    removed. A ``B-`` run that ends at the end of a group lands nowhere
    (the reference's ``i < len(df) - 1`` walk has the same behavior).

    Distributed formulation (no per-row loop): a running count of
    non-punctuation tokens indexes each token's *landing slot*; punct-held
    ``B-`` flags aggregate per ``(group, slot)`` and broadcast-join back
    onto the non-punct rows — one window pass plus one aggregate per call,
    independent of run lengths.

    ``group_cols`` bounds the carry (reference semantics: one global token
    stream → pass a constant group; pipeline use: per-sentence groups).
    ``punct_col`` overrides the default is-punctuation predicate
    (``text ∈ string.punctuation``) with a precomputed boolean column.
    """
    group_cols = group_cols or []
    if group_cols:
        gcols = group_cols
        src = df
    else:
        src = df.withColumn("_g", F.lit(0))
        gcols = ["_g"]
    is_punct = (
        F.col(punct_col)
        if punct_col is not None
        else F.col(text_col).isin(*PUNCTUATION)
    )
    w = (
        Window.partitionBy(*gcols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # non-punct tokens: slot = their 1-based index among non-punct rows;
    # punct tokens: the slot their B- tag lands on is slot + 1
    with_slot = src.withColumn("_punct", is_punct).withColumn(
        "_slot", F.sum((~is_punct).cast("long")).over(w)
    )
    nonpunct = with_slot.filter(~F.col("_punct"))
    for tag in tag_cols:
        carries = (
            with_slot.filter(F.col("_punct") & F.col(tag).startswith("B-"))
            .select(*gcols, (F.col("_slot") + 1).alias("_slot"))
            .distinct()
            .withColumn(f"_carry_{tag}", F.lit(True))
        )
        # no broadcast hint: the carry set grows with the corpus (one row
        # per punctuation-held B tag) — AQE picks broadcast when it is
        # actually small and a partitioned join when it is not
        nonpunct = nonpunct.join(
            carries, on=gcols + ["_slot"], how="left"
        ).withColumn(
            tag,
            F.when(
                F.col(f"_carry_{tag}").isNotNull() & (F.col(tag) != "O"),
                F.concat(F.lit("B"), F.substring(F.col(tag), 2, 2 ** 30)),
            ).otherwise(F.col(tag)),
        ).drop(f"_carry_{tag}")
    return nonpunct.drop("_punct", "_slot", *(
        ["_g"] if not group_cols else []
    ))


def iob_type_counts(
    df: DataFrame, iob_col: str, mode: str = "entity"
) -> DataFrame:
    """Unique entity types + counts from IOB2 tags (``unique_etypes``,
    mining/eval.py:266-309): entity mode counts ``B-`` tags, token mode
    counts ``B-`` and ``I-`` tags; ``O`` never contributes."""
    if mode not in ("entity", "token"):
        raise ValueError(f"Mode '{mode}' is not available.")
    tagged = df.filter(F.col(iob_col) != "O").select(
        F.substring(F.col(iob_col), 1, 1).alias("prefix"),
        F.substring(F.col(iob_col), 3, 2 ** 30).alias("entity_type"),
    )
    counted = (
        tagged.filter(
            F.col("prefix") == "B"
            if mode == "entity"
            else F.col("prefix").isin("B", "I")
        )
        .groupBy("entity_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # types that appear only with the other prefix still show up (count 0),
    # exactly like the reference's unique() over all non-O tags
    all_types = tagged.select("entity_type").distinct()
    return all_types.join(counted, on="entity_type", how="left").select(
        "entity_type", F.coalesce("n", F.lit(0)).alias("n")
    )


def spans_from_iob(
    df: DataFrame,
    iob_col: str,
    order_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Tag-driven span extraction — exact port of ``iob2idx``
    (mining/eval.py:312-341), for every entity type at once: a span starts
    at each ``B-X`` token and ends (inclusive) at the last consecutive
    token whose tag is ``B-X``/``I-X`` not followed by ``I-X``. Unlike
    adjacency-run collapsing, ``B-X B-X`` is two spans.

    Returns ``group_cols + [entity_type, start, end]`` where start/end are
    ``order_col`` values (inclusive, like the reference's index pairs).

    Formulation: each maximal ``B-X [I-X]*`` run is one *segment* (an
    ``I-X`` token continues a segment only when the immediately preceding
    token in the full stream is ``B-X``/``I-X``); a span is the (min, max)
    index of a segment whose first token is a ``B-``. An orphan ``I-X``
    (malformed IOB2, no initiating ``B-``) forms a segment with no ``B-``
    head and is dropped — it can never shift the pairing of later
    well-formed spans (the earlier rank-pairing formulation silently
    mispaired everything after an orphan).
    """
    group_cols = group_cols or []
    if group_cols:
        gcols = group_cols
        src = df
    else:
        src = df.withColumn("_g", F.lit(0))
        gcols = ["_g"]
    w = Window.partitionBy(*gcols).orderBy(order_col)
    parsed = src.select(
        *gcols,
        F.col(order_col).alias("_i"),
        F.substring(F.col(iob_col), 1, 1).alias("_pfx"),
        F.substring(F.col(iob_col), 3, 2 ** 30).alias("entity_type"),
        F.coalesce(F.lag(iob_col).over(w), F.lit("O")).alias("_prev"),
    )
    tagged = parsed.filter(F.col("_pfx").isin("B", "I"))
    # an I-X row opens a NEW segment (orphan) unless the previous token in
    # the stream was B-X/I-X of the same type; B- always opens a segment
    # (B-X B-X is two spans, exactly like the reference's iob2idx)
    run_start = (F.col("_pfx") == "B") | (
        (F.col("_prev") != F.concat(F.lit("B-"), F.col("entity_type")))
        & (F.col("_prev") != F.concat(F.lit("I-"), F.col("entity_type")))
    )
    seg_w = (
        Window.partitionBy(*gcols, "entity_type")
        .orderBy("_i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    segged = tagged.withColumn(
        "_seg", F.sum(run_start.cast("long")).over(seg_w)
    )
    out = (
        segged.groupBy(*gcols, "entity_type", "_seg")
        .agg(
            F.min(F.struct("_i", "_pfx")).alias("_head"),
            F.max("_i").alias("end"),
        )
        .filter(F.col("_head._pfx") == "B")
        .select(
            *(group_cols or []),
            "entity_type",
            F.col("_head._i").alias("start"),
            "end",
        )
    )
    return out


def spans_to_text(
    spans: DataFrame,
    tokens: DataFrame,
    order_col: str,
    text_col: str = "text",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Attach the entity surface text to extracted spans — ``idx2text``
    (mining/eval.py:344-365): the space-join of the tokens in
    ``[start, end]`` (inclusive). A range join of spans onto tokens plus
    an in-group ordered concat; span boundaries bound the join so work is
    O(entity tokens), not O(spans × tokens)."""
    group_cols = group_cols or []
    t = tokens.select(
        *group_cols,
        F.col(order_col).alias("_i"),
        F.col(text_col).alias("_tok"),
    )
    joined = spans.join(
        t,
        on=[
            *[spans[c] == t[c] for c in group_cols],
            t["_i"] >= spans["start"],
            t["_i"] <= spans["end"],
        ]
        if group_cols
        else [(t["_i"] >= spans["start"]) & (t["_i"] <= spans["end"])],
        how="inner",
    ).select(
        *[spans[c] for c in group_cols],
        "entity_type",
        "start",
        "end",
        "_i",
        "_tok",
    )
    key = group_cols + ["entity_type", "start", "end"]
    return joined.groupBy(*key).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_i", "_tok"))),
                lambda x: x["_tok"],
            ),
            " ",
        ).alias("entity_text")
    )


def model2df(
    matcher,
    ground_truth_tokenization: list[str],
    not_entity_symbol: str = "O",
    excluded_entity_type: str | None = "NaE",
):
    """Model predictions aligned to a ground-truth tokenization — port of
    ``spacy2df`` (mining/eval.py:158-228) with the engine's matcher as the
    model slot: the reference builds a spaCy ``Doc`` from the ground-truth
    words and runs the model pipeline over it so predictions share the
    annotation tokenization; here the matcher runs over the space-joined
    words and char spans map back to token indices. A span that does not
    land on token boundaries yields no entity (spaCy's ``char_span`` →
    ``None`` behavior); ``excluded_entity_type`` spans are dropped like the
    reference's ``doc.ents`` filter (eval.py:202-208).

    Returns a pandas DataFrame with columns ``class`` (IOB2 tag) and
    ``text`` — the shape ``annotations2df`` produces, so truth and
    prediction frames align row-for-row.
    """
    import pandas as pd

    words = list(ground_truth_tokenization)
    text = " ".join(words)
    bounds = []
    cursor = 0
    for w in words:
        bounds.append((cursor, cursor + len(w)))
        cursor += len(w) + 1
    start_to_ix = {s: i for i, (s, _) in enumerate(bounds)}
    end_to_ix = {e: i for i, (_, e) in enumerate(bounds)}
    tags = [not_entity_symbol] * len(words)
    for start, end, _mention, etype in matcher.find(text):
        if excluded_entity_type is not None and etype == excluded_entity_type:
            continue
        i = start_to_ix.get(start)
        j = end_to_ix.get(end)
        if i is None or j is None:
            continue
        tags[i] = f"B-{etype}"
        for k in range(i + 1, j + 1):
            tags[k] = f"I-{etype}"
    return pd.DataFrame({"class": tags, "text": words})


def token_iob_stage_ngrams(
    tokens: DataFrame,
    patterns: DataFrame,
    not_entity_symbol: str = "O",
    excluded_entity_type: str | None = "NaE",
) -> DataFrame:
    """Distributed ``spacy2df`` for token patterns of ANY length — exact
    spaCy ``filter_spans`` semantics (mining/eval.py:158-228 +
    spacy.util.filter_spans: sort candidate spans by (-length, start),
    greedily keep non-overlapping) as an iterate-by-length pass, zero
    UDF throughout.

    ``tokens`` is ``(doc_id, tpos, tok)`` with ``tpos`` dense per doc;
    ``patterns`` is a broadcast-sized dim ``(pattern, entity_type)``
    where ``pattern`` is the space-joined token sequence (an EntityRuler
    phrase dim — reference mining/entity.py patterns). Per length L,
    descending:

    1. **match** — the L-token window join: ``lead(tok, i)`` chains
       build the candidate starts, one broadcast join against the
       length-L slice of the dim.
    2. **eliminate** — candidates overlapping any token claimed by a
       longer accepted span are dropped (they would lose to it in
       filter_spans' sorted scan; rejected spans never block others, so
       pre-elimination is exact).
    3. **greedy within length** — remaining same-length candidates
       overlap only within chains of starts closer than L; chains group
       by a running-sum window over ``start - lag(start) >= L`` breaks,
       and each chain's accepted starts come from one JVM
       ``aggregate`` scan over the sorted start list (accept when
       ``start >= last_accepted + L``) — the general form of the
       bigram rank-parity trick, which it reproduces exactly at L=2.
    4. **claim** — accepted spans emit ``B-``/``I-`` tags onto their
       token positions and join the claimed set for shorter lengths.

    The per-length loop is bounded by the number of distinct pattern
    lengths in the dim (a broadcast-sized collect, like the TF-IDF
    vocabulary). ``excluded_entity_type`` spans compete for tokens but
    render ``O`` (the reference's post-hoc ``doc.ents`` filter). Ties —
    two dim rows with the same token sequence — resolve to the
    lexicographically smallest entity type, deterministically.

    Returns ``(doc_id, tpos, text, class)``.
    """
    from pyspark.sql import Window

    toks = F.split(F.col("pattern"), " ")
    pats = patterns.select(
        toks.alias("_toks"),
        F.size(toks).alias("_len"),
        F.col("entity_type").alias("_etype"),
    )
    lengths = sorted(
        {r["_len"] for r in pats.select("_len").distinct().collect()},
        reverse=True,
    )
    # One lead-window frame built up to the LONGEST pattern feeds every
    # length's candidate join and the final tag join. All branches then
    # share an identical exchange subtree, so AQE reuses the single
    # token-table shuffle (ReusedExchange) instead of re-shuffling per
    # distinct length; deliberately NOT persisted — caching the full
    # token table is a memory hazard at scale, while the reused shuffle
    # stays in shuffle files and only the sort+lead re-run per branch.
    l_max = max(lengths) if lengths else 1
    lead_frame = tokens.select(
        "doc_id", F.col("tpos").alias("_start"),
        F.col("tok").alias("_t0"),
        *[
            F.lead("tok", i)
            .over(Window.partitionBy("doc_id").orderBy("tpos"))
            .alias(f"_t{i}")
            for i in range(1, l_max)
        ],
    )
    claimed = None  # (doc_id, tpos, _tag) accumulated over lengths
    for L in lengths:
        dim = pats.filter(F.col("_len") == L).select(
            *[F.col("_toks")[i].alias(f"_t{i}") for i in range(L)],
            "_etype",
        )
        cand = lead_frame.select(
            "doc_id", "_start", *[f"_t{i}" for i in range(L)]
        ).join(
            F.broadcast(dim), on=[f"_t{i}" for i in range(L)]
        ).groupBy("doc_id", "_start").agg(
            F.min("_etype").alias("_etype")  # deterministic tie-break
        )
        if claimed is not None:
            blocked = (
                cand.select(
                    "doc_id", "_start",
                    F.explode(
                        F.sequence(
                            F.col("_start"), F.col("_start") + (L - 1)
                        )
                    ).alias("tpos"),
                )
                .join(claimed.select("doc_id", "tpos"), on=["doc_id", "tpos"],
                      how="left_semi")
                .select("doc_id", "_start")
                .distinct()
            )
            cand = cand.join(blocked, on=["doc_id", "_start"],
                             how="left_anti")
        # overlap chains: same-length candidates closer than L link up
        # (first row's null lag fails the >= test -> 0, starting chain 0)
        w_doc = Window.partitionBy("doc_id").orderBy("_start")
        gap_break = F.when(
            F.col("_start") - F.lag("_start").over(w_doc) >= L, 1
        ).otherwise(0)
        chains = cand.withColumn("_chain", F.sum(gap_break).over(w_doc))
        neg_inf = F.lit(-(1 << 40)).cast("long")
        grouped = chains.groupBy("doc_id", "_chain").agg(
            F.sort_array(
                F.collect_list(F.struct("_start", "_etype"))
            ).alias("_cands")
        )
        # one-pass greedy scan, JVM-side: accumulator = (last accepted
        # start, accepted list); accept when start >= last + L
        accepted = grouped.select(
            "doc_id",
            F.explode(
                F.aggregate(
                    F.col("_cands"),
                    F.struct(
                        neg_inf.alias("last"),
                        F.array().cast(
                            "array<struct<_start:long,_etype:string>>"
                        ).alias("acc"),
                    ),
                    lambda acc, c: F.when(
                        c["_start"].cast("long") >= acc["last"] + L,
                        F.struct(
                            c["_start"].cast("long").alias("last"),
                            F.array_append(
                                acc["acc"],
                                F.struct(
                                    c["_start"].cast("long")
                                    .alias("_start"),
                                    c["_etype"].alias("_etype"),
                                ),
                            ).alias("acc"),
                        ),
                    ).otherwise(acc),
                    lambda acc: acc["acc"],
                )
            ).alias("_a"),
        ).select(
            "doc_id",
            F.col("_a._start").alias("_start"),
            F.col("_a._etype").alias("_etype"),
        )
        iob = F.concat(
            F.when(F.col("tpos") == F.col("_start"), F.lit("B-"))
            .otherwise(F.lit("I-")),
            F.col("_etype"),
        )
        if excluded_entity_type is not None:
            iob = F.when(
                F.col("_etype") == excluded_entity_type,
                F.lit(not_entity_symbol),
            ).otherwise(iob)
        spans = accepted.select(
            "doc_id", "_start", "_etype",
            F.explode(
                F.sequence(F.col("_start"), F.col("_start") + (L - 1))
            ).alias("tpos"),
        ).select("doc_id", "tpos", iob.alias("_tag"))
        claimed = spans if claimed is None else claimed.unionByName(spans)
    if claimed is None:
        return tokens.select(
            "doc_id", "tpos", F.col("tok").alias("text")
        ).withColumn("class", F.lit(not_entity_symbol))
    out = lead_frame.select(
        "doc_id", F.col("_start").alias("tpos"), F.col("_t0").alias("text")
    )
    return out.join(claimed, on=["doc_id", "tpos"], how="left").select(
        "doc_id", "tpos", "text",
        F.coalesce("_tag", F.lit(not_entity_symbol)).alias("class"),
    )


def token_iob_stage(
    tokens: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame | None = None,
    not_entity_symbol: str = "O",
    excluded_entity_type: str | None = "NaE",
) -> DataFrame:
    """Distributed ``spacy2df`` (mining/eval.py:158-228): IOB2 tags for
    every token of a PINNED tokenization, with spaCy ``filter_spans``
    overlap semantics — longest span first, then earliest start.

    ``tokens`` is ``(doc_id, tpos, tok)``; ``unigrams`` is a
    ``(pattern, entity_type)`` dim; ``bigrams`` optionally adds
    two-token patterns ``(first, second, entity_type)``. Span
    competition mirrors the reference exactly:

    * bigrams beat unigrams on any shared token (filter_spans sorts by
      ``(-length, start)``),
    * among overlapping bigram candidates, greedy-from-the-left wins —
      a candidate chain of consecutive starts keeps its even positions.
      That greedy scan is NON-LOCAL but window-expressible: consecutive
      candidate starts group by ``tpos - row_number()`` and survive at
      odd in-group rank. Zero UDF, two window passes + broadcast dims.
    * ``excluded_entity_type`` spans compete (they claim tokens during
      matching, exactly like a spaCy ruler pattern whose entities are
      dropped from ``doc.ents`` only afterwards) but emit ``O``.

    Returns ``(doc_id, tpos, text, class)``.
    """
    from pyspark.sql import Window

    out_cols = [
        F.col("doc_id"), F.col("tpos"), F.col("tok").alias("text")
    ]
    covered_b = None
    covered_i = None
    if bigrams is not None:
        nxt = F.lead("tok").over(
            Window.partitionBy("doc_id").orderBy("tpos")
        )
        cand = (
            tokens.withColumn("_next", nxt)
            .join(
                F.broadcast(
                    bigrams.select(
                        F.col("first").alias("tok"),
                        F.col("second").alias("_next"),
                        F.col("entity_type").alias("_betype"),
                    )
                ),
                on=["tok", "_next"],
            )
            .select("doc_id", "tpos", "_betype")
        )
        w_doc = Window.partitionBy("doc_id").orderBy("tpos")
        grp = F.col("tpos") - F.row_number().over(w_doc)
        cand = cand.withColumn("_grp", grp)
        w_grp = Window.partitionBy("doc_id", "_grp").orderBy("tpos")
        surv = cand.withColumn(
            "_rn", F.row_number().over(w_grp)
        ).filter((F.col("_rn") - 1) % 2 == 0)
        covered_b = surv.select(
            "doc_id", "tpos", F.col("_betype").alias("_btag_type")
        )
        covered_i = surv.select(
            "doc_id",
            (F.col("tpos") + 1).alias("tpos"),
            F.col("_betype").alias("_itag_type"),
        )
    uni = unigrams.select(
        F.col("pattern").alias("tok"),
        F.col("entity_type").alias("_uetype"),
    )
    out = tokens.join(F.broadcast(uni), on="tok", how="left")
    if covered_b is not None:
        out = out.join(covered_b, on=["doc_id", "tpos"], how="left").join(
            covered_i, on=["doc_id", "tpos"], how="left"
        )
    else:
        out = out.withColumn("_btag_type", F.lit(None).cast("string"))
        out = out.withColumn("_itag_type", F.lit(None).cast("string"))

    def _tag(prefix: str, etype: Column) -> Column:
        t = F.concat(F.lit(prefix), etype)
        if excluded_entity_type is not None:
            t = F.when(etype == excluded_entity_type,
                       F.lit(not_entity_symbol)).otherwise(t)
        return t

    cls = (
        F.when(F.col("_btag_type").isNotNull(),
               _tag("B-", F.col("_btag_type")))
        .when(F.col("_itag_type").isNotNull(),
              _tag("I-", F.col("_itag_type")))
        .when(F.col("_uetype").isNotNull(), _tag("B-", F.col("_uetype")))
        .otherwise(F.lit(not_entity_symbol))
    )
    return out.select(*out_cols, cls.alias("class"))


def ner_errors(
    truth_spans: DataFrame,
    pred_spans: DataFrame,
    keys: list[str] | None = None,
    by: str = "entity_type",
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """False-negative / false-positive span listing — the reference's
    ``ner_errors`` entity mode (mining/eval.py:536-581): per entity type,
    truth and pred spans outer-merge on (start, end); ``left_only`` rows are
    the false negatives, ``right_only`` the false positives. One full-outer
    join with presence indicators — each span subtree (often a window pass)
    is computed exactly once, where a two-anti-join formulation would scan
    both subtrees twice.

    Returns ``keys + [by, start_col, end_col, kind]`` with ``kind`` ∈
    {'false_neg', 'false_pos'}; attach surface text with
    :func:`spans_to_text` (the reference's ``idx2text`` step).
    """
    keys = keys or ["url", "ppos", "spos"]
    cols = keys + [by, start_col, end_col]
    t = truth_spans.select(*cols).dropDuplicates(cols).withColumn(
        "_t", F.lit(1)
    )
    p = pred_spans.select(*cols).dropDuplicates(cols).withColumn(
        "_p", F.lit(1)
    )
    return (
        t.join(p, on=cols, how="full")
        .filter(F.col("_t").isNull() | F.col("_p").isNull())
        .select(
            *cols,
            F.when(F.col("_p").isNull(), F.lit("false_neg"))
            .otherwise(F.lit("false_pos"))
            .alias("kind"),
        )
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
