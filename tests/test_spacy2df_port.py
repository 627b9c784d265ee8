"""spacy2df port fidelity (VERDICT r3 item 4).

The reference's ``spacy2df`` (mining/eval.py:158-228) builds a spaCy Doc
from a PINNED ground-truth tokenization and tags each token IOB2 from the
model's entities. No spaCy/torch exists in this container, so parity is
established three ways:

1. the reference's own recorded expectations: ``TestSpacy2df.test_overall``
   (tests/unit/mining/test_eval.py:126-147) hardcodes the expected class
   column for the Elvis sentence — ``model2df`` must reproduce it exactly
   with an equivalent deterministic pattern model;
2. the excluded-entity-type matrix from ``TestSpacy2df.test_exclusion``
   (single-ruler variants — the ``overwrite_ents`` axis is a spaCy
   pipeline-config detail with no analogue in a single fused matcher);
3. distributed/driver cross-parity: ``token_iob_stage`` (the corpus-scale
   formulation, two window passes) must agree row-for-row with
   ``model2df`` (the reference-shaped driver bridge) on randomized token
   streams with unigram+bigram patterns, overlap chains included.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from search_spark.operators.evaluation import model2df, token_iob_stage
from search_spark.operators.ner import GazetteerMatcher


# -- 1. reference-recorded expectations -------------------------------------

ELVIS_TOKENS = [
    "Elvis", "Presley", "had", "a", "concert", "in", "Brazil",
    "yesterday", ".",
]
# tests/unit/mining/test_eval.py:139 — the reference's expected classes
ELVIS_CLASSES = [
    "B-PERSON", "I-PERSON", "O", "O", "O", "O", "B-GPE", "B-DATE", "O",
]


def _elvis_matcher():
    return GazetteerMatcher([
        ("Elvis Presley", "PERSON"),
        ("Brazil", "GPE"),
        ("yesterday", "DATE"),
    ])


def test_model2df_matches_reference_recorded_classes():
    df = model2df(_elvis_matcher(), ELVIS_TOKENS)
    assert len(df) == len(ELVIS_TOKENS)
    assert df["text"].to_list() == ELVIS_TOKENS
    assert df["class"].to_list() == ELVIS_CLASSES
    assert list(df.columns) == ["class", "text"]


@pytest.mark.parametrize("excluded", [None, "GPE", "DATE"])
def test_model2df_exclusion_matrix(excluded):
    """eval.py:202-208: excluded entities drop from doc.ents → their
    tokens tag O; everything else is untouched."""
    df = model2df(
        _elvis_matcher(), ELVIS_TOKENS, excluded_entity_type=excluded
    )
    expected = [
        "O" if (c != "O" and excluded is not None and c[2:] == excluded)
        else c
        for c in ELVIS_CLASSES
    ]
    assert df["class"].to_list() == expected


def test_model2df_multiword_and_chain():
    """Overlap chain 'sort merge join': leftmost-longest keeps
    'sort merge', then the freed 'join' matches as a unigram — spaCy
    filter_spans semantics."""
    m = GazetteerMatcher([
        ("sort merge", "ALGO"),
        ("merge join", "ALGO"),
        ("join", "OPERATOR"),
    ])
    df = model2df(m, ["sort", "merge", "join"])
    assert df["class"].to_list() == ["B-ALGO", "I-ALGO", "B-OPERATOR"]


# -- 3. distributed vs driver bridge on random streams ----------------------

UNIGRAMS = [
    ("join", "OPERATOR"), ("sort", "OPERATOR"), ("scan", "OPERATOR"),
    ("table", "OBJECT"), ("row", "OBJECT"), ("dup", "NaE"),
]
BIGRAMS = [
    ("sort", "merge", "ALGO"),
    ("merge", "join", "ALGO"),
    ("join", "scan", "ALGO"),   # makes 3-candidate chains possible
    ("table", "scan", "ALGO"),
    ("hash", "scan", "NaE"),
]
VOCAB = ["sort", "merge", "join", "scan", "table", "row", "hash",
         "dup", "the", "fast", "x1"]


def _matcher_patterns():
    return UNIGRAMS + [
        (f"{a} {b}", e) for a, b, e in BIGRAMS
    ]


@pytest.mark.parametrize("seed", [11, 22, 33])
def test_token_iob_stage_matches_model2df(spark, seed):
    rng = random.Random(seed)
    docs = {
        d: [rng.choice(VOCAB) for _ in range(rng.randint(4, 30))]
        for d in range(25)
    }
    rows = [
        (d, i, tok) for d, toks in docs.items()
        for i, tok in enumerate(toks)
    ]
    tokens = spark.createDataFrame(
        rows, "doc_id int, tpos long, tok string"
    )
    uni = spark.createDataFrame(UNIGRAMS, ["pattern", "entity_type"])
    bi = spark.createDataFrame(BIGRAMS, ["first", "second", "entity_type"])
    got = {
        (r.doc_id, r.tpos): (r.text, r["class"])
        for r in token_iob_stage(tokens, uni, bi).collect()
    }
    matcher = GazetteerMatcher(_matcher_patterns())
    for d, toks in docs.items():
        exp = model2df(matcher, toks)
        for i, (cls, txt) in enumerate(
            zip(exp["class"], exp["text"])
        ):
            assert got[(d, i)] == (txt, cls), (
                d, i, toks, got[(d, i)], (txt, cls)
            )


def test_token_iob_stage_excluded_claims_tokens(spark):
    """An excluded-type bigram still CLAIMS its tokens (spaCy matching
    happens before the doc.ents filter): 'hash scan' renders O on both
    tokens and suppresses the 'scan' unigram."""
    tokens = spark.createDataFrame(
        [(0, 0, "hash"), (0, 1, "scan"), (0, 2, "join")],
        "doc_id int, tpos long, tok string",
    )
    uni = spark.createDataFrame(UNIGRAMS, ["pattern", "entity_type"])
    bi = spark.createDataFrame(BIGRAMS, ["first", "second", "entity_type"])
    out = {
        r.tpos: r["class"]
        for r in token_iob_stage(tokens, uni, bi).collect()
    }
    assert out == {0: "O", 1: "O", 2: "B-OPERATOR"}


def test_token_iob_stage_chain_parity(spark):
    """'sort merge join' chain: greedy-left keeps 'sort merge'; 'join'
    falls back to its unigram."""
    tokens = spark.createDataFrame(
        [(0, 0, "sort"), (0, 1, "merge"), (0, 2, "join")],
        "doc_id int, tpos long, tok string",
    )
    uni = spark.createDataFrame(UNIGRAMS, ["pattern", "entity_type"])
    bi = spark.createDataFrame(BIGRAMS, ["first", "second", "entity_type"])
    out = {
        r.tpos: r["class"]
        for r in token_iob_stage(tokens, uni, bi).collect()
    }
    assert out == {0: "B-ALGO", 1: "I-ALGO", 2: "B-OPERATOR"}


# -- 4. general n-token stage: exact filter_spans on random streams ---------

NGRAM_PATTERNS = [
    ("sort merge join", "PIPE"),
    ("merge join scan table", "QUAD"),
    ("table scan merge", "PLAN"),
    ("hash scan join", "NaE"),
    ("sort merge", "ALGO"),
    ("merge join", "ALGO"),
    ("table scan", "ALGO"),
    ("hash scan", "NaE"),
    ("join", "OPERATOR"), ("sort", "OPERATOR"), ("scan", "OPERATOR"),
    ("table", "OBJECT"), ("row", "OBJECT"), ("dup", "NaE"),
]


class FilterSpansMatcher:
    """Token-sequence matcher with EXACT spacy.util.filter_spans overlap
    resolution (sort candidate spans by (-length, start), greedily keep
    non-overlapping) — the reference semantics `token_iob_stage_ngrams`
    implements; GazetteerMatcher's leftmost-longest regex coincides with
    it only up to 2-token patterns."""

    def __init__(self, patterns):
        self._pats = [(p.split(" "), e) for p, e in patterns]

    def find(self, text):
        words = text.split(" ")
        bounds, cursor = [], 0
        for w in words:
            bounds.append((cursor, cursor + len(w)))
            cursor += len(w) + 1
        cands = {}
        for toks, etype in self._pats:
            L = len(toks)
            for i in range(len(words) - L + 1):
                if words[i:i + L] == toks:
                    key = (i, i + L)
                    if key not in cands or etype < cands[key]:
                        cands[key] = etype
        spans = sorted(
            cands.items(), key=lambda kv: (-(kv[0][1] - kv[0][0]), kv[0][0])
        )
        taken, out = set(), []
        for (i, j), etype in spans:
            if any(k in taken for k in range(i, j)):
                continue
            taken.update(range(i, j))
            out.append(
                (bounds[i][0], bounds[j - 1][1],
                 " ".join(words[i:j]), etype)
            )
        return out


@pytest.mark.parametrize("seed", [17, 28, 39])
def test_token_iob_ngrams_matches_model2df(spark, seed):
    from search_spark.operators.evaluation import token_iob_stage_ngrams

    rng = random.Random(seed)
    docs = {
        d: [rng.choice(VOCAB) for _ in range(rng.randint(4, 40))]
        for d in range(25)
    }
    rows = [
        (d, i, tok) for d, toks in docs.items()
        for i, tok in enumerate(toks)
    ]
    tokens = spark.createDataFrame(
        rows, "doc_id int, tpos long, tok string"
    )
    pats = spark.createDataFrame(
        NGRAM_PATTERNS, ["pattern", "entity_type"]
    )
    got = {
        (r.doc_id, r.tpos): (r.text, r["class"])
        for r in token_iob_stage_ngrams(tokens, pats).collect()
    }
    matcher = FilterSpansMatcher(NGRAM_PATTERNS)
    for d, toks in docs.items():
        exp = model2df(matcher, toks)
        for i, (cls, txt) in enumerate(zip(exp["class"], exp["text"])):
            assert got[(d, i)] == (txt, cls), (
                d, i, toks, got[(d, i)], (txt, cls)
            )


def test_token_iob_ngrams_trigram_beats_bigrams(spark):
    """'sort merge join' trigram wins over both its bigram sub-spans;
    a following 'table scan' bigram still matches."""
    from search_spark.operators.evaluation import token_iob_stage_ngrams

    toks = ["sort", "merge", "join", "table", "scan"]
    tokens = spark.createDataFrame(
        [(0, i, t) for i, t in enumerate(toks)],
        "doc_id int, tpos long, tok string",
    )
    pats = spark.createDataFrame(
        NGRAM_PATTERNS, ["pattern", "entity_type"]
    )
    out = {
        r.tpos: r["class"]
        for r in token_iob_stage_ngrams(tokens, pats).collect()
    }
    assert out == {
        0: "B-PIPE", 1: "I-PIPE", 2: "I-PIPE",
        3: "B-ALGO", 4: "I-ALGO",
    }


def test_token_iob_ngrams_no_patterns(spark):
    from search_spark.operators.evaluation import token_iob_stage_ngrams

    tokens = spark.createDataFrame(
        [(0, 0, "a"), (0, 1, "b")], "doc_id int, tpos long, tok string"
    )
    pats = spark.createDataFrame([], "pattern string, entity_type string")
    out = {
        r.tpos: r["class"]
        for r in token_iob_stage_ngrams(tokens, pats).collect()
    }
    assert out == {0: "O", 1: "O"}
