"""Pure-Python-derived oracles for the non-SQL-expressible registry queries.

The driver's correctness gate compares each Spark query against a DuckDB
oracle. Three registry queries compute things DuckDB cannot re-derive from
the parquet tables (the flagship web-page KG pipeline, the multi-format
parser registry, the multimodal feature stage). Their ground truth *is*
computable in plain Python, though — the synthetic corpus is a pure
function of ``(seed, doc_id)`` with recorded expectations
(:class:`search_spark.datagen.ExpectedDoc`), the multiformat fixtures are
hand-written, and the multimodal assets are content-addressed. This module
derives those expectations **without Spark** and renders them as DuckDB
``VALUES`` tables, giving the driver a real hash-comparable oracle for all
three (VERDICT r01 §next-round item 1).

Independence note: the expected KG triples are derived from the datagen
ground-truth mentions with a ~40-line union-find — not by re-running any
pipeline stage — mirroring how the reference's own tests derive expected
rows from fixture annotations (tests/unit/mining/test_pipeline.py:31-165).
"""

from __future__ import annotations

import hashlib
from decimal import ROUND_HALF_UP, Decimal

import numpy as np

from search_spark import datagen

# --------------------------------------------------------------------------
# VALUES rendering
# --------------------------------------------------------------------------


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, float):
        # fixed 6-dp decimal string; the SELECT casts to DOUBLE so both
        # engines hold the identical (correctly-rounded) binary double
        return f"{v:.6f}"
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_lit(x) for x in v) + "]"
    return str(v)


def values_sql(
    rows: list[tuple], columns: list[str], double_cols: set[str] | None = None
) -> str:
    """Render rows as ``SELECT … FROM (VALUES …) t(cols)`` for DuckDB.

    ``double_cols`` are explicitly cast to DOUBLE (DuckDB would otherwise
    type bare decimal literals as DECIMAL, whose string form differs from a
    float's shortest repr under value canonicalization).
    """
    double_cols = double_cols or set()
    body = ", ".join(
        "(" + ", ".join(_lit(v) for v in row) + ")" for row in rows
    )
    select = ", ".join(
        f"CAST({c} AS DOUBLE) AS {c}" if c in double_cols else c
        for c in columns
    )
    return (
        f"SELECT {select} FROM (VALUES {body}) AS t({', '.join(columns)})"
    )


def round_half_up(x: float, digits: int = 6) -> float:
    """Java-compatible HALF_UP rounding of a double at ``digits`` decimals.

    Matches Spark's ``round(double, d)`` exactly: Spark converts the double
    via its shortest decimal repr (``BigDecimal.valueOf``) then rounds
    HALF_UP — ``repr(x)`` is the same shortest repr in Python. ``+ 0.0``
    canonicalizes IEEE −0.0 → +0.0 (the Spark side does the same).
    """
    q = Decimal(repr(x)).quantize(
        Decimal(1).scaleb(-digits), rounding=ROUND_HALF_UP
    )
    return float(q) + 0.0


# --------------------------------------------------------------------------
# multimodal_features — expected (asset_id, media_type, payload_sha,
# n_bytes, dim_i, v) rows
# --------------------------------------------------------------------------


def multimodal_expected_rows(
    n: int = 64, seed: int = 7, dim: int = 16
) -> list[tuple]:
    from search_spark.operators.multimodal import _extract_features

    rows: list[tuple] = []
    for i in range(n):
        media = ["image", "audio", "video"][i % 3]
        payload = hashlib.sha256(f"asset:{seed}:{i}".encode()).digest() * (
            4 + i % 7
        )
        sha = hashlib.sha256(payload).hexdigest()
        vec = _extract_features(payload, dim)
        for d, v in enumerate(vec):
            # the Spark column is array<float>: values round-trip through
            # float32 before the JVM casts back to double and rounds
            rows.append(
                (i, media, sha, len(payload), d,
                 round_half_up(float(np.float32(v)), 6))
            )
    return rows


def multimodal_oracle_sql() -> str:
    return values_sql(
        multimodal_expected_rows(),
        ["asset_id", "media_type", "payload_sha", "n_bytes", "dim_i", "v"],
        double_cols={"v"},
    )


# --------------------------------------------------------------------------
# kg_triples_webpages — expected distinct (subj, pred, obj, prov) triples
# --------------------------------------------------------------------------


def canonical_map() -> dict[str, str]:
    """form(lower) → canonical id via union-find over alias/concept edges —
    independent of the pipeline's connected-components implementation."""
    form_to_concept = {}
    for cid, aliases in datagen.CONCEPT_ALIASES.items():
        for a in aliases:
            form_to_concept[a.lower()] = cid
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted([ra, rb])
            parent[hi] = lo

    for form, cid in form_to_concept.items():
        union(form, cid)
    return {form: find(form) for form in form_to_concept}


def kg_triples_expected(n_docs: int, seed: int) -> set[tuple]:
    """Expected triples for ``generate_web_pages(n_docs, seed)`` through the
    full pipeline, derived purely from datagen ground truth."""
    from search_spark.operators.relations import DIFF, SAME

    canon = canonical_map()
    rel_pairs = set(datagen.RELATION_PAIRS)
    triples: set[tuple] = set()
    for doc_id in range(n_docs):
        row, exp = datagen.generate_doc(seed, doc_id)
        if row["lang"] != "en":
            continue
        uid = hashlib.md5(row["url"].encode()).hexdigest()
        sections = {p: s for p, s, _ in exp.paragraphs}
        by_sentence: dict[tuple, list] = {}
        for ppos, spos, start, end, term, etype in exp.mentions:
            if etype == "NaE":
                continue
            by_sentence.setdefault((ppos, spos), []).append(
                (start, end, term, etype)
            )
        for (ppos, spos), ments in by_sentence.items():
            prov = f"{uid}:{sections[ppos]}:{ppos}"
            for start, end, term, etype in ments:
                subj = canon.get(term.lower(), term)
                triples.add((subj, "has_type", etype, prov))
                for start2, end2, term2, etype2 in ments:
                    if (start, end) == (start2, end2):
                        continue
                    if (etype, etype2) in rel_pairs:
                        pred = (
                            SAME
                            if term[0].lower() == term2[0].lower()
                            else DIFF
                        )
                        obj = canon.get(term2.lower(), term2)
                        triples.add((subj, pred, obj, prov))
    return triples


def kg_triples_oracle_sql(n_docs: int = 80, seed: int = 42) -> str:
    rows = sorted(kg_triples_expected(n_docs, seed))
    return values_sql(rows, ["subj", "pred", "obj", "prov"])


# --------------------------------------------------------------------------
# kg_pipeline_learned — the flagship with the TRAINED relation model live
# --------------------------------------------------------------------------


def _re_model_probs(feature_rows: list[list[float]]) -> np.ndarray:
    """Positive-class probabilities of the committed RE artifact, computed
    with the exact numpy op sequence the deployed LinearREModel uses
    (column-stacked float64 matrix @ w + b → sigmoid → round 6)."""
    import json

    from search_spark.operators.linear_models import RE_WEIGHTS_JSON

    with open(RE_WEIGHTS_JSON) as f:
        meta = json.load(f)
    w = np.asarray(meta["weights"], dtype=np.float64)
    b = float(meta["bias"])
    x = np.asarray(feature_rows, dtype=np.float64)
    if len(x) == 0:
        return np.empty(0)
    return np.round(1.0 / (1.0 + np.exp(-(x @ w + b))), 6)


def kg_triples_learned_expected(n_docs: int, seed: int) -> set[tuple]:
    """Expected triples for the pipeline with ``learned_models=True``:
    identical to :func:`kg_triples_expected` except the relation predicate
    comes from the trained LinearREModel (argmax of the per-class
    probabilities; ties — p == 0.5 — resolve to the positive class first,
    matching ``DataFrame.idxmax``). Feature values mirror RE_FEATURES from
    the pair geometry the annotated sentence preserves exactly."""
    from search_spark.operators.relations import DIFF, SAME

    canon = canonical_map()
    rel_pairs = set(datagen.RELATION_PAIRS)
    pending: list[tuple] = []      # (subj, obj, prov) per feature row
    feats: list[list[float]] = []
    triples: set[tuple] = set()
    for doc_id in range(n_docs):
        row, exp = datagen.generate_doc(seed, doc_id)
        if row["lang"] != "en":
            continue
        uid = hashlib.md5(row["url"].encode()).hexdigest()
        sections = {p: s for p, s, _ in exp.paragraphs}
        by_sentence: dict[tuple, list] = {}
        for ppos, spos, start, end, term, etype in exp.mentions:
            if etype == "NaE":
                continue
            by_sentence.setdefault((ppos, spos), []).append(
                (start, end, term, etype)
            )
        for (ppos, spos), ments in by_sentence.items():
            prov = f"{uid}:{sections[ppos]}:{ppos}"
            for start, end, term, etype in ments:
                subj = canon.get(term.lower(), term)
                triples.add((subj, "has_type", etype, prov))
                for start2, end2, term2, etype2 in ments:
                    if (start, end) == (start2, end2):
                        continue
                    if (etype, etype2) not in rel_pairs:
                        continue
                    gap = max(start, start2) - min(end, end2)
                    feats.append([
                        float(term[0].lower() == term2[0].lower()),
                        gap / 64.0,
                        len(term) / 32.0,
                        len(term2) / 32.0,
                        float(start < start2),
                    ])
                    pending.append(
                        (subj, canon.get(term2.lower(), term2), prov)
                    )
    probs = _re_model_probs(feats)
    for (subj, obj, prov), p in zip(pending, probs):
        pred = SAME if p >= 0.5 else DIFF
        triples.add((subj, pred, obj, prov))
    return triples


def kg_triples_learned_oracle_sql(n_docs: int = 80, seed: int = 42) -> str:
    rows = sorted(kg_triples_learned_expected(n_docs, seed))
    return values_sql(rows, ["subj", "pred", "obj", "prov"])


# --------------------------------------------------------------------------
# multiformat_extract — expected paragraphs, hand-derived from the fixture
# construction rules (not by running any parser)
# --------------------------------------------------------------------------


def multiformat_expected_rows(n: int = 40) -> list[tuple]:
    rows: list[tuple] = []
    for i in range(n):
        url = f"https://example.org/mf/{i}"
        uid = hashlib.md5(url.encode()).hexdigest()
        if i % 4 == 0:  # html: one <h2> section + one <p> paragraph
            rows.append(
                (url, uid, 0, f"S{i}",
                 f"Glucose sample {i} rises in Diabetes.")
            )
        elif i % 4 == 1:  # cord19_json: abstract first, then body
            rows.append((url, uid, 0, "Abstract", f"Abstract {i} on Insulin."))
            rows.append((url, uid, 1, "Body", f"Mouse study {i}."))
        elif i % 4 == 2:  # pubmed_xml: abstract-only articles
            rows.append(
                (url, uid, 0, "Abstract", f"Aspirin finding {i} in Humans.")
            )
        else:  # tei_xml: one div with head + sentence-reassembled <s> runs
            rows.append(
                (url, uid, 0, f"Results {i}",
                 f"ACE2 level {i} changed. FORMULA shows the Malaria link.")
            )
    return rows


def multiformat_oracle_sql(n: int = 40) -> str:
    return values_sql(
        multiformat_expected_rows(n), ["url", "uid", "ppos", "section", "text"]
    )


# --------------------------------------------------------------------------
# pubmed_topic_extract / topic_rules_extracted — PubMed <MeshHeadingList>
# topic extraction (topic.py:464-487) + journal-topic catalog join
# (topic.py:489-517, HTTP lookup → local dim table) feeding real topic rules
# --------------------------------------------------------------------------

TOPIC_POOL = [
    "Neuroscience",
    "Neurology",
    "Genomics",
    "Clinical Medicine",
    "Retracted Publication",
    "Epidemiology",
    "Machine Learning",
]

# local NLM-catalog stand-in: MedlineTA → journal MeSH descriptor names
JOURNAL_CATALOG: dict[str, list[str]] = {
    "J Synth 0": ["Clinical Medicine", "Biology"],
    "J Synth 1": ["Neuroscience"],
    "J Synth 2": [],
}


def _pubmed_topic_params(i: int) -> tuple[list[str], str | None]:
    """(article_topics, medline_ta) for fixture doc ``i`` — the generation
    rule both the XML builder and the expected-row derivation share."""
    if i % 5 == 0:
        topics: list[str] = []  # no MeshHeadingList at all
    else:
        topics = [TOPIC_POOL[i % 7]]
        if i % 3 != 0:
            topics.append(TOPIC_POOL[(3 * i + 1) % 7])
    ta = None if i % 6 == 5 else f"J Synth {i % 3}"
    return topics, ta


def pubmed_topic_fixture_rows(n: int = 60) -> list[tuple[str, str]]:
    """Deterministic PubMed XML fixtures: (url, xml). The first
    ``<MeshHeading>`` carries a qualifier and MajorTopicYN to exercise the
    full ``_parse_mesh_from_pubmed`` traversal (qualifiers must NOT appear
    among article topics)."""
    rows = []
    for i in range(n):
        topics, ta = _pubmed_topic_params(i)
        headings = []
        for j, t in enumerate(topics):
            qual = (
                '<QualifierName UI="Q000235" MajorTopicYN="N">genetics'
                "</QualifierName>"
                if j == 0
                else ""
            )
            major = "Y" if j == 0 else "N"
            headings.append(
                f'<MeshHeading><DescriptorName UI="D{j:06d}" '
                f'MajorTopicYN="{major}">{t}</DescriptorName>{qual}'
                f"</MeshHeading>"
            )
        mesh = (
            f"<MeshHeadingList>{''.join(headings)}</MeshHeadingList>"
            if topics
            else ""
        )
        journal_info = (
            f"<MedlineJournalInfo><MedlineTA>{ta}</MedlineTA>"
            f"</MedlineJournalInfo>"
            if ta is not None
            else "<MedlineJournalInfo></MedlineJournalInfo>"
        )
        xml = (
            f"<PubmedArticle><MedlineCitation><PMID>{2000 + i}</PMID>"
            f"{journal_info}{mesh}"
            f"<Article><ArticleTitle>T{i}</ArticleTitle></Article>"
            f"</MedlineCitation></PubmedArticle>"
        )
        rows.append((f"https://example.org/pm/{i}", xml))
    return rows


def pubmed_topics_oracle_sql(n: int = 60) -> str:
    """Expected (url, tpos, topic, medline_ta) — one row per extracted
    article topic, derived from the generation rule (not the parser)."""
    rows: list[tuple] = []
    for i in range(n):
        topics, ta = _pubmed_topic_params(i)
        for tpos, t in enumerate(topics):
            rows.append((f"https://example.org/pm/{i}", tpos, t, ta))
    return values_sql(rows, ["url", "tpos", "topic", "medline_ta"])


# --------------------------------------------------------------------------
# prodigy_annotations — Prodigy JSONL → token rows (annotations2df,
# mining/eval.py:92-156)
# --------------------------------------------------------------------------

_PRODIGY_POOL = [
    "insulin", "helps", "diabetes", "patients", "daily", "dose",
    "glucose", "level",
]


def _prodigy_params(i: int):
    """(words, answer, source, spans) of fixture record ``i`` — shared by
    the JSONL builder and the expected-row derivation."""
    words = [
        _PRODIGY_POOL[(2 * i + j) % len(_PRODIGY_POOL)]
        for j in range(3 + i % 3)
    ]
    answer = "reject" if i % 4 == 3 else "accept"
    source = f"ann{i % 3}.jsonl"
    if i % 3 == 0:  # multi-token span → B- then I-
        spans = [{"token_start": 0, "token_end": 1, "label": "chemical"}]
    elif i % 3 == 1:  # single-token span → lone B-
        spans = [{"token_start": 1, "token_end": 1, "label": "disease"}]
    else:  # accepted record with no entities at all
        spans = []
    return words, answer, source, spans


def prodigy_fixture_lines(n: int = 40) -> list[str]:
    """Deterministic Prodigy-format JSONL records (the shape
    ``annotations2df`` consumes: answer / meta.source / tokens with
    start,end,id / spans with token_start,token_end,label)."""
    import json

    lines = []
    for i in range(n):
        words, answer, source, spans = _prodigy_params(i)
        tokens, cursor = [], 0
        for j, w in enumerate(words):
            tokens.append(
                {"text": w, "start": cursor, "end": cursor + len(w), "id": j}
            )
            cursor += len(w) + 1
        lines.append(
            json.dumps(
                {
                    "answer": answer,
                    "meta": {"source": source},
                    "tokens": tokens,
                    "spans": spans,
                }
            )
        )
    return lines


def prodigy_expected_rows(n: int = 40) -> list[tuple]:
    """Expected token rows, re-derived from the generation rule (B- on the
    first span token, I- on the rest, O elsewhere; rejected records
    skipped) — not by running the loader."""
    rows: list[tuple] = []
    for i in range(n):
        words, answer, source, spans = _prodigy_params(i)
        if answer != "accept":
            continue
        tags = {}
        for ent in spans:
            for ix, tix in enumerate(
                range(ent["token_start"], ent["token_end"] + 1)
            ):
                tags[tix] = ("B-" if ix == 0 else "I-") + ent["label"].upper()
        cursor = 0
        for j, w in enumerate(words):
            rows.append(
                (source, tags.get(j, "O"), cursor, cursor + len(w), j, w)
            )
            cursor += len(w) + 1
    return rows


def prodigy_oracle_sql(n: int = 40) -> str:
    return values_sql(
        prodigy_expected_rows(n),
        ["source", "class", "start_char", "end_char", "id", "text"],
    )


# topic rules for the extracted-topics query (mirrored in SQL below):
#   accept: article topic ~ ^Neuro, OR journal topic ~ Medicine
#   reject: any topic ~ Retracted
def topic_rules_extracted_oracle_sql(n: int = 60) -> str:
    """VALUES of per-article topic lists (generation-rule ground truth) with
    the accept/reject logic expressed in SQL — the rule evaluation itself is
    re-derived by DuckDB, only the lists are Python-derived."""
    rows: list[tuple] = []
    for i in range(n):
        topics, ta = _pubmed_topic_params(i)
        jt = JOURNAL_CATALOG.get(ta, []) if ta is not None else []
        rows.append((f"https://example.org/pm/{i}", list(topics), list(jt)))
    vals = values_sql(rows, ["url", "at", "jt"])
    return f"""
WITH lists AS ({vals})
SELECT url,
       CAST(CASE WHEN
         NOT (len(list_filter(at, x -> regexp_matches(x, 'Retracted'))) > 0
              OR len(list_filter(jt, x -> regexp_matches(x, 'Retracted'))) > 0)
         AND (len(list_filter(at, x -> regexp_matches(x, '^Neuro'))) > 0
              OR len(list_filter(jt, x -> regexp_matches(x, 'Medicine'))) > 0)
       THEN 1 ELSE 0 END AS INTEGER) AS accepted
FROM lists
"""


# --------------------------------------------------------------------------
# mesh_tree_numbers / mesh_resolved_topics — MeSH RDF parse + ancestor
# resolution (database/mesh.py:91-239; applied in topic_extract.py:172-217)
# --------------------------------------------------------------------------

_NLM = "http://id.nlm.nih.gov/mesh"
_RDFS = "http://www.w3.org/2000/01/rdf-schema"


def mesh_tree_spec() -> list[tuple[str, str, list[str]]]:
    """Deterministic (descriptor_id, label, tree_numbers) spec: a three-root
    hierarchy with one label on two tree numbers (the reference's
    'subtopic' case) and complete ancestor chains throughout."""
    spec: list[tuple[str, str, list[str]]] = [
        ("D000100", "Science", ["A00"]),
        ("D000200", "Biology", ["A00.100"]),
        ("D000300", "Neuroscience", ["A00.100.500"]),
        ("D000400", "Cognitive Science", ["A00.100.500.100"]),
        ("D000500", "Medicine", ["B00"]),
        ("D000600", "Internal Medicine", ["B00.200"]),
        ("D000700", "Cardiology", ["B00.200.300"]),
        ("D000800", "Disease", ["C00"]),
        ("D000900", "Heart Diseases", ["C00.100"]),
        ("D001000", "Arrhythmia", ["C00.100.400"]),
        # one label under two roots (multi-tree label, mesh.py docstring)
        ("D001100", "Computation", ["A00.200", "B00.200.800"]),
        ("D001200", "Genetics", ["A00.100.600"]),
    ]
    for i in range(12):
        root = ["A00", "B00", "C00"][i % 3]
        spec.append((f"D10{i:04d}", f"Branch {i}", [f"{root}.{700 + i}"]))
        spec.append(
            (f"D20{i:04d}", f"Leaf {i}", [f"{root}.{700 + i}.500"])
        )
    return spec


def mesh_nt_fixture_lines() -> list[str]:
    """MeSH RDF N-triples for the spec — per descriptor: an @en label, an
    @fr label (must be ignored), an unrelated predicate, and one
    treeNumber triple per tree number; plus non-descriptor subject lines
    (tree-number parent triples) that the parser must skip."""
    lines: list[str] = []
    for desc_id, label, tns in mesh_tree_spec():
        subj = f"<{_NLM}/2024/{desc_id}>"
        lines.append(f'{subj} <{_RDFS}#label> "{label}"@en .')
        lines.append(f'{subj} <{_RDFS}#label> "{label} (fr)"@fr .')
        lines.append(f"{subj} <{_NLM}/vocab#active> true .")
        for tn in tns:
            lines.append(
                f"{subj} <{_NLM}/vocab#treeNumber> <{_NLM}/2024/{tn}> ."
            )
            if "." in tn:
                parent = tn.rsplit(".", 1)[0]
                lines.append(
                    f"<{_NLM}/2024/{tn}> <{_NLM}/vocab#parent> "
                    f"<{_NLM}/2024/{parent}> ."
                )
    return lines


def mesh_tree_expected() -> dict[str, str]:
    return {
        tn: label for _id, label, tns in mesh_tree_spec() for tn in tns
    }


_P_LINE_SQL = r"^(<.*>) (<.*>) (.*) \.$"


def mesh_tree_oracle_sql() -> str:
    """Re-derive the (tree_number, label) parse relationally in DuckDB —
    the same regex pipeline over the same raw lines."""
    vals = values_sql(
        [(ln,) for ln in mesh_nt_fixture_lines()], ["line"]
    )
    return f"""
WITH lines AS ({vals}),
tr AS (
  SELECT regexp_extract(trim(line), '{_P_LINE_SQL}', 1) AS subj,
         regexp_extract(trim(line), '{_P_LINE_SQL}', 2) AS pred,
         regexp_extract(trim(line), '{_P_LINE_SQL}', 3) AS obj
  FROM lines WHERE trim(line) <> ''),
d AS (
  SELECT regexp_extract(
           subj, '^<http://id\\.nlm\\.nih\\.gov/mesh/\\d{{4}}/(D\\d{{3,}})>$',
           1) AS id,
         pred, obj
  FROM tr),
labels AS (
  SELECT id, regexp_extract(obj, '^"(.*)"@en$', 1) AS label
  FROM d
  WHERE id <> '' AND pred = '<{_RDFS}#label>'
    AND regexp_matches(obj, '^"(.*)"@en$')),
trees AS (
  SELECT id,
         regexp_extract(
           obj, '^<http://id\\.nlm\\.nih\\.gov/mesh/\\d{{4}}/(.*)>$',
           1) AS tree_number
  FROM d
  WHERE id <> '' AND pred = '<{_NLM}/vocab#treeNumber>')
SELECT t.tree_number, l.label
FROM trees t JOIN labels l USING (id)
"""


MESH_TOPIC_DOCS_N = 40


def mesh_topic_doc_rows(n: int = MESH_TOPIC_DOCS_N) -> list[tuple]:
    """(url, topics) rows whose topic lists draw from the tree's labels,
    plus an out-of-tree label (must pass through unexpanded) and empty
    lists (must produce no output rows)."""
    labels = [label for _id, label, _tns in mesh_tree_spec()]
    rows: list[tuple] = []
    for i in range(n):
        url = f"https://example.org/mesh/{i}"
        if i % 7 == 0:
            topics: list[str] = []
        else:
            topics = [labels[i % len(labels)]]
            if i % 3 != 0:
                topics.append(labels[(5 * i + 2) % len(labels)])
            if i % 5 == 0:
                topics.append("Unlisted Topic")
        rows.append((url, topics))
    return rows


def mesh_resolved_oracle_sql(n: int = MESH_TOPIC_DOCS_N) -> str:
    """Python-derived ground truth: the pure-Python resolve_parents mirror
    (parity-tested against the reference module) applied per document."""
    from search_spark.extraction.mesh import resolve_parents

    tree = mesh_tree_expected()
    rows: list[tuple] = []
    for url, topics in mesh_topic_doc_rows(n):
        for topic in sorted(resolve_parents(topics, tree)):
            rows.append((url, topic))
    return values_sql(rows, ["url", "topic"])


# --------------------------------------------------------------------------
# warc_ingest — ground truth derived from the pure (seed, doc_id) generator,
# never from the WARC writer/reader under test
# --------------------------------------------------------------------------


def warc_ingest_oracle_sql(n: int, seed: int) -> str:
    rows: list[tuple] = []
    for i in range(n):
        row, _ = datagen.generate_doc(seed, i)
        rows.append(
            (
                row["url"],
                int(row["warc_ts"].timestamp()),
                len(row["html"]),
                hashlib.md5(row["html"]).hexdigest(),
            )
        )
    rows.sort()
    return values_sql(
        rows, ["url", "ts_epoch", "n_html_bytes", "html_md5"]
    )


def warc_cdx_lookup_oracle_sql(n: int, seed: int, doc_mod: int) -> str:
    """Expected byte-range fetch result for the SURT-prefix subtree
    ``org,example)/d{doc_mod}/`` (urls are example.org/d{id%20}/doc{id})."""
    rows: list[tuple] = []
    for i in range(n):
        if i % 20 != doc_mod:
            continue
        row, _ = datagen.generate_doc(seed, i)
        rows.append(
            (
                row["url"],
                int(row["warc_ts"].timestamp()),
                hashlib.md5(row["html"]).hexdigest(),
            )
        )
    rows.sort()
    return values_sql(rows, ["url", "ts_epoch", "html_md5"])


# --------------------------------------------------------------------------
# BPE tokenizer training — expected merges / subword counts, derived from
# datagen ground-truth paragraph text through the reference BPE algorithm
# --------------------------------------------------------------------------


def bpe_word_counts(n_docs: int, seed: int) -> dict[str, int]:
    """Ground-truth (word → occurrences) over the extracted English text
    of ``generate_web_pages(n_docs, seed)`` — extraction byte-parity makes
    ExpectedDoc.paragraphs the exact extractor output."""
    counts: dict[str, int] = {}
    for doc_id in range(n_docs):
        row, exp = datagen.generate_doc(seed, doc_id)
        if row["lang"] != "en":
            continue
        for _ppos, _section, text in exp.paragraphs:
            for w in text.split(" "):
                if w:
                    counts[w] = counts.get(w, 0) + 1
    return counts


def bpe_merges_oracle_sql(n_docs: int, seed: int, n_merges: int) -> str:
    from search_spark.operators.bpe import reference_bpe

    rows = reference_bpe(bpe_word_counts(n_docs, seed), n_merges)
    inner = values_sql(rows, ["merge_rank", "lhs", "rhs", "pair_count"])
    return (
        "SELECT CAST(merge_rank AS BIGINT) AS merge_rank, lhs, rhs, "
        f"CAST(pair_count AS BIGINT) AS pair_count FROM ({inner}) v"
    )


def bpe_segments_oracle_sql(
    n_docs: int, seed: int, n_merges: int, top_k: int
) -> str:
    from search_spark.operators.bpe import reference_bpe, reference_segment

    wc = bpe_word_counts(n_docs, seed)
    merges = [(l, r) for _, l, r, _ in reference_bpe(wc, n_merges)]
    sub_counts: dict[str, int] = {}
    for w, c in wc.items():
        for s in reference_segment(w, merges):
            sub_counts[s] = sub_counts.get(s, 0) + c
    rows = sorted(sub_counts.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
    inner = values_sql(
        [(s, c) for s, c in rows], ["subword", "n_occurrences"]
    )
    return (
        "SELECT subword, CAST(n_occurrences AS BIGINT) AS n_occurrences "
        f"FROM ({inner}) v"
    )


# --------------------------------------------------------------------------
# boilerplate_strip — frequency-based boilerplate removal fixture + oracle
# --------------------------------------------------------------------------

BOILER_N_DOCS = 60
BOILER_HOSTS = 5
BOILER_RATIO = 0.5
BOILER_MIN_DF = 2


def _boiler_paragraphs(i: int) -> list[str]:
    """Paragraph texts of fixture page ``i`` — pure function, no Spark.

    Per 12-doc host: a host banner in every doc (df=12 → flagged; odd docs
    carry a case/whitespace variant so the normalized key must collapse
    them), a 'related reading' para in 4 docs (df=4 < 12*0.5 → kept), a
    syndicate-wide footer in every doc (flagged per host), and unique
    content paras (df=1 → kept).
    """
    h = i % BOILER_HOSTS
    k = i // BOILER_HOSTS
    banner = f"Subscribe to the host{h} newsletter for weekly updates."
    if k % 2 == 1:
        banner = f"SUBSCRIBE to  the host{h} Newsletter for weekly updates. "
    paras = [banner]
    for j in range(2 + i % 3):
        paras.append(
            f"Article {i} paragraph {j} discusses topic "
            f"{(i * 7 + j) % 23} in depth."
        )
    if k % 6 < 2:
        paras.append(f"Related reading from the host{h} archive shelf.")
    paras.append("All rights reserved by the syndicate network.")
    return paras


def boilerplate_pages() -> list[tuple]:
    """``(url, html, lang)`` Spark input rows for the boilerplate fixture."""
    rows = []
    for i in range(BOILER_N_DOCS):
        h = i % BOILER_HOSTS
        url = f"https://host{h}.example.org/p/{i}"
        body = "".join(f"<p>{p}</p>" for p in _boiler_paragraphs(i))
        rows.append((url, f"<html><body>{body}</body></html>".encode(), "en"))
    return rows


def boilerplate_oracle_sql() -> str:
    """DuckDB re-derivation of the whole boilerplate pass: the VALUES table
    holds only the extracted paragraphs (ground truth of the extraction
    stage); host keying, normalization, per-host document frequency, the
    (min_df, ratio) threshold, and the ordered clean-text reassembly are
    all re-computed in SQL — independent of the Spark operator."""
    truth = []
    for i in range(BOILER_N_DOCS):
        h = i % BOILER_HOSTS
        url = f"https://host{h}.example.org/p/{i}"
        for ppos, text in enumerate(_boiler_paragraphs(i)):
            truth.append((url, ppos, text))
    paras = values_sql(truth, ["url", "ppos", "text"])
    return f"""
WITH paras AS ({paras}),
norm AS (
  SELECT url, ppos, text,
         regexp_extract(lower(url),
                        '^(?:[a-z][a-z0-9+.-]*://)?([^/?#:]+)', 1) AS host,
         md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS pkey
  FROM paras
),
host_docs AS (
  SELECT host, count(DISTINCT url) AS n_docs_host FROM norm GROUP BY host
),
flagged AS (
  SELECT n.host, n.pkey
  FROM norm n JOIN host_docs hd ON n.host = hd.host
  GROUP BY n.host, n.pkey, hd.n_docs_host
  HAVING count(DISTINCT n.url) >= {BOILER_MIN_DF}
     AND count(DISTINCT n.url) >= hd.n_docs_host * {BOILER_RATIO}
),
marked AS (
  SELECT n.url, n.ppos, n.text,
         (f.pkey IS NOT NULL) AS is_boiler
  FROM norm n
  LEFT JOIN flagged f ON n.host = f.host AND n.pkey = f.pkey
)
SELECT url,
       count(*) FILTER (WHERE NOT is_boiler) AS n_kept,
       count(*) FILTER (WHERE is_boiler) AS n_removed,
       COALESCE(string_agg(text, chr(10) ORDER BY ppos)
                FILTER (WHERE NOT is_boiler), '') AS clean_text
FROM marked GROUP BY url
"""


# --------------------------------------------------------------------------
# anchor_aliases — anchor-text link-graph fixture + oracle
# --------------------------------------------------------------------------

ANCHOR_N_DOCS = 50
ANCHOR_HOSTS = 4


def _anchor_links(i: int) -> list[tuple[str, str]]:
    """``(href, raw anchor text)`` pairs embedded in fixture page ``i``:
    one absolute link, one root-relative, a hub link with whitespace/case
    anchor variants (normalization must collapse them), a directory-relative
    link on every 5th page, and an empty-anchor link on every 9th (dropped
    by the alias table on both sides)."""
    n = ANCHOR_N_DOCS
    links = []
    t1 = (i * 3 + 1) % n
    links.append(
        (
            f"https://site{t1 % ANCHOR_HOSTS}.example.org/a/{t1}",
            f"Topic {t1 % 7} overview",
        )
    )
    t2 = (i * 7 + 2) % n
    links.append((f"/a/{t2}", f"see page {t2}"))
    links.append(
        ("https://site0.example.org/a/0", "  Home " if i % 2 else "home")
    )
    if i % 5 == 0:
        links.append((f"b/{i % 7}.html", f"Note {i % 7}"))
    if i % 9 == 0:
        links.append((f"https://site1.example.org/a/{(i + 5) % n}", ""))
    return links


def _anchor_src(i: int) -> str:
    return f"https://site{i % ANCHOR_HOSTS}.example.org/a/{i}"


def anchor_pages() -> list[tuple]:
    """``(url, html)`` Spark input rows for the link-graph fixture."""
    rows = []
    for i in range(ANCHOR_N_DOCS):
        nav = "".join(
            f'<a href="{href}">{anchor}</a>'
            for href, anchor in _anchor_links(i)
        )
        html = (
            f"<html><body><nav>{nav}</nav>"
            f"<p>Content of page {i}.</p></body></html>"
        )
        rows.append((_anchor_src(i), html.encode()))
    return rows


def _resolve_href(src: str, href: str) -> str:
    """Pure-Python href absolutization — the oracle's independent
    re-derivation of the operator's resolution rules."""
    import re as _re

    if _re.match(r"^[a-z][a-z0-9+.-]*://", href):
        return href
    m = _re.match(r"^([a-z][a-z0-9+.-]*)://([^/?#:]+)", src)
    scheme, host = m.group(1), m.group(2)
    if href.startswith("/"):
        return f"{scheme}://{host}{href}"
    return src.rsplit("/", 1)[0] + "/" + href


def anchor_aliases_oracle_sql() -> str:
    """VALUES of resolved ground-truth edges; anchor normalization, the
    empty-anchor filter and both aggregates re-derived in SQL."""
    edges = []
    for i in range(ANCHOR_N_DOCS):
        src = _anchor_src(i)
        for href, anchor in _anchor_links(i):
            edges.append((src, _resolve_href(src, href), anchor))
    vals = values_sql(edges, ["src", "dst", "anchor"])
    return f"""
WITH edges AS ({vals}),
norm AS (
  SELECT dst,
         regexp_replace(trim(lower(anchor)), '\\s+', ' ', 'g') AS anchor,
         regexp_extract(lower(src),
                        '^(?:[a-z][a-z0-9+.-]*://)?([^/?#:]+)', 1) AS src_host
  FROM edges
)
SELECT dst, anchor,
       count(*) AS n_links,
       count(DISTINCT src_host) AS n_src_hosts
FROM norm WHERE anchor <> '' GROUP BY dst, anchor
"""


# --------------------------------------------------------------------------
# anchor_prior_link — commonness entity linking fixture + oracle
# --------------------------------------------------------------------------

ANCHOR_MENTIONS_N = 40


def anchor_mentions() -> list[tuple]:
    """``(mention_id, mention)`` fixture rows: case/whitespace variants of
    known anchors (ambiguous "topic k overview" families exercise the
    argmax tie-break, "see page k" is unambiguous, "HOME" hits the hub's
    dominant prior) plus unlinkable strings every third row."""
    rows = []
    for j in range(ANCHOR_MENTIONS_N):
        if j % 3 == 0:
            m = f"Topic {j % 7}  Overview"
        elif j % 3 == 1:
            m = (
                "  HOME "
                if j % 6 == 1
                else f"See Page {j % ANCHOR_N_DOCS}"
            )
        else:
            m = f"unknownium {j}"
        rows.append((j, m))
    return rows


def _anchor_edges_cte() -> str:
    edges = []
    for i in range(ANCHOR_N_DOCS):
        src = _anchor_src(i)
        for href, anchor in _anchor_links(i):
            edges.append((src, _resolve_href(src, href), anchor))
    return values_sql(edges, ["src", "dst", "anchor"])


def anchor_prior_link_oracle_sql() -> str:
    """Full SQL re-derivation of the commonness linker: alias counts, the
    two-step argmax (max links per anchor, min dst at that count), the
    exact-integer prior, and the left-link of the mention fixture."""
    vals = _anchor_edges_cte()
    mvals = values_sql(anchor_mentions(), ["mention_id", "mention"])
    return f"""
WITH edges AS ({vals}),
mentions AS ({mvals}),
norm AS (
  SELECT dst,
         regexp_replace(trim(lower(anchor)), '\\s+', ' ', 'g') AS anchor
  FROM edges
),
aliases AS (
  SELECT dst, anchor, count(*) AS n_links
  FROM norm WHERE anchor <> '' GROUP BY dst, anchor
),
totals AS (
  SELECT anchor, sum(n_links) AS n_total FROM aliases GROUP BY anchor
),
best AS (
  SELECT a.anchor, a.n_links, min(a.dst) AS dst
  FROM aliases a
  JOIN (SELECT anchor, max(n_links) AS n_links
        FROM aliases GROUP BY anchor) mx
    ON a.anchor = mx.anchor AND a.n_links = mx.n_links
  GROUP BY a.anchor, a.n_links
),
dict AS (
  SELECT b.anchor, b.dst,
         CAST(b.n_links AS BIGINT) AS n_links,
         CAST(t.n_total AS BIGINT) AS n_total,
         CAST(b.n_links * 1000000 // t.n_total AS BIGINT) AS prior_ppm
  FROM best b JOIN totals t ON b.anchor = t.anchor
)
SELECT m.mention_id, m.mention,
       regexp_replace(trim(lower(m.mention)), '\\s+', ' ', 'g') AS surface,
       d.dst, d.n_links, d.n_total, d.prior_ppm
FROM mentions m
LEFT JOIN dict d
  ON regexp_replace(trim(lower(m.mention)), '\\s+', ' ', 'g') = d.anchor
"""


# --------------------------------------------------------------------------
# webtable_cells / webtable_triples — HTML table mining fixture + oracles
# --------------------------------------------------------------------------

WEBTABLE_N_DOCS = 30
_WT_COLORS = ["red", "green", "blue", "plaid"]


def _webtable_tables(i: int) -> list[dict]:
    """Tables on fixture page ``i``: a header-keyed product table (with an
    empty price cell every 5th page — cell kept, triple dropped), and a
    headerless table every 4th page (cells only, no triples)."""
    rows = []
    for r in range(2 + i % 2):
        price = "" if (i % 5 == 0 and r == 0) else f"{(i * 13 + r) % 90}.50"
        rows.append([f"item{i}_{r}", _WT_COLORS[(i + r) % 4], price])
    tables = [{"header": ["item", "color", "price"], "rows": rows}]
    if i % 4 == 0:
        tables.append(
            {"header": None, "rows": [["x", f"y{i}"], [f"z{i}", "w"]]}
        )
    return tables


def _webtable_url(i: int) -> str:
    return f"https://tables{i % 3}.example.org/t/{i}"


def webtable_pages() -> list[tuple]:
    """``(url, html)`` Spark input rows for the web-table fixture."""
    pages = []
    for i in range(WEBTABLE_N_DOCS):
        parts = []
        for t in _webtable_tables(i):
            trs = []
            if t["header"] is not None:
                trs.append(
                    "<tr>" + "".join(f"<th>{h}</th>" for h in t["header"])
                    + "</tr>"
                )
            for row in t["rows"]:
                trs.append(
                    "<tr>" + "".join(f"<td>{c}</td>" for c in row) + "</tr>"
                )
            parts.append("<table>" + "".join(trs) + "</table>")
        html = (
            "<html><body><p>Catalog page.</p>"
            + "".join(parts)
            + "</body></html>"
        )
        pages.append((_webtable_url(i), html.encode()))
    return pages


def webtable_cells_rows() -> list[tuple]:
    """Ground-truth ``(url, t_idx, r_idx, c_idx, is_header, text)`` rows."""
    out = []
    for i in range(WEBTABLE_N_DOCS):
        url = _webtable_url(i)
        for t_idx, t in enumerate(_webtable_tables(i)):
            r_off = 0
            if t["header"] is not None:
                for c_idx, h in enumerate(t["header"]):
                    out.append((url, t_idx, 0, c_idx, True, h))
                r_off = 1
            for r, row in enumerate(t["rows"]):
                for c_idx, c in enumerate(row):
                    out.append((url, t_idx, r + r_off, c_idx, False, c))
    return out


def webtable_cells_oracle_sql() -> str:
    return values_sql(
        webtable_cells_rows(),
        ["url", "t_idx", "r_idx", "c_idx", "is_header", "text"],
    )


def webtable_triples_oracle_sql() -> str:
    """Re-derives header-keyed triple-ification in SQL from the cell
    ground truth: predicates from row-0 headers, subjects from body
    column 0, one triple per non-empty body cell with c_idx > 0."""
    cells = webtable_cells_oracle_sql()
    return f"""
WITH cells AS ({cells}),
headers AS (
  SELECT url, t_idx, c_idx, text AS pred
  FROM cells WHERE is_header AND r_idx = 0 AND text <> ''
),
subjects AS (
  SELECT url, t_idx, r_idx, text AS subj
  FROM cells WHERE NOT is_header AND c_idx = 0 AND text <> ''
),
body AS (
  SELECT url, t_idx, r_idx, c_idx, text AS obj
  FROM cells WHERE NOT is_header AND c_idx > 0 AND text <> ''
)
SELECT s.subj, h.pred, b.obj,
       b.url || '#t' || CAST(b.t_idx AS VARCHAR)
             || ':r' || CAST(b.r_idx AS VARCHAR) AS prov
FROM body b
JOIN headers h ON b.url = h.url AND b.t_idx = h.t_idx AND b.c_idx = h.c_idx
JOIN subjects s ON b.url = s.url AND b.t_idx = s.t_idx AND b.r_idx = s.r_idx
"""


# --------------------------------------------------------------------------
# jsonld_triples — schema.org structured-data fixture + oracle
# --------------------------------------------------------------------------

JSONLD_N_DOCS = 45


def _jsonld_blocks_for(i: int) -> list[tuple[str, dict | None]]:
    """``(raw block text, parsed kv or None)`` per block on fixture page
    ``i``, in document order. A malformed block every 9th page still
    consumes a block index but parses to None (filtered).  One nested
    value every 7th page — Spark surfaces it as canonical JSON; the
    expected string is written here explicitly."""
    blocks: list[tuple[str, dict | None]] = []
    price = f"{(i * 37) % 100}.99"
    prod = (
        f'{{"@type": "Product", "@id": "prod:{i}", "name": "Widget {i}", '
        f'"brand": "Brand{i % 5}", "price": {price}}}'
    )
    blocks.append(
        (
            prod,
            {
                "@type": "Product",
                "@id": f"prod:{i}",
                "name": f"Widget {i}",
                "brand": f"Brand{i % 5}",
                "price": price,
            },
        )
    )
    if i % 3 == 0:
        person = (
            f'{{"@type": "Person", "name": "Author {i % 11}", '
            f'"jobTitle": "editor"}}'
        )
        blocks.append(
            (
                person,
                {
                    "@type": "Person",
                    "name": f"Author {i % 11}",
                    "jobTitle": "editor",
                },
            )
        )
    if i % 5 == 0:
        anon = f'{{"@type": "Offer", "priceCurrency": "EUR{i % 2}"}}'
        blocks.append(
            (anon, {"@type": "Offer", "priceCurrency": f"EUR{i % 2}"})
        )
    if i % 7 == 0:
        nested = (
            f'{{"@type": "Organization", "name": "Org {i}", '
            f'"address": {{"city": "Metropolis {i}"}}}}'
        )
        blocks.append(
            (
                nested,
                {
                    "@type": "Organization",
                    "name": f"Org {i}",
                    # Spark's from_json canonicalizes the nested value
                    "address": f'{{"city":"Metropolis {i}"}}',
                },
            )
        )
    if i % 9 == 0:
        blocks.append(('{bad json here}', None))
    return blocks


def _jsonld_url(i: int) -> str:
    return f"https://shop{i % 6}.example.org/item/{i}"


def jsonld_pages() -> list[tuple]:
    """``(url, html)`` Spark input rows for the JSON-LD fixture."""
    pages = []
    for i in range(JSONLD_N_DOCS):
        scripts = "".join(
            f'<script type="application/ld+json">{raw}</script>'
            for raw, _ in _jsonld_blocks_for(i)
        )
        html = (
            f"<html><head>{scripts}</head>"
            f"<body><p>Item {i}.</p></body></html>"
        )
        pages.append((_jsonld_url(i), html.encode()))
    return pages


def jsonld_oracle_sql() -> str:
    """Re-derives the subject cascade (@id > name > url#b<idx>), rdf:type
    routing and @-keyword dropping in SQL from the parsed-kv ground
    truth (block indices count every regex-matched block, including the
    malformed one the parse filter drops)."""
    kv_rows = []
    for i in range(JSONLD_N_DOCS):
        url = _jsonld_url(i)
        for b_idx, (_raw, kv) in enumerate(_jsonld_blocks_for(i)):
            if kv is None:
                continue
            for k, v in kv.items():
                kv_rows.append((url, b_idx, k, v))
    vals = values_sql(kv_rows, ["url", "b_idx", "key", "value"])
    return f"""
WITH kv AS ({vals}),
hdr AS (
  SELECT url, b_idx,
         COALESCE(
           max(CASE WHEN key = '@id' THEN value END),
           max(CASE WHEN key = 'name' THEN value END),
           url || '#b' || CAST(b_idx AS VARCHAR)) AS subj
  FROM kv GROUP BY url, b_idx
)
SELECT h.subj, 'rdf:type' AS pred, k.value AS obj,
       k.url || '#b' || CAST(k.b_idx AS VARCHAR) AS prov
FROM kv k JOIN hdr h ON k.url = h.url AND k.b_idx = h.b_idx
WHERE k.key = '@type'
UNION ALL
SELECT h.subj, k.key AS pred, k.value AS obj,
       k.url || '#b' || CAST(k.b_idx AS VARCHAR) AS prov
FROM kv k JOIN hdr h ON k.url = h.url AND k.b_idx = h.b_idx
WHERE k.key NOT LIKE '@%'
"""


# --------------------------------------------------------------------------
# kg_fused_triples — multi-source knowledge fusion fixture + oracle
# --------------------------------------------------------------------------

FUSION_N_DOCS = 36
_FUSE_COLORS = ["red", "green", "blue", "plaid"]


def _fusion_entity(i: int) -> tuple[str, str, str, str]:
    """``(subj, table color, jsonld color, price)`` for fixture page ``i``;
    the JSON-LD color disagrees with the table on every 3rd page."""
    subj = f"gadget{i}"
    color_t = _FUSE_COLORS[i % 4]
    color_j = "crimson" if i % 3 == 0 else color_t
    price = f"{(i * 7) % 50}.00"
    return subj, color_t, color_j, price


def fusion_pages() -> list[tuple]:
    """``(url, html)`` rows: each page carries BOTH a product table and a
    JSON-LD block describing the same entity (same ``@id`` as the table's
    key column), with a color conflict on every 3rd page."""
    pages = []
    for i in range(FUSION_N_DOCS):
        subj, color_t, color_j, price = _fusion_entity(i)
        table = (
            "<table><tr><th>item</th><th>color</th><th>price</th></tr>"
            f"<tr><td>{subj}</td><td>{color_t}</td><td>{price}</td></tr>"
            "</table>"
        )
        block = (
            f'{{"@type": "Product", "@id": "{subj}", '
            f'"color": "{color_j}", "price": "{price}"}}'
        )
        html = (
            f"<html><head><script type=\"application/ld+json\">{block}"
            f"</script></head><body>{table}</body></html>"
        )
        pages.append((f"https://fuse{i % 4}.example.org/g/{i}", html.encode()))
    return pages


def fusion_oracle_sql() -> str:
    """Ground-truth per-source triples as VALUES (mirroring the two
    extractors' outputs on the fixture); the fusion evidence aggregation,
    the exact-integer rank, and the two-step functional resolution are
    re-derived in SQL."""
    rows = []
    for i in range(FUSION_N_DOCS):
        subj, color_t, color_j, price = _fusion_entity(i)
        rows.append((subj, "color", color_t, "webtable", 0))
        rows.append((subj, "price", price, "webtable", 0))
        rows.append((subj, "rdf:type", "Product", "jsonld", 1))
        rows.append((subj, "color", color_j, "jsonld", 1))
        rows.append((subj, "price", price, "jsonld", 1))
    vals = values_sql(rows, ["subj", "pred", "obj", "source", "priority"])
    return f"""
WITH ev0 AS ({vals}),
ev AS (
  SELECT subj, pred, obj,
         count(*) AS n_prov,
         count(DISTINCT source) AS n_sources,
         min(priority) AS priority
  FROM ev0 GROUP BY subj, pred, obj
),
ranked AS (
  SELECT *,
         least(n_sources, 999999) * 1000000000
         + least(n_prov, 999999) * 1000
         + (999 - least(priority, 999)) AS rank
  FROM ev
),
best AS (SELECT subj, pred, max(rank) AS rank FROM ranked
         GROUP BY subj, pred)
SELECT r.subj, r.pred, min(r.obj) AS obj,
       CAST(r.n_sources AS BIGINT) AS n_sources,
       CAST(r.n_prov AS BIGINT) AS n_prov
FROM ranked r
JOIN best b ON r.subj = b.subj AND r.pred = b.pred AND r.rank = b.rank
GROUP BY r.subj, r.pred, r.rank, r.n_sources, r.n_prov
"""


# --------------------------------------------------------------------------
# canonical_links / canonical_resolution — rel=canonical fixture + oracles
# --------------------------------------------------------------------------

CANON_N_DOCS = 64


def _canon_url(i: int) -> str:
    return f"https://cano.example.org/c/{i}"


def _canon_target(i: int) -> str | None:
    """Declared canonical href of fixture page ``i`` (raw, pre-resolution):
    pages chain inside 8-page groups with group-dependent chain length
    2..8 (chains > 2^1 exercise the doubling), alternating absolute and
    root-relative hrefs; chain terminals have no tag; off-chain pages are
    self-canonical every 5th (filtered) or untagged."""
    g, p = i // 8, i % 8
    chain_len = (g % 7) + 2
    if p < chain_len - 1:
        nxt = i + 1
        return (
            _canon_url(nxt) if i % 2 == 0 else f"/c/{nxt}"
        )
    if p >= chain_len and i % 5 == 0:
        return _canon_url(i)  # self-canonical — filtered on extraction
    return None


def canonical_pages() -> list[tuple]:
    """``(url, html)`` Spark input rows for the canonical-chain fixture."""
    pages = []
    for i in range(CANON_N_DOCS):
        href = _canon_target(i)
        head = (
            f'<link rel="canonical" href="{href}">' if href is not None else ""
        )
        html = (
            f"<html><head>{head}</head>"
            f"<body><p>Page {i}.</p></body></html>"
        )
        pages.append((_canon_url(i), html.encode()))
    return pages


def canonical_links_rows() -> list[tuple]:
    """Ground-truth ``(url, canonical)`` edges after absolutization and
    self-link filtering — pure Python, mirrors no Spark code."""
    rows = []
    for i in range(CANON_N_DOCS):
        href = _canon_target(i)
        if href is None:
            continue
        absolute = href if href.startswith("http") else (
            "https://cano.example.org" + href
        )
        if absolute == _canon_url(i):
            continue
        rows.append((_canon_url(i), absolute))
    return rows


def canonical_links_oracle_sql() -> str:
    return values_sql(canonical_links_rows(), ["url", "canonical"])


def canonical_resolution_oracle_sql() -> str:
    """Spec-level re-derivation: a recursive CTE follows each url's
    pointer to the terminal target (the node with no outgoing canonical
    link) — independent of the Spark side's pointer-doubling rounds.
    The fixture is acyclic, so ``is_cycle`` is uniformly false."""
    vals = values_sql(canonical_links_rows(), ["url", "canonical"])
    return f"""
WITH RECURSIVE links AS ({vals}),
r(url, ptr) AS (
  SELECT url, canonical FROM links
  UNION ALL
  SELECT r.url, l.canonical FROM r JOIN links l ON l.url = r.ptr
)
SELECT r.url, r.ptr AS resolved, false AS is_cycle
FROM r WHERE r.ptr NOT IN (SELECT url FROM links)
"""


# --------------------------------------------------------------------------
# hreflang_clusters — translation-set fixture + recursive-CC oracle
# --------------------------------------------------------------------------

HREFLANG_N_GROUPS = 12
_HL_LANGS = ["en", "fr", "de", "ja"]


def _hl_url(g: int, lang: str) -> str:
    return f"https://ml{g % 3}.example.org/{lang}/{g}"


def _hl_declarations(g: int) -> list[tuple[str, list[tuple[str, str]]]]:
    """Per-page ``(url, [(hreflang, href), ...])`` for group ``g``; three
    declaration styles: full clique, hub-and-spoke, one-directional chain
    — CC must recover the same 4-url set from each."""
    urls = {l: _hl_url(g, l) for l in _HL_LANGS}
    style = g % 3
    pages = []
    for l in _HL_LANGS:
        decls: list[tuple[str, str]] = []
        if style == 0:
            decls = [(l2, urls[l2]) for l2 in _HL_LANGS]  # incl. self row
        elif style == 1:
            if l == "en":
                decls = [(l2, urls[l2]) for l2 in _HL_LANGS if l2 != "en"]
            else:
                decls = [("en", urls["en"])]
        else:
            chain = dict(zip(_HL_LANGS, _HL_LANGS[1:]))
            if l in chain:
                decls = [(chain[l], urls[chain[l]])]
        pages.append((urls[l], decls))
    return pages


def hreflang_pages() -> list[tuple]:
    """``(url, html)`` Spark input rows for the hreflang fixture."""
    rows = []
    for g in range(HREFLANG_N_GROUPS):
        for url, decls in _hl_declarations(g):
            head = "".join(
                f'<link rel="alternate" hreflang="{hl}" href="{href}">'
                for hl, href in decls
            )
            rows.append(
                (url, f"<html><head>{head}</head><body><p>x</p></body>"
                      f"</html>".encode())
            )
    return rows


def hreflang_edge_rows() -> list[tuple]:
    """Ground-truth ``(url, hreflang, alt_url)`` after the self-row drop."""
    rows = []
    for g in range(HREFLANG_N_GROUPS):
        for url, decls in _hl_declarations(g):
            for hl, href in decls:
                if href != url:
                    rows.append((url, hl, href))
    return rows


def hreflang_clusters_oracle_sql() -> str:
    """Connected components over the declaration graph as a recursive CTE
    (same shape as the kg_components oracle), group id = min url."""
    vals = values_sql(
        [(u, a) for u, _hl, a in hreflang_edge_rows()], ["src", "dst"]
    )
    return f"""
WITH RECURSIVE edges AS ({vals}),
csym AS (SELECT DISTINCT a, b FROM (
  SELECT src AS a, dst AS b FROM edges WHERE src <> dst
  UNION ALL SELECT dst, src FROM edges WHERE src <> dst) s0),
creach(a, b) AS (
  SELECT a, b FROM csym
  UNION
  SELECT r.a, s.b FROM creach r JOIN csym s ON r.b = s.a),
cnodes AS (SELECT DISTINCT entity FROM (
  SELECT src AS entity FROM edges
  UNION ALL SELECT dst FROM edges) n0),
ccomp AS (SELECT a AS entity, least(a, min(b)) AS component
          FROM creach GROUP BY a)
SELECT n.entity AS url, COALESCE(c.component, n.entity) AS group_id
FROM cnodes n LEFT JOIN ccomp c ON c.entity = n.entity
"""


# -- crawl scheduling: sitemap frontier + robots exclusion -------------------
#
# Fixture + independent SQL re-derivation for operators/crawl.py. Inputs are
# VALUES rows (the fixture); the frontier anti-join / staleness logic and the
# longest-prefix robots evaluation are re-derived in DuckDB SQL, not
# precomputed, so the oracle checks the operator logic end to end.

SITEMAP_HOSTS = 4
SITEMAP_URLS_PER_HOST = 12


def _sitemap_host(h: int) -> str:
    return f"site{h}.example.org"


def sitemap_fixture_pages() -> list[tuple]:
    """``(url, html)`` rows: one sitemap XML document per host. Every third
    url omits ``<priority>`` (defaults 0.5); every fourth omits
    ``<lastmod>`` (never stale)."""
    rows = []
    for h in range(SITEMAP_HOSTS):
        host = _sitemap_host(h)
        recs = []
        for i in range(SITEMAP_URLS_PER_HOST):
            loc = f"https://{host}/page/{i}"
            lastmod = (
                ""
                if i % 4 == 3
                else f"<lastmod>2026-01-{(i % 27) + 1:02d}</lastmod>"
            )
            prio = (
                ""
                if i % 3 == 2
                else f"<priority>0.{(i % 9) + 1}</priority>"
            )
            recs.append(f"<url><loc>{loc}</loc>{lastmod}{prio}</url>")
        xml = (
            '<?xml version="1.0"?><urlset>' + "".join(recs) + "</urlset>"
        )
        rows.append((f"https://{host}/sitemap.xml", xml.encode()))
    return rows


def sitemap_crawled_rows() -> list[tuple[str, str]]:
    """``(url, warc_ts)`` capture rows (ts as ISO string; Spark input casts
    to timestamp). Even-indexed urls are crawled; half of those with a
    capture *older* than their sitemap lastmod (stale), half newer."""
    rows = []
    for h in range(SITEMAP_HOSTS):
        host = _sitemap_host(h)
        for i in range(SITEMAP_URLS_PER_HOST):
            if i % 2 == 1:
                continue  # odd urls never crawled -> 'new'
            day = 2 if i % 4 == 0 else 27  # before vs after lastmod
            rows.append(
                (f"https://{host}/page/{i}", f"2026-01-{day:02d} 12:00:00")
            )
            if i % 4 == 0:  # a second, still-stale capture
                rows.append(
                    (f"https://{host}/page/{i}", "2026-01-01 06:00:00")
                )
    return rows


def sitemap_frontier_oracle_sql() -> str:
    sm = values_sql(
        [(u, h.decode()) for u, h in sitemap_fixture_pages()],
        ["url", "xml"],
    )
    cr = values_sql(sitemap_crawled_rows(), ["url", "warc_ts"])
    return f"""
WITH sm AS ({sm}),
recs AS (SELECT unnest(regexp_extract_all(xml, '<url>.*?</url>')) AS rec
         FROM sm),
e AS (SELECT regexp_extract(rec, '<loc>([^<]*)</loc>', 1) AS loc,
             nullif(regexp_extract(rec, '<lastmod>([^<]*)</lastmod>', 1),
                    '') AS lastmod_s,
             nullif(regexp_extract(rec, '<priority>([^<]*)</priority>', 1),
                    '') AS prio_s
      FROM recs),
ee AS (SELECT loc, CAST(lastmod_s AS TIMESTAMP) AS lastmod,
              COALESCE(CAST(prio_s AS DOUBLE), 0.5) AS priority
       FROM e WHERE loc <> ''),
cr AS ({cr}),
latest AS (SELECT url AS loc, max(CAST(warc_ts AS TIMESTAMP)) AS last_fetch
           FROM cr GROUP BY url)
SELECT ee.loc, CAST(priority AS DOUBLE) AS priority,
       CASE WHEN last_fetch IS NULL THEN 'new'
            WHEN lastmod IS NOT NULL AND lastmod > last_fetch THEN 'stale'
       END AS reason
FROM ee LEFT JOIN latest USING (loc)
WHERE (last_fetch IS NULL)
   OR (lastmod IS NOT NULL AND lastmod > last_fetch)
"""


ROBOTS_HOSTS = 3
ROBOTS_CANDIDATES = 40


def robots_fixture_pages() -> list[tuple]:
    """``(url, html)`` rows: one robots.txt body per host. Host 0 blocks
    /private/ but re-allows /private/pub/ (longer Allow override) and has
    a trailing strictbot-only group whose ``Disallow: /`` must NOT apply
    to ``*``; host 1 blocks /tmp/ and /private/ with a bare-comment noise
    line; host 2 has no Disallow (allow-all) and a stray pre-group
    ``Disallow:`` line that belongs to no group (ignored). A 4th host has
    no robots row at all."""
    bodies = [
        "User-agent: *\nDisallow: /private/\nAllow: /private/pub/\n"
        "Disallow: /search\n\nUser-agent: strictbot\nDisallow: /\n",
        "# crawl policy\nUser-agent: *\nDisallow: /tmp/\n"
        "Disallow: /private/\nDisallow:\n",
        "Disallow: /early/\nUser-agent: *\nAllow: /\n",
    ]
    return [
        (f"https://h{h}.example.net/robots.txt", bodies[h].encode())
        for h in range(ROBOTS_HOSTS)
    ]


def robots_candidate_rows() -> list[tuple[str]]:
    """Candidate urls across 4 hosts (3 with robots, 1 without), cycling
    through allowed, blocked, re-allowed, and root paths."""
    paths = [
        "/",
        "/index.html",
        "/private/a",
        "/private/pub/b",
        "/search?q=x",
        "/tmp/scratch",
        "/public/c",
        "/private/",
    ]
    rows = []
    for i in range(ROBOTS_CANDIDATES):
        h = i % 4  # h3 has no robots.txt
        rows.append((f"https://h{h}.example.net{paths[i % len(paths)]}",))
    return rows


def robots_allowed_oracle_sql() -> str:
    rb = values_sql(
        [(u, b.decode()) for u, b in robots_fixture_pages()],
        ["url", "body"],
    )
    cand = values_sql(robots_candidate_rows(), ["url"])
    return f"""
WITH rb AS ({rb}),
lines AS (SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
                 unnest(string_split(body, chr(10))) AS line,
                 generate_subscripts(string_split(body, chr(10)), 1) AS pos
          FROM rb),
marked AS (
  SELECT host, pos,
         regexp_matches(lower(line), '^\\s*user-agent\\s*:') AS is_ua,
         regexp_extract(lower(line), '^\\s*(allow|disallow)\\s*:', 1)
           AS kind,
         trim(regexp_extract(line, '^\\s*[A-Za-z-]+\\s*:\\s*(\\S*)', 1))
           AS prefix
  FROM lines),
openers AS (
  SELECT *, CASE WHEN is_ua AND NOT coalesce(
           lag(is_ua) OVER (PARTITION BY host ORDER BY pos), false)
         THEN 1 ELSE 0 END AS opener
  FROM marked),
grp AS (
  SELECT *, sum(opener) OVER (PARTITION BY host ORDER BY pos) AS gid
  FROM openers),
starred AS (
  SELECT *, max(CASE WHEN is_ua AND prefix = '*' THEN 1 ELSE 0 END)
           OVER (PARTITION BY host, gid) AS star
  FROM grp),
rules AS (SELECT host, kind, prefix FROM starred
          WHERE star = 1 AND gid > 0 AND kind <> '' AND prefix <> ''),
cand AS ({cand}),
cp AS (SELECT url,
              COALESCE(nullif(regexp_extract(
                url, '^[a-z][a-z0-9+.-]*://[^/]*(/.*)?$', 1), ''), '/')
                AS path,
              regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host
       FROM cand),
matched AS (
  SELECT cp.url, r.kind, r.prefix,
         row_number() OVER (
           PARTITION BY cp.url
           ORDER BY len(r.prefix) DESC, (r.kind = 'allow') DESC) AS rn
  FROM cp JOIN rules r
    ON cp.host = r.host AND starts_with(cp.path, r.prefix)),
best AS (SELECT url, kind, prefix FROM matched WHERE rn = 1)
SELECT cp.url, b.prefix AS matched_prefix
FROM cp LEFT JOIN best b USING (url)
WHERE b.url IS NULL OR b.kind = 'allow'
"""


# -- pronoun coreference fixture ---------------------------------------------

COREF_N_DOCS = 30

_COREF_PEOPLE = ["Alice", "Bob", "Carol", "Dan", "Eve"]
_COREF_ORGS = ["Acme", "Globex", "Initech"]
_COREF_TEAMS = ["Ants", "Bees", "Crows"]  # plural entities


def coref_fixture() -> tuple[list[tuple], list[tuple]]:
    """Deterministic ``(sentences, mentions)`` fixture.

    sentences: ``(doc_id, sent_pos, text)``; mentions:
    ``(doc_id, sent_pos, tok_pos, entity, is_plural)``. Each doc opens with
    a person + org sentence, continues with singular and plural pronoun
    sentences, and every 5th doc *starts* with a pronoun (no antecedent —
    must be dropped)."""
    sents, ments = [], []
    for d in range(COREF_N_DOCS):
        p = _COREF_PEOPLE[d % len(_COREF_PEOPLE)]
        o = _COREF_ORGS[d % len(_COREF_ORGS)]
        t = _COREF_TEAMS[d % len(_COREF_TEAMS)]
        pos = 0
        if d % 5 == 0:
            sents.append((d, pos, "They had no antecedent yet."))
            pos += 1
        # tok: 0=P 1=founded 2=O 3=in 4=year.
        sents.append((d, pos, f"{p} founded {o} in {2000 + d}."))
        ments.append((d, pos, 0, p, False))
        ments.append((d, pos, 2, o, False))
        pos += 1
        pron = ["He", "She", "It"][d % 3]
        sents.append((d, pos, f"{pron} grew quickly after that."))
        pos += 1
        sents.append((d, pos, f"The {t} joined {o} later."))
        ments.append((d, pos, 1, t, True))
        ments.append((d, pos, 3, o, False))
        pos += 1
        sents.append((d, pos, f"They hired {p} and praised it."))
        ments.append((d, pos, 2, p, False))
    return sents, ments


def coref_oracle_sql() -> str:
    """Independent SQL re-derivation: token explode + IGNORE NULLS window
    over the document token stream, number-agreement dispatch."""
    sents, ments = coref_fixture()
    sv = values_sql(sents, ["doc_id", "sent_pos", "text"])
    mv = values_sql(
        ments, ["doc_id", "sent_pos", "tok_pos", "entity", "is_plural"]
    )
    singular = ", ".join(f"'{w}'" for w in
                         ("he", "she", "it", "him", "her", "its",
                          "his", "hers"))
    plural = ", ".join(f"'{w}'" for w in
                       ("they", "them", "their", "theirs"))
    return f"""
WITH sents AS ({sv}), ments AS ({mv}),
toks AS (SELECT doc_id, sent_pos,
                generate_subscripts(string_split(text, ' '), 1) - 1
                  AS tok_pos,
                unnest(string_split(text, ' ')) AS tok
         FROM sents),
ev AS (SELECT t.doc_id, t.sent_pos, t.tok_pos,
              lower(regexp_replace(t.tok, '[.,;:!?]+$', '')) AS word,
              m.entity AS m_entity, m.is_plural AS m_plural
       FROM toks t LEFT JOIN ments m
         ON t.doc_id = m.doc_id AND t.sent_pos = m.sent_pos
        AND t.tok_pos = m.tok_pos),
r AS (SELECT doc_id, sent_pos, tok_pos, word,
             last_value(CASE WHEN NOT m_plural THEN m_entity END
                        IGNORE NULLS) OVER w AS last_singular,
             last_value(CASE WHEN m_plural THEN m_entity END
                        IGNORE NULLS) OVER w AS last_plural
      FROM ev
      WINDOW w AS (PARTITION BY doc_id ORDER BY sent_pos, tok_pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
SELECT doc_id, sent_pos, tok_pos, word AS pronoun,
       CASE WHEN word IN ({singular}) THEN last_singular
            WHEN word IN ({plural}) THEN last_plural END AS antecedent
FROM r
WHERE (word IN ({singular}) AND last_singular IS NOT NULL)
   OR (word IN ({plural}) AND last_plural IS NOT NULL)
"""


# -- webtable column types ----------------------------------------------------

def webtable_vocab_rows() -> list[tuple[str, str]]:
    """``(value, sem_type)`` dim for column annotation: the fixture colors."""
    return [(c, "COLOR") for c in _WT_COLORS]


def webtable_column_types_oracle_sql() -> str:
    """Independent SQL re-derivation of column annotation from the cell
    ground truth: all-values datatype rule + strict-majority vocab vote."""
    cells = webtable_cells_oracle_sql()
    vocab = values_sql(webtable_vocab_rows(), ["value", "sem_type"])
    return f"""
WITH cells AS ({cells}), vocab AS ({vocab}),
body AS (SELECT url, t_idx, c_idx, text FROM cells
         WHERE NOT is_header AND text <> ''),
stats AS (
  SELECT url, t_idx, c_idx, CAST(count(*) AS BIGINT) AS n_values,
         bool_and(regexp_matches(text, '^-?[0-9]+$')) AS all_int,
         bool_and(regexp_matches(text, '^-?[0-9]+(\\.[0-9]+)?$')) AS all_num
  FROM body GROUP BY url, t_idx, c_idx),
votes AS (
  SELECT b.url, b.t_idx, b.c_idx, v.sem_type, count(*) AS n_votes
  FROM body b JOIN vocab v ON lower(b.text) = v.value
  GROUP BY b.url, b.t_idx, b.c_idx, v.sem_type),
top AS (
  SELECT url, t_idx, c_idx, sem_type, n_votes,
         row_number() OVER (PARTITION BY url, t_idx, c_idx
                            ORDER BY n_votes DESC, sem_type DESC) AS rn
  FROM votes),
hdr AS (SELECT url, t_idx, c_idx, text AS header FROM cells
        WHERE is_header AND r_idx = 0 AND text <> '')
SELECT s.url, s.t_idx, s.c_idx, h.header, s.n_values,
       CASE WHEN all_int THEN 'integer'
            WHEN all_num THEN 'decimal'
            ELSE 'string' END AS datatype,
       CASE WHEN t.n_votes * 2 > s.n_values THEN t.sem_type END AS sem_type
FROM stats s
LEFT JOIN hdr h ON s.url = h.url AND s.t_idx = h.t_idx
                AND s.c_idx = h.c_idx
LEFT JOIN (SELECT * FROM top WHERE rn = 1) t
  ON s.url = t.url AND s.t_idx = t.t_idx AND s.c_idx = t.c_idx
"""


# -- inverse-functional-property sameAs ---------------------------------------

IFP_N_RECORDS = 40
IFP_PREDS = ("email", "phone", "homepage")
IFP_MAX_GROUP = 10


def ifp_fixture_rows() -> list[tuple[str, str, str]]:
    """``(subj, pred, obj)`` records: emails collide in groups of 3-4,
    phones in groups of 2-3, every record shares one hot ``homepage``
    (group size 40 > max_group — must be purged), and ``name`` rows are
    present but not inverse-functional (must be ignored)."""
    rows = []
    for i in range(IFP_N_RECORDS):
        subj = f"rec{i:02d}"
        rows.append((subj, "email", f"user{i % 12}@mail.example"))
        rows.append((subj, "phone", f"+1-555-{i % 15:04d}"))
        rows.append((subj, "homepage", "https://hub.example/"))
        rows.append((subj, "name", f"name{i % 5}"))
        if i % 7 == 0:
            rows.append((subj, "email", ""))  # empty obj -> ignored
    return rows


def ifp_oracle_sql() -> str:
    vals = values_sql(ifp_fixture_rows(), ["subj", "pred", "obj"])
    preds = ", ".join(f"'{p}'" for p in IFP_PREDS)
    return f"""
WITH t0 AS ({vals}),
t AS (SELECT DISTINCT subj, pred, obj FROM t0
      WHERE pred IN ({preds}) AND obj <> ''),
sizes AS (SELECT pred, obj, count(*) AS n FROM t GROUP BY pred, obj),
kept AS (SELECT t.* FROM t JOIN sizes USING (pred, obj)
         WHERE sizes.n <= {IFP_MAX_GROUP})
SELECT DISTINCT a.subj AS a, b.subj AS b, a.pred, a.obj
FROM kept a JOIN kept b ON a.pred = b.pred AND a.obj = b.obj
WHERE a.subj < b.subj
"""


def sameas_rewrite_oracle_sql() -> str:
    """Spec-level re-derivation of the IFP merge: recursive-CTE transitive
    closure over the sameAs pairs, least-member representative, then the
    triple rewrite + distinct-original-subject count."""
    vals = values_sql(ifp_fixture_rows(), ["subj", "pred", "obj"])
    preds = ", ".join(f"'{p}'" for p in IFP_PREDS)
    return f"""
WITH RECURSIVE t0 AS ({vals}),
t AS (SELECT DISTINCT subj, pred, obj FROM t0
      WHERE pred IN ({preds}) AND obj <> ''),
sizes AS (SELECT pred, obj, count(*) AS n FROM t GROUP BY pred, obj),
kept AS (SELECT t.* FROM t JOIN sizes USING (pred, obj)
         WHERE sizes.n <= {IFP_MAX_GROUP}),
pairs AS (SELECT DISTINCT a.subj AS a, b.subj AS b
          FROM kept a JOIN kept b ON a.pred = b.pred AND a.obj = b.obj
          WHERE a.subj < b.subj),
sym AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
comp AS (SELECT a AS node, least(a, min(b)) AS rep FROM reach
         WHERE a <> b GROUP BY a),
rw AS (SELECT COALESCE(cs.rep, t0.subj) AS subj, t0.pred,
              COALESCE(co.rep, t0.obj) AS obj, t0.subj AS osubj
       FROM t0
       LEFT JOIN comp cs ON t0.subj = cs.node
       LEFT JOIN comp co ON t0.obj = co.node)
SELECT subj, pred, obj,
       CAST(count(DISTINCT osubj) AS INT) AS n_sources
FROM rw GROUP BY subj, pred, obj
"""


# -- RAKE keywords ------------------------------------------------------------

def rake_oracle_sql(stopwords: tuple[str, ...], top_k: int = 3,
                    min_len: int = 2) -> str:
    stops = ", ".join(f"'{w}'" for w in stopwords)
    return f"""
WITH toks0 AS (
  SELECT doc_id,
         CAST(generate_subscripts(string_split(lower(text), ' '), 1) - 1
              AS BIGINT) AS tpos,
         unnest(string_split(lower(text), ' ')) AS rawtok
  FROM documents),
toks AS (SELECT doc_id, tpos,
                regexp_replace(rawtok, '[.,;:!?]+$', '') AS tok
         FROM toks0),
flagged AS (SELECT doc_id, tpos, tok,
                   (tok IN ({stops}) OR tok = '') AS stop
            FROM toks),
runs AS (
  SELECT doc_id, tpos, tok,
         sum(CASE WHEN stop THEN 1 ELSE 0 END) OVER (
           PARTITION BY doc_id ORDER BY tpos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS phrase_id,
         stop
  FROM flagged),
pw AS (SELECT doc_id, phrase_id, tpos, tok FROM runs WHERE NOT stop),
plen AS (SELECT doc_id, phrase_id, count(*) AS p_len
         FROM pw GROUP BY doc_id, phrase_id),
wl AS (SELECT pw.*, plen.p_len FROM pw
       JOIN plen USING (doc_id, phrase_id)),
deg AS (SELECT tok, CAST(sum(p_len) AS BIGINT) AS deg
        FROM wl GROUP BY tok),
phrases AS (
  SELECT doc_id, phrase_id, string_agg(tok, ' ' ORDER BY tpos) AS phrase,
         CAST(count(*) AS BIGINT) AS n_words
  FROM pw GROUP BY doc_id, phrase_id),
scores AS (
  SELECT wl.doc_id, wl.phrase_id, CAST(sum(deg.deg) AS BIGINT) AS score
  FROM wl JOIN deg USING (tok) GROUP BY wl.doc_id, wl.phrase_id),
cand AS (
  SELECT p.doc_id, p.phrase, p.n_words, s.score
  FROM phrases p JOIN scores s USING (doc_id, phrase_id)
  WHERE p.n_words >= {min_len}),
ranked AS (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY doc_id ORDER BY score DESC, phrase ASC) AS INT) AS kw_rank
  FROM cand)
SELECT doc_id, phrase, n_words, score, kw_rank
FROM ranked WHERE kw_rank <= {top_k}
"""


# --------------------------------------------------------------------------
# microdata_triples — schema.org microdata fixture + oracle
# --------------------------------------------------------------------------

MICRODATA_N_DOCS = 40


def _microdata_items_for(i: int) -> list[dict]:
    """Item specs for fixture page ``i``: ``itemtype``/``itemid`` plus
    ``props`` as ``(name, kind, value)`` where kind picks the HTML value
    carrier (text / meta-content / a-href / img-src). ``value is None``
    or '' exercises the drop rules. Quote style and attribute order vary
    deterministically in the HTML renderer, not here."""
    items: list[dict] = [
        {
            "itemtype": "https://schema.org/Product",
            "itemid": f"urn:prod:{i}" if i % 4 == 0 else None,
            "props": [
                ("name", "text", f"Gadget {i}"),
                ("sku", "meta", f"SKU-{i:04d}"),
                ("url", "href", f"/products/{i}"),
                ("image", "src", f"/img/{i}.png"),
                ("note", "text", ""),  # empty inner text -> dropped
            ],
        }
    ]
    if i % 3 == 0:
        items.append(
            {
                "itemtype": "https://schema.org/Review",
                "itemid": None,
                "props": [
                    ("reviewBody", "text", f"Works great {i} stars"),
                    ("ratingValue", "meta", str(i % 5 + 1)),
                    ("empty", "meta", ""),  # content="" -> dropped
                ],
            }
        )
    if i % 6 == 0:
        # item with no itemtype: props still triple-ify, no rdf:type row
        items.append(
            {
                "itemtype": None,
                "itemid": None,
                "props": [("label", "text", f"untyped {i}")],
            }
        )
    return items


def _microdata_url(i: int) -> str:
    return f"https://store{i % 7}.example.net/p/{i}"


def _microdata_prop_html(name: str, kind: str, value: str, q: str) -> str:
    if kind == "meta":
        return f"<meta itemprop={q}{name}{q} content={q}{value}{q}>"
    if kind == "href":
        return f'<a class="lnk" itemprop={q}{name}{q} href={q}{value}{q}>see</a>'
    if kind == "src":
        return f"<img itemprop={q}{name}{q} src={q}{value}{q}>"
    return f"<span itemprop={q}{name}{q}>{value}</span>"


def microdata_pages() -> list[tuple]:
    """``(url, html)`` Spark input rows for the microdata fixture. Every
    3rd page opens with non-item markup (so the preamble-segment filter
    is exercised); quote style alternates per page; one page in 10 also
    carries a nested-linkage tag (itemprop+itemscope) that must be
    dropped, whose own props attach to the nested item."""
    pages = []
    for i in range(MICRODATA_N_DOCS):
        q = '"' if i % 2 == 0 else "'"
        parts = []
        if i % 3 != 0:
            parts.append(f"<html><body><h1>Page {i}</h1>")
        for spec in _microdata_items_for(i):
            attrs = ["itemscope"]
            if spec["itemtype"]:
                attrs.append(f"itemtype={q}{spec['itemtype']}{q}")
            if spec["itemid"]:
                attrs.append(f"itemid={q}{spec['itemid']}{q}")
            # attribute order varies: itemscope first on even pages
            if i % 2 == 1:
                attrs = attrs[1:] + attrs[:1]
            parts.append(f"<div {' '.join(attrs)}>")
            for name, kind, value in spec["props"]:
                parts.append(_microdata_prop_html(name, kind, value, q))
                parts.append("<br>")
            parts.append("</div>")
        if i % 10 == 0:
            # nested linkage: child item named as a parent property —
            # the linkage tag is dropped; the child's own prop lands on
            # the child subject (next item index)
            parts.append(
                f"<div itemprop={q}manufacturer{q} itemscope "
                f"itemtype={q}https://schema.org/Organization{q}>"
                f"<span itemprop={q}name{q}>Maker {i}</span></div>"
            )
        parts.append("</body></html>")
        pages.append((_microdata_url(i), "".join(parts).encode()))
    return pages


def microdata_expected_rows() -> list[tuple]:
    """Ground-truth ``(url, item_idx, itemid, itemtype, prop, value)``
    rows (header rows carry prop=NULL), re-derived independently from
    the same specs the HTML renderer consumed."""
    rows = []
    for i in range(MICRODATA_N_DOCS):
        url = _microdata_url(i)
        specs = list(_microdata_items_for(i))
        if i % 10 == 0:
            specs.append(
                {
                    "itemtype": "https://schema.org/Organization",
                    "itemid": None,
                    "props": [("name", "text", f"Maker {i}")],
                }
            )
        for idx, spec in enumerate(specs):
            rows.append((url, idx, spec["itemid"], spec["itemtype"], None, None))
            for name, _kind, value in spec["props"]:
                if value:
                    rows.append((url, idx, None, None, name, value))
    return rows


def microdata_oracle_sql() -> str:
    """Re-derives the subject cascade (itemid > url#item<idx>) and the
    rdf:type routing in SQL from the ground-truth rows."""
    vals = values_sql(
        microdata_expected_rows(),
        ["url", "item_idx", "itemid", "itemtype", "prop", "value"],
    )
    return f"""
WITH md AS ({vals}),
hdr AS (
  SELECT url, item_idx,
         COALESCE(max(itemid),
                  url || '#item' || CAST(item_idx AS VARCHAR)) AS subj,
         max(itemtype) AS itemtype
  FROM md WHERE prop IS NULL GROUP BY url, item_idx
)
SELECT h.subj, 'rdf:type' AS pred, h.itemtype AS obj,
       h.url || '#item' || CAST(h.item_idx AS VARCHAR) AS prov
FROM hdr h WHERE h.itemtype IS NOT NULL
UNION ALL
SELECT h.subj, m.prop AS pred, m.value AS obj,
       h.url || '#item' || CAST(h.item_idx AS VARCHAR) AS prov
FROM md m JOIN hdr h ON h.url = m.url AND h.item_idx = m.item_idx
WHERE m.prop IS NOT NULL
"""


# --------------------------------------------------------------------------
# meta_og_triples — <meta> tag fixture + oracle
# --------------------------------------------------------------------------

META_N_DOCS = 50


def _meta_tags_for(i: int) -> list[tuple[str | None, str | None, str | None]]:
    """``(property, name, content)`` specs per fixture page, in document
    order. None means the attribute is absent; the renderer varies quote
    style and attribute order."""
    tags: list[tuple[str | None, str | None, str | None]] = [
        ("og:title", None, f"Article {i} headline"),
        ("og:type", None, "article" if i % 2 == 0 else "website"),
        ("og:url", None, _meta_url(i)),
        (None, "description", f"Summary of page {i}"),
    ]
    if i % 3 == 0:
        # both property and name on one tag: property wins
        tags.append(("og:site_name", "site", f"Site {i % 4}"))
    if i % 4 == 0:
        tags.append((None, "keywords", f"kw{i},kw{i + 1}"))
    if i % 5 == 0:
        tags.append((None, "author", f"Writer {i % 9}"))
        # charset-style meta: no property/name/content -> dropped
        tags.append((None, None, None))
    if i % 7 == 0:
        tags.append(("article:tag", None, f"topic-{i % 6}"))
        # empty content -> dropped
        tags.append(("og:image", None, ""))
    return tags


def _meta_url(i: int) -> str:
    return f"https://news{i % 5}.example.com/a/{i}"


def meta_pages() -> list[tuple]:
    """``(url, html)`` Spark input rows for the meta-tag fixture."""
    pages = []
    for i in range(META_N_DOCS):
        q = '"' if i % 2 == 0 else "'"
        head = []
        for prop, name, content in _meta_tags_for(i):
            attrs = []
            if prop is not None:
                attrs.append(f"property={q}{prop}{q}")
            if name is not None:
                attrs.append(f"name={q}{name}{q}")
            if content is not None:
                attrs.append(f"content={q}{content}{q}")
            if not attrs:
                attrs = ["charset=utf-8"]
            if i % 3 == 1:
                attrs.reverse()
            head.append(f"<meta {' '.join(attrs)}>")
        html = (
            f"<html><head><title>t{i}</title>{''.join(head)}</head>"
            f"<body><p>Body {i}.</p></body></html>"
        )
        pages.append((_meta_url(i), html.encode()))
    return pages


def meta_oracle_sql() -> str:
    """Re-derives predicate resolution (property > name) and the drop
    rules in SQL from the tag specs."""
    rows = []
    for i in range(META_N_DOCS):
        url = _meta_url(i)
        for prop, name, content in _meta_tags_for(i):
            rows.append((url, prop, name, content))
    vals = values_sql(rows, ["url", "prop", "name", "content"])
    return f"""
WITH tags AS ({vals})
SELECT url AS subj, COALESCE(prop, name) AS pred, content AS obj,
       url AS prov
FROM tags
WHERE COALESCE(prop, name) IS NOT NULL
  AND content IS NOT NULL AND content <> ''
"""


# --------------------------------------------------------------------------
# feed_items — RSS/Atom feed fixture + oracle
# --------------------------------------------------------------------------

FEEDS_N_DOCS = 36


def _feed_items_for(i: int) -> list[dict]:
    """Item specs for fixture feed ``i``. ``kind`` alternates RSS/Atom per
    feed; each item carries the raw date text the renderer embeds AND the
    expected parsed timestamp string (None = unparseable)."""
    kind = "rss" if i % 2 == 0 else "atom"
    n_items = i % 4 + 1
    items = []
    for j in range(n_items):
        day = (i + j) % 28 + 1
        hh = (i * 7 + j) % 24
        iso_ts = f"2026-02-{day:02d} {hh:02d}:15:00"
        if kind == "rss":
            date_raw = f"Mon, {day:02d} Feb 2026 {hh:02d}:15:00 GMT"
        else:
            date_raw = f"2026-02-{day:02d}T{hh:02d}:15:00Z"
        expect_ts = iso_ts
        if (i + j) % 7 == 0:
            date_raw, expect_ts = "not a date", None
        item = {
            "title": f"Post {i}-{j}",
            "cdata": (i + j) % 5 == 0,
            "link": f"https://blog{i % 8}.example.org/{i}/{j}",
            "guid": f"tag:feed{i},post{j}" if (i + j) % 3 != 0 else None,
            "date_raw": date_raw,
            "expect_ts": expect_ts,
        }
        if (i + j) % 11 == 0:
            item["link"] = None  # id falls back to guid; link NULL
        items.append(item)
    return items


def _feed_url(i: int) -> str:
    kind = "rss" if i % 2 == 0 else "atom"
    return f"https://blog{i % 8}.example.org/feed/{i}.{kind}"


def feed_pages() -> list[tuple]:
    """``(url, html)`` rows: rendered RSS 2.0 / Atom documents."""
    pages = []
    for i in range(FEEDS_N_DOCS):
        kind = "rss" if i % 2 == 0 else "atom"
        q = '"' if i % 4 < 2 else "'"
        out = []
        if kind == "rss":
            out.append('<?xml version="1.0"?><rss version="2.0"><channel>'
                       f"<title>Feed {i}</title>")
            for it in _feed_items_for(i):
                title = it["title"]
                if it["cdata"]:
                    title = f"<![CDATA[{title}]]>"
                out.append("<item>")
                out.append(f"<title>{title}</title>")
                if it["link"]:
                    out.append(f"<link>{it['link']}</link>")
                if it["guid"]:
                    out.append(f'<guid isPermaLink="false">{it["guid"]}</guid>')
                out.append(f"<pubDate>{it['date_raw']}</pubDate>")
                out.append("</item>")
            out.append("</channel></rss>")
        else:
            out.append('<?xml version="1.0"?>'
                       '<feed xmlns="http://www.w3.org/2005/Atom">'
                       f"<title>Feed {i}</title>")
            for it in _feed_items_for(i):
                title = it["title"]
                if it["cdata"]:
                    title = f"<![CDATA[{title}]]>"
                out.append("<entry>")
                out.append(f"<title>{title}</title>")
                if it["link"]:
                    out.append(f"<link rel={q}alternate{q} href={q}{it['link']}{q}/>")
                if it["guid"]:
                    out.append(f"<id>{it['guid']}</id>")
                out.append(f"<updated>{it['date_raw']}</updated>")
                out.append("</entry>")
            out.append("</feed>")
        pages.append((_feed_url(i), "".join(out).encode()))
    return pages


def feeds_oracle_sql() -> str:
    """Ground-truth rows re-derived from the same specs the renderer
    consumed (id cascade guid/id > link; timestamps as expected strings
    cast back to TIMESTAMP; unparseable dates NULL)."""
    rows = []
    for i in range(FEEDS_N_DOCS):
        url = _feed_url(i)
        for j, it in enumerate(_feed_items_for(i)):
            item_id = it["guid"] or it["link"]
            rows.append(
                (url, j, item_id, it["title"], it["link"], it["expect_ts"])
            )
    vals = values_sql(
        rows,
        ["feed_url", "item_idx", "item_id", "title", "link", "published"],
    )
    return f"""
WITH items AS ({vals})
SELECT feed_url, item_idx, item_id, title, link,
       CAST(published AS TIMESTAMP) AS published_ts
FROM items
"""
