"""Round-3 hardening: advisor findings + the flagship broadcast un-force.

Covers (ADVICE.md r2):
  * delete_where on a fully-emptied snapshot (double-redo) — previously
    crashed with UNABLE_TO_INFER_SCHEMA after destroying the data dir,
  * NULL-predicate rows survive DELETE WHERE (SQL semantics),
  * spans_from_iob: an orphan I- token (malformed IOB2) is dropped instead
    of silently mispairing every later span of that type,
  * SentenceFilter.discard_bad fails loud when is_bad is absent,
  * canonical_url_col's utm-strip is anchored to a parameter boundary,
plus VERDICT r2 item 1: the canonical-mapping join completes (identical
results) when broadcast is impossible — no forced hint on the flagship.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_spark import datagen
from search_spark.io.snapshots import SnapshotTable
from search_spark.pipeline import build_triples, redo_entity_type, run_to_snapshot


# -- delete_where / redo ----------------------------------------------------

def test_double_redo_same_entity_type(spark, tmp_path):
    """Idempotent restart: the second redo empties the snapshot the first
    one appended — the exact scenario that used to crash on the empty
    partitioned rewrite."""
    root = str(tmp_path / "t")
    pages = datagen.generate_web_pages(spark, 15, seed=21, partitions=2)
    run_to_snapshot(spark, pages, root)
    r1 = redo_entity_type(spark, pages, root, "CHEMICAL")
    r2 = redo_entity_type(spark, pages, root, "CHEMICAL")
    assert r2["n_deleted"] == r1["n_repopulated"]
    assert r2["n_repopulated"] == r1["n_repopulated"]
    table = SnapshotTable(spark, root)
    df = table.load()
    # one copy of the CHEMICAL rows, everything else untouched
    assert (
        df.filter(F.col("entity_type") == "CHEMICAL").count()
        == r2["n_repopulated"]
    )
    # the emptied snapshot is tombstoned in lineage, not left unreadable
    lineage = table.lineage()
    tombs = [li for li in lineage if li.get("tombstone")]
    assert len(tombs) == 1 and tombs[0]["n_rows"] == 0
    # lineage totals still equal the readable rows
    assert sum(li["n_rows"] for li in lineage) == df.count()


def test_delete_where_keeps_null_predicate_rows(spark, tmp_path):
    table = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=4)
    df = spark.createDataFrame(
        [("u1", "X"), ("u2", None), ("u3", "Y")], ["url", "entity_type"]
    )
    table.append(df)
    n = table.delete_where(F.col("entity_type") == "X")
    assert n == 1
    kept = {r["url"] for r in table.load().collect()}
    # SQL DELETE WHERE retains NULL-predicate rows
    assert kept == {"u2", "u3"}


def test_delete_where_empties_whole_table(spark, tmp_path):
    table = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=4)
    df = spark.createDataFrame([("u1", "X"), ("u2", "X")], ["url", "entity_type"])
    table.append(df)
    assert table.delete_where(F.col("entity_type") == "X") == 2
    assert table.load() is None
    # the table still accepts appends with a fresh snapshot id
    info = table.append(df)
    assert info.snapshot_id == 2
    assert table.load().count() == 2


# -- spans_from_iob ---------------------------------------------------------

def _spans(spark, tags):
    from search_spark.operators.evaluation import spans_from_iob

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(tags)], ["idx", "iob"]
    )
    out = spans_from_iob(df, "iob", "idx")
    return sorted(
        (r["entity_type"], r["start"], r["end"]) for r in out.collect()
    )


def test_spans_orphan_inside_does_not_shift_pairing(spark):
    # orphan I-DIS at idx 3 (prev is O): dropped; later spans unaffected
    tags = ["B-DIS", "I-DIS", "O", "I-DIS", "O", "B-DIS", "I-DIS"]
    assert _spans(spark, tags) == [("DIS", 0, 1), ("DIS", 5, 6)]


def test_spans_orphan_cross_type(spark):
    # I-DIS after B-CHEM is an orphan for DIS, and ends the CHEM span
    assert _spans(spark, ["B-CHEM", "I-DIS", "O"]) == [("CHEM", 0, 0)]


def test_spans_b_b_still_two_spans(spark):
    assert _spans(spark, ["B-DIS", "B-DIS", "I-DIS"]) == [
        ("DIS", 0, 0),
        ("DIS", 1, 2),
    ]


# -- SentenceFilter ---------------------------------------------------------

def test_discard_bad_without_is_bad_raises(spark):
    from search_spark.operators.sentence_filter import SentenceFilter

    sentences = spark.createDataFrame([("u1", "hello")], ["url", "text"])
    with pytest.raises(ValueError, match="is_bad"):
        SentenceFilter().discard_bad().apply(sentences)


# -- canonical_url_col ------------------------------------------------------

def test_canonical_url_utm_anchored(spark):
    from search_spark.operators.urls import canonical_url_col

    cases = {
        # embedded 'utm_...=' in a longer param name must NOT be stripped
        "https://example.org/a?xutm_a=b": "example.org/a?xutm_a=b",
        # ... nor inside a path segment
        "https://example.org/utm_a=b/page": "example.org/utm_a=b/page",
        # real tracking params go, other params stay, in any position
        "https://example.org/p?utm_a=1&utm_b=2&c=3": "example.org/p?c=3",
        "https://example.org/p?a=1&utm_b=2": "example.org/p?a=1",
        "https://example.org/p?utm_a=1": "example.org/p",
        "HTTPS://WWW.Example.org/Page/7?utm_source=feed&ref=3":
            "example.org/page/7?ref=3",
        "https://example.org/p#frag": "example.org/p",
    }
    df = spark.createDataFrame([(u,) for u in cases], ["url"])
    got = {
        r["url"]: r["canon"]
        for r in df.select(
            "url", canonical_url_col("url").alias("canon")
        ).collect()
    }
    assert got == cases


def test_canonical_url_duckdb_oracle_parity():
    """The DuckDB chain in _SQL_URL_DEDUP must transform identically —
    run it on the tricky cases directly."""
    import duckdb

    sql_chain = """
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(
                  regexp_replace(lower(url), '#.*', '', 'g'),
                  '([?&])utm_[a-z]+=[^&]*', '\\1', 'g'),
                '&&+', '&', 'g'),
              '\\?&', '?', 'g'),
            '[?&]+$', '', 'g'),
          '^https?://(www\\.)?', '', 'g'),
        '/$', '', 'g')
    """
    cases = {
        "https://example.org/a?xutm_a=b": "example.org/a?xutm_a=b",
        "https://example.org/p?utm_a=1&utm_b=2&c=3": "example.org/p?c=3",
        "https://example.org/p?a=1&utm_b=2": "example.org/p?a=1",
        "https://example.org/p?utm_a=1": "example.org/p",
    }
    con = duckdb.connect()
    for raw, want in cases.items():
        got = con.execute(
            f"SELECT {sql_chain} FROM (SELECT ? AS url)", [raw]
        ).fetchone()[0]
        assert got == want, raw


# -- size-gated broadcast ---------------------------------------------------

def test_broadcast_row_limit_parses_threshold(spark):
    from search_spark.joins import broadcast_row_limit

    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        for raw, expect in [
            ("-1", 0),
            ("0", 0),
            ("4096", 64),
            ("1MB", (1 << 20) // 64),
            ("10mb", 10 * (1 << 20) // 64),
            ("1048576b", (1 << 20) // 64),
        ]:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", raw)
            assert broadcast_row_limit(spark) == expect, raw
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_maybe_broadcast_gates_on_count(spark):
    from search_spark.joins import maybe_broadcast

    df = spark.createDataFrame([(1, "a")], ["k", "v"])
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "4096")
        hinted = maybe_broadcast(df, 10)
        unhinted = maybe_broadcast(df, 1_000_000)
        assert "ResolvedHint" in hinted._jdf.queryExecution().analyzed().toString()
        assert "ResolvedHint" not in unhinted._jdf.queryExecution().analyzed().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


# -- flagship: mapping join without broadcast -------------------------------

def test_mapping_join_survives_no_broadcast(spark):
    """VERDICT r2 item 1: at web scale the canonical mapping (distinct
    surface forms) can exceed any broadcast threshold. With every
    broadcast conversion disabled the un-hinted join must fall back to a
    partitioned join and produce the identical triple set."""
    pages = datagen.generate_web_pages(spark, 12, seed=31, partitions=2)

    def run():
        rows = build_triples(spark, pages).collect()
        return sorted(map(tuple, rows))

    baseline = run()
    saved = {
        "spark.sql.autoBroadcastJoinThreshold":
            spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
        # None when unset — restoring an unset conf to a made-up
        # default would permanently enable runtime broadcast for the
        # rest of the suite (found via test_skew_join in-suite failure)
        "spark.sql.adaptive.autoBroadcastJoinThreshold":
            spark.conf.get(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", None
            ),
    }
    try:
        for k in saved:
            spark.conf.set(k, "-1")
        assert run() == baseline and len(baseline) > 0
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_flagship_large_vocabulary_completes_partitioned(spark):
    """The datagen vocabulary-blowup knob: every doc contributes globally
    unique surface forms (open-web mention vocabulary), and the broadcast
    thresholds are clamped to 4 KB so neither the resolved-forms table nor
    the canonical mapping can broadcast — the flagship must complete
    through partitioned joins and still emit one has_type triple per
    unique compound mention."""
    from search_spark.operators.patterns import PatternStore
    from search_spark.pipeline import PipelineConfig

    n_docs, k = 120, 12
    pages = datagen.generate_web_pages(
        spark, n_docs, seed=41, partitions=4, unique_terms_per_doc=k
    ).cache()
    n_en = pages.filter(F.col("lang") == "en").count()
    store = PatternStore().add_regex("CHEMICAL", r"cmpd\d+q\d+")
    cfg = PipelineConfig(models={"CHEMICAL": store})

    saved = {
        "spark.sql.autoBroadcastJoinThreshold":
            spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
        "spark.sql.adaptive.autoBroadcastJoinThreshold":
            spark.conf.get(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", None
            ),
    }
    try:
        for key in saved:
            spark.conf.set(key, "4096")
        triples = build_triples(spark, pages, cfg)
        typed = triples.filter(F.col("pred") == "has_type")
        # every unique term of every english doc surfaced exactly once
        # (a small fraction kNN-links above threshold and carries a
        # canonical concept id as subj instead of the raw form)
        assert typed.count() == n_en * k
        n_raw = typed.filter(F.col("subj").rlike("^cmpd")).count()
        assert n_raw >= int(0.9 * n_en * k)
    finally:
        pages.unpersist()
        for key, v in saved.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


def test_mapping_join_has_no_forced_broadcast_hint(spark):
    """The plan must not carry a ResolvedHint/forced broadcast on the
    mapping side: with thresholds at -1, a hinted join would still show
    BroadcastHashJoin; an un-hinted one plans SortMergeJoin."""
    import contextlib
    import io

    pages = datagen.generate_web_pages(spark, 6, seed=32, partitions=2)
    saved = {
        "spark.sql.autoBroadcastJoinThreshold":
            spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
        "spark.sql.adaptive.autoBroadcastJoinThreshold":
            spark.conf.get(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", None
            ),
    }
    try:
        for k in saved:
            spark.conf.set(k, "-1")
        triples = build_triples(spark, pages)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            triples.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
