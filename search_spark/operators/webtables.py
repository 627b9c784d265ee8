"""Web-table mining: HTML ``<table>`` elements → cells → (subj, pred, obj).

Web tables are the second classic KG source on Common-Crawl-style corpora
(after running text): a relational table whose first column names an entity
and whose header row names properties yields one triple per body cell —
the WebTables/DBpedia-infobox recipe.  The reference pipeline has no
table path at all (its tag profiles *drop* tables as boilerplate,
article.py:528-548 / html_text.py:91); this module adds it as a separate
extraction, so the text path's byte-parity contract is untouched.

Two stages with a clean seam:

* :func:`table_cells` — the only Python step: an Arrow-batched
  ``mapInPandas`` over ``(url, html)`` that walks each document's
  ``<table>`` elements with a tolerant stdlib ``html.parser`` kernel
  (real pages are tag soup, not XML) and emits one row per cell
  ``(url, t_idx, r_idx, c_idx, is_header, text)``.  Per-page work is
  linear in page size; output is partition-local (no shuffle).
* :func:`cells_to_triples` — pure DataFrame algebra: header cells become
  the predicate dictionary of their ``(url, t_idx, c_idx)``, the first
  body column names the row's subject, and each remaining body cell emits
  ``(subj, pred, obj, prov)``.  Both lookups are equi-joins on
  ``(url, t_idx, …)`` — co-partitioned with the cell table, and the
  header side is tables×columns sized, so AQE broadcasts it when small
  (never forced).

Tables without a ``<th>`` header row produce no triples (no predicate
names) — they still appear in the cell table for schema-recovery passes.
"""

from __future__ import annotations

import re
import unicodedata
from html.parser import HTMLParser
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_WS_RE = re.compile(r"\s+")

CELLS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("t_idx", T.IntegerType(), False),
        T.StructField("r_idx", T.IntegerType(), False),
        T.StructField("c_idx", T.IntegerType(), False),
        T.StructField("is_header", T.BooleanType(), False),
        T.StructField("text", T.StringType(), False),
    ]
)


class _CellWalker(HTMLParser):
    """Tolerant streaming table walker (stdlib ``html.parser``).

    Real web pages are never well-formed XML — void tags (``<meta>``,
    ``<br>``), bare attributes (``itemscope``), HTML entities
    (``&nbsp;``) and unclosed ``td``/``tr`` are all routine. The previous
    ``ElementTree.fromstring`` kernel dropped the *whole page* on any of
    them; this walker recovers tables from tag soup with the same
    indexing semantics on well-formed input:

    * ``t_idx`` counts tables by document order of their start tag; a
      table nested inside a cell gets its own ``t_idx`` and its rows
      never leak into the outer table's numbering,
    * ``r_idx``/``c_idx`` count ``tr`` / ``td|th`` per nearest enclosing
      table (``thead``/``tbody`` pass through); cells outside a row are
      ignored,
    * cell text flattens nested content (text routes to every open cell
      on the stack, so an outer cell includes its nested table's text),
      then NFKC-normalizes and collapses whitespace,
    * tag soup: a new ``td``/``th``/``tr`` implicitly closes the open
      cell of the innermost table; ``</table>`` closes its open cell.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.out: list[tuple] = []
        self._t_count = 0
        # stack of table states: {"tid", "r", "row_open", "cell": open-cell
        # record or None}; every open cell also sits in _open_cells so
        # text routes to all enclosing cells at once
        self._tables: list[dict] = []
        self._open_cells: list[dict] = []

    def _close_cell(self, state: dict) -> None:
        cell = state["cell"]
        if cell is None:
            return
        text = _WS_RE.sub(
            " ", unicodedata.normalize("NFKC", "".join(cell["buf"]))
        ).strip()
        self.out.append(
            (cell["tid"], cell["r"], cell["c"], cell["is_header"], text)
        )
        self._open_cells.remove(cell)
        state["cell"] = None

    def handle_starttag(self, tag, attrs):
        if tag == "table":
            self._tables.append(
                {"tid": self._t_count, "r": 0, "row_open": False, "cell": None}
            )
            self._t_count += 1
        elif tag == "tr" and self._tables:
            state = self._tables[-1]
            self._close_cell(state)
            state["row_open"] = True
            state["r_idx"] = state["r"]
            state["r"] += 1
            state["c"] = 0
        elif tag in ("td", "th") and self._tables:
            state = self._tables[-1]
            if not state["row_open"]:
                return
            self._close_cell(state)
            cell = {
                "tid": state["tid"],
                "r": state["r_idx"],
                "c": state["c"],
                "is_header": tag == "th",
                "buf": [],
            }
            state["c"] += 1
            state["cell"] = cell
            self._open_cells.append(cell)

    def handle_endtag(self, tag):
        if tag == "table" and self._tables:
            self._close_cell(self._tables[-1])
            self._tables.pop()
        elif tag in ("td", "th") and self._tables:
            self._close_cell(self._tables[-1])
        elif tag == "tr" and self._tables:
            state = self._tables[-1]
            self._close_cell(state)
            state["row_open"] = False

    def handle_data(self, data):
        for cell in self._open_cells:
            cell["buf"].append(data)

    def close(self):  # flush unclosed tables at EOF (tag soup)
        while self._tables:
            self._close_cell(self._tables[-1])
            self._tables.pop()
        super().close()


def _iter_cells(html_doc: bytes | str) -> Iterator[tuple]:
    """``(t_idx, r_idx, c_idx, is_header, text)`` for one page — see
    :class:`_CellWalker` for the recovery + indexing rules."""
    if isinstance(html_doc, bytes):
        html_doc = html_doc.decode("utf-8", errors="replace")
    walker = _CellWalker()
    try:
        walker.feed(html_doc)
        walker.close()
    except Exception:
        # html.parser is tolerant by design; this is a pure backstop so
        # one pathological page can never fail the Arrow batch
        pass
    yield from walker.out


def table_cells(web_pages: DataFrame) -> DataFrame:
    """Cell table for every ``<table>`` in a web_pages frame."""
    src = web_pages.select("url", "html")

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (url, *cell)
                for url, html_doc in zip(pdf["url"], pdf["html"])
                for cell in _iter_cells(html_doc)
            ]
            yield pd.DataFrame(
                rows, columns=[f.name for f in CELLS_SCHEMA.fields]
            ).astype(
                {"t_idx": "int32", "r_idx": "int32", "c_idx": "int32"}
            )

    return src.mapInPandas(_extract, schema=CELLS_SCHEMA)


def cells_to_triples(cells: DataFrame) -> DataFrame:
    """Header-keyed triple-ification of a cell table.

    For each table whose row 0 is a ``<th>`` header: body rows emit
    ``(subj = column-0 cell, pred = header of column c, obj = cell at
    column c, prov = url#t<t_idx>:r<r_idx>)`` for every non-empty body
    cell with ``c_idx > 0``.
    """
    headers = cells.filter(
        F.col("is_header") & (F.col("r_idx") == 0) & (F.col("text") != "")
    ).select("url", "t_idx", "c_idx", F.col("text").alias("pred"))
    subjects = cells.filter(
        (~F.col("is_header")) & (F.col("c_idx") == 0) & (F.col("text") != "")
    ).select("url", "t_idx", "r_idx", F.col("text").alias("subj"))
    body = cells.filter(
        (~F.col("is_header")) & (F.col("c_idx") > 0) & (F.col("text") != "")
    ).select("url", "t_idx", "r_idx", "c_idx", F.col("text").alias("obj"))
    return (
        body.join(headers, ["url", "t_idx", "c_idx"])
        .join(subjects, ["url", "t_idx", "r_idx"])
        .select(
            "subj",
            "pred",
            "obj",
            F.concat(
                F.col("url"), F.lit("#t"), F.col("t_idx"),
                F.lit(":r"), F.col("r_idx"),
            ).alias("prov"),
        )
    )


def webtable_triples(web_pages: DataFrame) -> DataFrame:
    """End-to-end: pages → cells → header-keyed triples."""
    return cells_to_triples(table_cells(web_pages))


_INT_RE = r"^-?[0-9]+$"
_DEC_RE = r"^-?[0-9]+(\.[0-9]+)?$"


def column_types(cells: DataFrame, vocab: DataFrame | None = None) -> DataFrame:
    """Semantic table interpretation (lite): per-column datatype + optional
    semantic-type annotation.

    For every (url, t_idx, c_idx) column of body cells:

    * ``datatype`` — ``'integer'`` if every non-empty value is an integer
      literal, else ``'decimal'`` if every value is numeric, else
      ``'string'`` (the same all-values rule as schema_induction's
      per-predicate datatypes).
    * ``header`` — the row-0 ``<th>`` text (NULL for headerless tables).
    * ``sem_type`` — with a ``vocab(value, sem_type)`` dim (size-gated
      broadcast join on the lower-cased cell), the type matched by a strict
      majority of the column's values; NULL when none reaches majority.
      Ties cannot occur (two types cannot each hold > half).

    One hash aggregate per column plus a vocabulary dim join — the
    standard web-table annotation shape; hot columns (many rows) collapse
    map-side.

    The cell table is consumed three ways (datatype stats, vocab votes,
    headers): persist/checkpoint ``cells`` before calling when it comes
    straight from the Arrow parse, or the extraction runs once per
    consumer.
    """
    body = cells.filter(~F.col("is_header") & (F.col("text") != ""))
    typed = body.withColumn(
        "_is_int", F.col("text").rlike(_INT_RE)
    ).withColumn("_is_num", F.col("text").rlike(_DEC_RE))
    if vocab is not None:
        # the vocabulary is caller-supplied and vocabulary-sized: tiny for
        # a curated type dictionary, 10^8+ surface forms on the open web —
        # gate the broadcast hint on a measured count (same discipline as
        # the pipeline's canonical-mapping join) instead of forcing it
        from search_spark.joins import maybe_broadcast

        dim = vocab.select(
            F.lower("value").alias("_v"),
            F.col("sem_type").alias("_sem"),
        )
        typed = typed.join(
            maybe_broadcast(dim, dim.count()),
            F.lower(typed.text) == F.col("_v"),
            "left",
        )
    else:
        typed = typed.withColumn("_sem", F.lit(None).cast("string"))
    col_stats = typed.groupBy("url", "t_idx", "c_idx").agg(
        F.count("*").cast("long").alias("n_values"),
        F.every("_is_int").alias("_all_int"),
        F.every("_is_num").alias("_all_num"),
    )
    sem_votes = (
        typed.filter(F.col("_sem").isNotNull())
        .groupBy("url", "t_idx", "c_idx", "_sem")
        .agg(F.count("*").alias("_votes"))
    )
    top_sem = (
        sem_votes.groupBy("url", "t_idx", "c_idx")
        .agg(F.max(F.struct("_votes", "_sem")).alias("_top"))
        .select(
            "url",
            "t_idx",
            "c_idx",
            F.col("_top._sem").alias("_sem"),
            F.col("_top._votes").alias("_votes"),
        )
    )
    headers = cells.filter(
        F.col("is_header") & (F.col("r_idx") == 0) & (F.col("text") != "")
    ).select("url", "t_idx", "c_idx", F.col("text").alias("header"))
    out = (
        col_stats.join(headers, ["url", "t_idx", "c_idx"], "left")
        .join(top_sem, ["url", "t_idx", "c_idx"], "left")
    )
    datatype = (
        F.when(F.col("_all_int"), F.lit("integer"))
        .when(F.col("_all_num"), F.lit("decimal"))
        .otherwise(F.lit("string"))
    )
    sem = F.when(
        F.col("_votes") * 2 > F.col("n_values"), F.col("_sem")
    )
    return out.select(
        "url",
        "t_idx",
        "c_idx",
        "header",
        "n_values",
        datatype.alias("datatype"),
        sem.alias("sem_type"),
    )
