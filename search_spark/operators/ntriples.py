"""N-Triples / N-Quads serialization of the materialized triple table.

The interop sink a KG constructor needs: downstream consumers (triple
stores, RDF toolchains) ingest N-Triples, not parquet. The reference
stops at its SQL mining cache; this engine's ``(subj, pred, obj, prov)``
rows serialize to one line per triple —

    <iri(subj)> <iri(pred)> "literal(obj)" .
    <iri(subj)> <iri(pred)> "literal(obj)" <iri(prov)> .   (N-Quads)

Terms in this engine are plain strings, so the serializer maps subjects
and predicates into a caller-chosen IRI namespace and writes objects as
literals (the KG's objects are surface strings / type labels — literal is
the faithful typing; a caller with IRI-valued objects can pre-wrap them).

Escaping is the N-Triples grammar's, as nested literal ``replace`` chains
(whole-stage codegen, no UDF):

* literals: ``\\`` → ``\\\\``, ``"`` → ``\\"``, newline → ``\\n``,
  CR → ``\\r``, tab → ``\\t``;
* IRIs: percent-encode the characters the grammar forbids unescaped —
  ``%`` first, then space ``< > " { } | ^ `` ` `` and ``\\`` (relaxed
  IRI profile: other reserved characters pass through, documented — the
  engine's terms are tokenized text, not arbitrary binary).

Scale: a narrow map over the triple scan — no shuffle, no Python. The
file sink (:func:`write_ntriples`) is Spark's text writer, so output
parallelism is the upstream partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_NS = "http://example.org/kg/"

_LITERAL_RULES = [("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t")]
_IRI_RULES = [
    ("%", "%25"),
    (" ", "%20"),
    ("<", "%3C"),
    (">", "%3E"),
    ('"', "%22"),
    ("{", "%7B"),
    ("}", "%7D"),
    ("|", "%7C"),
    ("^", "%5E"),
    ("`", "%60"),
    ("\\", "%5C"),
    ("\n", "%0A"),
    ("\r", "%0D"),
    ("\t", "%09"),
]


def _chain(col: Column, rules) -> Column:
    for search, repl in rules:
        col = F.replace(col, F.lit(search), F.lit(repl))
    return col


def escape_literal(col: Column) -> Column:
    return _chain(col, _LITERAL_RULES)


def iri(col: Column, namespace: str = DEFAULT_NS) -> Column:
    return F.concat(F.lit(namespace), _chain(col, _IRI_RULES))


def to_ntriples(
    triples: DataFrame,
    namespace: str = DEFAULT_NS,
    graph_col: str | None = None,
) -> DataFrame:
    """One ``line`` column per triple; pass ``graph_col="prov"`` for
    N-Quads with the provenance as the graph term."""
    parts = [
        F.lit("<"),
        iri(F.col("subj"), namespace),
        F.lit("> <"),
        iri(F.col("pred"), namespace),
        F.lit('> "'),
        escape_literal(F.col("obj")),
        F.lit('"'),
    ]
    if graph_col is not None:
        parts += [F.lit(" <"), iri(F.col(graph_col), namespace), F.lit(">")]
    parts.append(F.lit(" ."))
    return triples.select(F.concat(*parts).alias("line"))


def write_ntriples(
    triples: DataFrame,
    path: str,
    namespace: str = DEFAULT_NS,
    graph_col: str | None = None,
) -> None:
    """Serialize and write as text files (one N-Triples line per row)."""
    to_ntriples(triples, namespace, graph_col).write.mode("overwrite").text(path)


def ntriples_escape_sql(expr: str) -> str:
    """The literal-escape chain as portable SQL (DuckDB oracle side)."""
    out = expr
    for search, repl in _LITERAL_RULES:
        s = search.replace("\\", "\\\\").replace("'", "''")
        r = repl.replace("\\", "\\\\").replace("'", "''")
        out = f"replace({out}, e'{s}', e'{r}')"
    return out


def iri_escape_sql(expr: str, namespace: str = DEFAULT_NS) -> str:
    """The IRI percent-encode chain as portable SQL."""
    out = expr
    for search, repl in _IRI_RULES:
        s = search.replace("\\", "\\\\").replace("'", "''")
        out = f"replace({out}, e'{s}', '{repl}')"
    return f"'{namespace}' || {out}"
