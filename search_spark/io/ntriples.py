"""N-Quads export/import for the materialized KG.

The engine already *reads* RDF N-Triples (the MeSH vocabulary,
``extraction/mesh.py``); this module adds the write side plus a generic
reader, so the KG a pipeline materializes can leave as a standard triple
exchange format — the lingua franca for loading into any triple store —
and come back losslessly.

Mapping: ``subj``/``pred`` become IRIs under a caller-supplied base
namespace (percent-encoded, so arbitrary surface forms survive), ``obj``
becomes a literal, and ``prov`` (when present) becomes the graph label of
an N-Quad — provenance is first-class in the export, not a comment.
Literal escaping follows the N-Triples grammar (backslash, quote,
newline, CR, tab).

Everything is JVM-side column expressions (literal ``replace`` chains +
``regexp_extract``) — the export is a narrow map over the triple scan
(zero shuffle, whole-stage codegen) and the import is the same shape as
the MeSH reader; both scale with the file count.

IRI encoding is a *minimal invertible* percent-encoding: only the
characters the N-Triples grammar forbids inside ``<…>`` transform
(``%`` first — which makes the chain lossless for every input — then
space ``< > " { } | ^ `` ` `` ``\\`` and control whitespace); everything
else, including non-ASCII, passes through verbatim (IRIs are unicode).
The same chains render as portable SQL (:func:`iri_escape_sql` /
:func:`literal_escape_sql`) so a DuckDB oracle can re-derive the exact
serialization — the reason this replaced the earlier ``url_encode``
formulation (Java form-encoding: not SQL-mirrorable, and ``+`` for
space is wrong in IRIs anyway).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BASE = "kg:"

# order matters: % first on encode, last on decode — see module docstring
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


def _percent_encode(col: Column) -> Column:
    for search, repl in _IRI_RULES:
        col = F.replace(col, F.lit(search), F.lit(repl))
    return col


def _percent_decode(col: Column) -> Column:
    for search, repl in reversed(_IRI_RULES):
        col = F.replace(col, F.lit(repl), F.lit(search))
    return col


def _escape_literal(col: Column) -> Column:
    # N-Triples literal escapes: \ first, then ", LF, CR, TAB
    out = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    out = F.replace(out, F.lit('"'), F.lit('\\"'))
    out = F.replace(out, F.lit("\n"), F.lit("\\n"))
    out = F.replace(out, F.lit("\r"), F.lit("\\r"))
    return F.replace(out, F.lit("\t"), F.lit("\\t"))


def _unescape_literal(col: Column) -> Column:
    # inverse order of _escape_literal; a placeholder keeps literal
    # backslashes out of the way while the short escapes resolve
    sentinel = "\x00"
    out = F.replace(col, F.lit("\\\\"), F.lit(sentinel))
    out = F.replace(out, F.lit('\\"'), F.lit('"'))
    out = F.replace(out, F.lit("\\n"), F.lit("\n"))
    out = F.replace(out, F.lit("\\r"), F.lit("\r"))
    out = F.replace(out, F.lit("\\t"), F.lit("\t"))
    return F.replace(out, F.lit(sentinel), F.lit("\\"))


def _iri(kind: str, col: Column, base: str) -> Column:
    return F.concat(
        F.lit(f"<{base}{kind}/"), _percent_encode(col), F.lit(">")
    )


def _iri_value(col: Column, kind: str, base: str) -> Column:
    prefix = f"<{base}{kind}/"
    return _percent_decode(
        F.substring(col, len(prefix) + 1, F.length(col) - len(prefix) - 1)
    )


def _sql_escape(s: str) -> str:
    return s.replace("\\", "\\\\").replace("'", "''")


def iri_escape_sql(expr: str, kind: str, base: str = DEFAULT_BASE) -> str:
    """The IRI term as portable SQL (DuckDB oracle mirror)."""
    out = expr
    for search, repl in _IRI_RULES:
        out = f"replace({out}, e'{_sql_escape(search)}', '{repl}')"
    return f"'<{base}{kind}/' || {out} || '>'"


def literal_escape_sql(expr: str) -> str:
    """The escaped literal body as portable SQL (DuckDB oracle mirror)."""
    out = expr
    for search, repl in [
        ("\\", "\\\\"),
        ('"', '\\"'),
        ("\n", "\\n"),
        ("\r", "\\r"),
        ("\t", "\\t"),
    ]:
        out = (
            f"replace({out}, e'{_sql_escape(search)}', "
            f"e'{_sql_escape(repl)}')"
        )
    return out


def to_nquad_lines(
    df: DataFrame, base: str = DEFAULT_BASE, prov_col: str | None = "prov"
) -> DataFrame:
    """``(subj, pred, obj[, prov])`` → one-column ``line`` DataFrame of
    N-Quads (N-Triples when ``prov_col`` is None or absent)."""
    parts = [
        _iri("entity", F.col("subj"), base),
        F.lit(" "),
        _iri("pred", F.col("pred"), base),
        F.lit(' "'),
        _escape_literal(F.col("obj")),
        F.lit('"'),
    ]
    if prov_col is not None and prov_col in df.columns:
        # a NULL graph label is the default graph: emit a plain triple
        # line (an unconditional concat would NULL the whole line and
        # silently drop the quad from the export)
        parts.append(
            F.when(
                F.col(prov_col).isNotNull(),
                F.concat(F.lit(" "), _iri("prov", F.col(prov_col), base)),
            ).otherwise(F.lit(""))
        )
    parts.append(F.lit(" ."))
    return df.select(F.concat(*parts).alias("line"))


def write_ntriples(
    df: DataFrame,
    path: str,
    base: str = DEFAULT_BASE,
    prov_col: str | None = "prov",
) -> None:
    """Export the triple table as N-Quads text files (one archive-ready
    ``.nt`` part per partition; narrow map, no shuffle)."""
    to_nquad_lines(df, base=base, prov_col=prov_col).write.mode(
        "errorifexists"
    ).text(path)


# subject/predicate IRIs, quoted literal with escapes, optional graph IRI
_NQ_PATTERN = (
    r'^(<[^>]*>)\s+(<[^>]*>)\s+"((?:[^"\\]|\\.)*)"(?:\s+(<[^>]*>))?\s*\.\s*$'
)

# same productions with an IRI object (legal N-Triples the engine's own
# exporter never emits — its object column is always a literal — but
# external documents routinely carry; ADVICE r4)
_NQ_PATTERN_IRI_OBJ = (
    r'^(<[^>]*>)\s+(<[^>]*>)\s+(<[^>]*>)(?:\s+(<[^>]*>))?\s*\.\s*$'
)


def _iri_obj_value(col: Column, base: str) -> Column:
    """Object-position IRI → the engine's object string: engine-minted
    entity IRIs decode back to their surface form (lossless round-trip
    with :func:`to_nquad_lines` should an entity-valued object ever be
    exported); foreign IRIs keep their full text (brackets stripped) —
    no information is silently dropped either way."""
    prefix = f"<{base}entity/"
    return F.when(
        col.startswith(prefix), _iri_value(col, "entity", base)
    ).otherwise(col.substr(F.lit(2), F.length(col) - 2))


def read_ntriples(
    spark: SparkSession, path: str, base: str = DEFAULT_BASE
) -> DataFrame:
    """Parse N-Quads/N-Triples text back to ``(subj, pred, obj, prov)``
    (``prov`` NULL for plain triples). Pure JVM regex over the text scan
    — the same plan shape as the MeSH vocabulary reader. Both object
    productions parse: quoted literals (the engine's own export shape)
    and IRIs (external documents; engine-minted entity IRIs decode to
    their surface form, foreign IRIs pass through as their text)."""
    lines = spark.read.text(path)
    lit = lines.select(
        F.regexp_extract("value", _NQ_PATTERN, 1).alias("s_iri"),
        F.regexp_extract("value", _NQ_PATTERN, 2).alias("p_iri"),
        F.regexp_extract("value", _NQ_PATTERN, 3).alias("o_lit"),
        F.regexp_extract("value", _NQ_PATTERN, 4).alias("g_iri"),
    ).filter(F.col("s_iri") != "").select(
        "s_iri", "p_iri",
        _unescape_literal(F.col("o_lit")).alias("obj"),
        "g_iri",
    )
    iri = lines.select(
        F.regexp_extract("value", _NQ_PATTERN_IRI_OBJ, 1).alias("s_iri"),
        F.regexp_extract("value", _NQ_PATTERN_IRI_OBJ, 2).alias("p_iri"),
        F.regexp_extract("value", _NQ_PATTERN_IRI_OBJ, 3).alias("o_iri"),
        F.regexp_extract("value", _NQ_PATTERN_IRI_OBJ, 4).alias("g_iri"),
    ).filter(F.col("s_iri") != "").select(
        "s_iri", "p_iri",
        _iri_obj_value(F.col("o_iri"), base).alias("obj"),
        "g_iri",
    )
    return lit.unionByName(iri).select(
        _iri_value(F.col("s_iri"), "entity", base).alias("subj"),
        _iri_value(F.col("p_iri"), "pred", base).alias("pred"),
        F.col("obj"),
        F.when(
            F.col("g_iri") != "",
            _iri_value(F.col("g_iri"), "prov", base),
        ).alias("prov"),
    )


def to_turtle_blocks(df: DataFrame, base: str = DEFAULT_BASE) -> DataFrame:
    """``(subj, pred, obj)`` → ``(subj, block)``: one Turtle block per
    subject, predicates abbreviated with ``;`` and object lists with
    ``,`` (Turtle §2.2/§2.3 predicate/object lists) — the human-readable
    sibling of :func:`to_nquad_lines` for the same engine-IRI model.

    Terms stay absolute ``<base…>`` IRIs (no prefixed names: Turtle's
    PN_LOCAL grammar forbids raw ``/`` and friends, which open-web
    surface forms contain; absolute IRIs need no escape model beyond the
    shared invertible percent-encoding). Object lists and predicate
    lines sort by their rendered text, so the serialization is
    deterministic and a SQL oracle re-derives it with ordered
    ``string_agg``.

    Scale shape: distinct + two hash aggregations keyed on (subj, pred)
    then subj — partial-aggregated, no window, no Python; block text
    length is bounded by a subject's own fact count.
    """
    lit = F.concat(F.lit('"'), _escape_literal(F.col("obj")), F.lit('"'))
    t = df.select("subj", "pred", lit.alias("lit")).distinct()
    obj_lists = t.groupBy("subj", "pred").agg(
        F.array_join(F.array_sort(F.collect_list("lit")), ", ").alias("objs")
    )
    line = F.concat(
        _iri("pred", F.col("pred"), base), F.lit(" "), F.col("objs")
    )
    blocks = (
        obj_lists.select("subj", line.alias("line"))
        .groupBy("subj")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list("line")), " ;\n    "
            ).alias("body")
        )
    )
    return blocks.select(
        "subj",
        F.concat(
            _iri("entity", F.col("subj"), base),
            F.lit(" "),
            F.col("body"),
            F.lit(" ."),
        ).alias("block"),
    )


def write_turtle(
    df: DataFrame, path: str, base: str = DEFAULT_BASE
) -> None:
    """Write the subject blocks as ``.ttl`` text parts (each part is
    valid Turtle on its own; blocks sort by subject within partitions
    for stable diffs — no global sort is forced at scale)."""
    to_turtle_blocks(df, base=base).sortWithinPartitions("subj").select(
        "block"
    ).write.mode("errorifexists").text(path)


# one Turtle block: subject IRI, body, terminating " ."
_TTL_BLOCK = r"^(<[^>]*>) ([\s\S]*) \.$"


def read_turtle(
    spark: SparkSession, path: str, base: str = DEFAULT_BASE
) -> DataFrame:
    """Parse :func:`write_turtle` output back to ``(subj, pred, obj)`` —
    the lossless inverse for the engine's own deterministic Turtle
    dialect (absolute ``<base…>`` IRIs, literal objects).

    Record framing: blocks are read whole with ``lineSep=" .\\n"`` (one
    record per subject block), then predicate lines split on
    ``" ;\\n    "`` and object lists on ``'", "'``. Both separators are
    unambiguous against N-Triples escaping: a raw newline never occurs
    inside a literal (escaped to ``\\n``) and every interior quote is
    ``\\"``, so the unescaped ``", "`` token only appears between list
    items. Plan shape: text scan → ``split``/``explode`` — pure JVM, the
    read parallelism is the file count like the N-Quads reader.
    """
    blocks = spark.read.option("lineSep", " .\n").text(path)
    blocks = blocks.filter(F.trim("value") != "")
    subj_iri = F.regexp_extract("value", r"^(<[^>]*>) ", 1)
    body = F.expr(
        "substring(value, length(regexp_extract(value, '^(<[^>]*>) ', 1)) + 2)"
    )
    lines = blocks.select(
        subj_iri.alias("s_iri"),
        F.explode(F.split(body, r" ;\n    ")).alias("line"),
    )
    pred_iri = F.regexp_extract("line", r"^(<[^>]*>) ", 1)
    objs = F.expr(
        "substring(line, length(regexp_extract(line, '^(<[^>]*>) ', 1)) + 2)"
    )
    # strip the outer quotes once, then split on the unescapable token
    inner = F.regexp_replace(
        F.regexp_replace(objs, r'^"', ""), r'"$', ""
    )
    out = lines.select(
        "s_iri",
        pred_iri.alias("p_iri"),
        F.explode(F.split(inner, r'", "')).alias("o_lit"),
    )
    return out.select(
        _iri_value(F.col("s_iri"), "entity", base).alias("subj"),
        _iri_value(F.col("p_iri"), "pred", base).alias("pred"),
        _unescape_literal(F.col("o_lit")).alias("obj"),
    )
