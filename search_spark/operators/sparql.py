"""A small SPARQL ``SELECT`` compiler onto the BGP operator.

The reference leaves triple querying to hand-written SQL over its mining
cache (``database/mining_cache.py`` + notebook queries); this engine's
:mod:`search_spark.operators.bgp` already evaluates conjunctive patterns,
OPTIONAL blocks and FILTER NOT EXISTS as DataFrame joins. This module adds
the missing user surface: parse a SPARQL ``SELECT`` string and compile it
to that operator, so a KG consumer can query the materialized
``(subj, pred, obj)`` table declaratively instead of assembling pattern
lists by hand.

Supported subset (documented, fail-loud outside it):

* all four query forms via :func:`sparql_query`: ``SELECT``,
  ``CONSTRUCT { template } WHERE { ... }`` (templated triples over the
  FILTERed bindings), ``ASK { ... }`` (bool, LocalLimit short-circuit)
  and ``DESCRIBE <resource>`` (single OR-of-equalities scan),
* ``SELECT [DISTINCT] ?v1 ?v2 ... | * WHERE { ... }``
* triple patterns ``term term term .`` where a term is ``?var``,
  ``<iri>``, ``"literal"`` (with ``\\"`` / ``\\\\`` escapes) or a bare
  token — IRI brackets and literal quotes are stripped: the engine's
  triple terms are plain strings,
* ``OPTIONAL { <one triple pattern> }`` (left join; may chain),
* ``FILTER NOT EXISTS { <one triple pattern> }`` (anti join),
* ``FILTER (expr)`` with comparisons ``= != < <= > >=`` between variables
  and constants, combined with ``&&`` / ``||``,
* ``ORDER BY ?v ... | DESC(?v)`` and ``LIMIT n``.

Semantics note: bindings are always *set* semantics (the BGP operator
dedups — provenance rows collapse), so ``DISTINCT`` re-applies after the
projection and plain ``SELECT`` returns the distinct full-binding rows
projected. ``LIMIT`` without a total ``ORDER BY`` is nondeterministic in
SPARQL and here too — callers that hash-compare must order on a key.

Scale: parsing is driver-side string work on a query-sized input; the plan
it emits is exactly the BGP operator's (per-pattern pushed-down scans,
hash joins on shared variables, no cartesians — disconnected patterns
raise). ``ORDER BY``+``LIMIT`` compiles to a global sort only when the
caller asked for one; the common top-k shape is TakeOrderedAndProject.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from search_spark.operators.bgp import match_bgp

_TOKEN = re.compile(
    r"""\?[A-Za-z_][A-Za-z0-9_]*   # variable
      | <[^>\s]*>                  # iri (no whitespace — keeps `< ?b`
                                   #      in FILTER from lexing as an iri)
      | "(?:[^"\\]|\\.)*"          # quoted literal
      | \{ | \} | \( | \) | \.     # structure
      | && | \|\| | != | <= | >= | = | < | >
      | [^\s{}()."?<>=!&|]+        # bare token
    """,
    re.VERBOSE,
)

_CMP_OPS = {"=", "!=", "<", "<=", ">", ">="}
_KEYWORDS = {"select", "distinct", "where", "optional", "filter", "not",
             "exists", "order", "by", "limit", "desc", "asc"}


class SparqlError(ValueError):
    pass


def _tokenize(query: str) -> list[str]:
    toks = _TOKEN.findall(query)
    if "".join(toks).replace(" ", "") == "":
        raise SparqlError("empty query")
    return toks


def _unescape(lit: str) -> str:
    return re.sub(r"\\(.)", r"\1", lit)


def _term(tok: str) -> str:
    """Normalize a pattern term: vars keep the ``?``, constants strip
    IRI brackets / literal quotes down to the plain triple-term string."""
    if tok.startswith("?"):
        return tok
    if tok.startswith("<") and tok.endswith(">"):
        return tok[1:-1]
    if tok.startswith('"') and tok.endswith('"'):
        return _unescape(tok[1:-1])
    return tok


class _Parser:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        if self.i >= len(self.toks):
            raise SparqlError("unexpected end of query")
        tok = self.toks[self.i]
        self.i += 1
        return tok

    def expect(self, want: str) -> None:
        tok = self.next()
        if tok.lower() != want.lower():
            raise SparqlError(f"expected {want!r}, got {tok!r}")

    def kw(self, word: str) -> bool:
        tok = self.peek()
        if tok is not None and tok.lower() == word:
            self.i += 1
            return True
        return False


def _parse_pattern(p: _Parser) -> tuple[str, str, str]:
    terms = []
    for _ in range(3):
        tok = p.next()
        if tok in "{}()." or tok.lower() in ("optional", "filter"):
            raise SparqlError(f"malformed triple pattern near {tok!r}")
        terms.append(_term(tok))
    if p.peek() == ".":
        p.next()
    return tuple(terms)


def _parse_filter_expr(p: _Parser) -> list:
    """``(`` already consumed; parse comparisons joined by && / ||.

    Returns a flat AST (no SparkSession needed at parse time):
    ``[cmp, conj, cmp, conj, ...]`` where ``cmp = (left, op, right)``,
    operands are ``("var", name)`` or ``("lit", value)`` and ``conj`` is
    ``"&&"`` / ``"||"`` (evaluated left-to-right, like SPARQL's
    left-associative grammar at one precedence level — mixed &&/|| should
    parenthesize, which this subset doesn't support, so it documents
    left-to-right)."""

    def operand() -> tuple[str, str]:
        tok = p.next()
        if tok.startswith("?"):
            return ("var", tok[1:])
        return ("lit", _term(tok))

    def comparison() -> tuple:
        left = operand()
        op = p.next()
        if op not in _CMP_OPS:
            raise SparqlError(f"unsupported FILTER operator {op!r}")
        return (left, op, operand())

    ast: list = [comparison()]
    while p.peek() in ("&&", "||"):
        ast.append(p.next())
        ast.append(comparison())
    p.expect(")")
    return ast


def _compile_filter(ast: list) -> Column:
    def col_of(operand: tuple[str, str]) -> Column:
        kind, val = operand
        return F.col(val) if kind == "var" else F.lit(val)

    def cmp_col(cmp: tuple) -> Column:
        left, op, right = cmp
        lc, rc = col_of(left), col_of(right)
        return {
            "=": lc == rc,
            "!=": lc != rc,
            "<": lc < rc,
            "<=": lc <= rc,
            ">": lc > rc,
            ">=": lc >= rc,
        }[op]

    expr = cmp_col(ast[0])
    for i in range(1, len(ast), 2):
        rhs = cmp_col(ast[i + 1])
        expr = (expr & rhs) if ast[i] == "&&" else (expr | rhs)
    return expr


def parse_select(query: str) -> dict:
    """Parse a SPARQL SELECT into a plain dict (used by :func:`sparql_select`
    and directly testable without a SparkSession for the plan parts)."""
    p = _Parser(_tokenize(query))
    p.expect("SELECT")
    distinct = p.kw("distinct")
    select_vars: list[str] = []
    star = False
    while True:
        tok = p.peek()
        if tok is None:
            raise SparqlError("missing WHERE")
        if tok.lower() == "where":
            p.next()
            break
        tok = p.next()
        if tok == "*":
            star = True
        elif tok.startswith("?"):
            select_vars.append(tok[1:])
        else:
            raise SparqlError(f"bad SELECT term {tok!r}")
    if not star and not select_vars:
        raise SparqlError("SELECT binds no variables")
    p.expect("{")
    patterns, optional, not_exists, filters = _parse_group(p)
    order: list[tuple[str, bool]] = []  # (var, descending)
    limit: int | None = None
    while p.peek() is not None:
        tok = p.next().lower()
        if tok == "order":
            p.expect("BY")
            while True:
                nxt = p.peek()
                if nxt is None or nxt.lower() in ("limit",):
                    break
                nxt = p.next()
                desc = False
                if nxt.lower() in ("desc", "asc"):
                    desc = nxt.lower() == "desc"
                    p.expect("(")
                    nxt = p.next()
                    p.expect(")")
                if not nxt.startswith("?"):
                    raise SparqlError(f"ORDER BY expects a variable, got {nxt!r}")
                order.append((nxt[1:], desc))
        elif tok == "limit":
            limit = int(p.next())
        else:
            raise SparqlError(f"unexpected trailing token {tok!r}")
    if not patterns:
        raise SparqlError("WHERE block has no required triple pattern")
    return {
        "distinct": distinct,
        "select": select_vars,  # empty means *
        "patterns": patterns,
        "optional": optional,
        "not_exists": not_exists,
        "filters": filters,
        "order": order,
        "limit": limit,
    }


def _parse_group(p: _Parser) -> tuple[list, list, list, list]:
    """Parse a ``{ ... }`` group body (after the ``{``): returns
    (patterns, optional, not_exists, filter_asts)."""
    patterns: list[tuple[str, str, str]] = []
    optional: list[tuple[str, str, str]] = []
    not_exists: list[tuple[str, str, str]] = []
    filters: list[list] = []
    while True:
        tok = p.peek()
        if tok is None:
            raise SparqlError("unclosed group block")
        if tok == "}":
            p.next()
            break
        if tok.lower() == "optional":
            p.next()
            p.expect("{")
            optional.append(_parse_pattern(p))
            p.expect("}")
        elif tok.lower() == "filter":
            p.next()
            if p.peek() and p.peek().lower() == "not":
                p.next()
                p.expect("EXISTS")
                p.expect("{")
                not_exists.append(_parse_pattern(p))
                p.expect("}")
            else:
                p.expect("(")
                filters.append(_parse_filter_expr(p))
        else:
            patterns.append(_parse_pattern(p))
    return patterns, optional, not_exists, filters


def sparql_query(triples: DataFrame, query: str):
    """Dispatch on the SPARQL query form.

    * ``SELECT`` → bindings DataFrame (see :func:`sparql_select`),
    * ``CONSTRUCT { template } WHERE { ... }`` → derived
      ``(subj, pred, obj)`` DataFrame (template instantiation over the
      FILTERed bindings, incomplete instantiations dropped),
    * ``ASK { ... }`` → Python bool (LocalLimit short-circuit),
    * ``DESCRIBE <resource>`` → one OR-of-equalities scan, provenance
      columns pass through.
    """
    head = _tokenize(query)[0].lower()
    if head == "select":
        return sparql_select(triples, query)
    if head == "construct":
        return _sparql_construct(triples, query)
    if head == "ask":
        from search_spark.operators.bgp import match_bgp as _m

        p = _Parser(_tokenize(query))
        p.expect("ASK")
        p.expect("{")
        patterns, optional, not_exists, filters = _parse_group(p)
        if not patterns:
            raise SparqlError("ASK block has no required triple pattern")
        out = _m(triples, patterns, optional=optional, not_exists=not_exists)
        for ast in filters:
            out = out.filter(_compile_filter(ast))
        return out.limit(1).count() > 0
    if head == "describe":
        from search_spark.operators.bgp import describe

        toks = _tokenize(query)
        if len(toks) != 2:
            raise SparqlError("DESCRIBE takes exactly one resource term")
        return describe(triples, _term(toks[1]))
    raise SparqlError(f"unsupported query form {head!r}")


def _sparql_construct(triples: DataFrame, query: str) -> DataFrame:
    from search_spark.operators.bgp import instantiate_template, match_bgp

    p = _Parser(_tokenize(query))
    p.expect("CONSTRUCT")
    p.expect("{")
    template: list[tuple[str, str, str]] = []
    while p.peek() != "}":
        template.append(_parse_pattern(p))
    p.expect("}")
    p.expect("WHERE")
    p.expect("{")
    patterns, optional, not_exists, filters = _parse_group(p)
    if p.peek() is not None:
        raise SparqlError(f"unexpected trailing token {p.peek()!r}")
    if not patterns:
        raise SparqlError("WHERE block has no required triple pattern")
    if not template:
        raise SparqlError("empty CONSTRUCT template")
    bindings = match_bgp(
        triples, patterns, optional=optional, not_exists=not_exists
    )
    for ast in filters:
        bindings = bindings.filter(_compile_filter(ast))
    return instantiate_template(bindings, template)


def sparql_select(triples: DataFrame, query: str) -> DataFrame:
    """Compile and run a SPARQL SELECT against a ``(subj, pred, obj)``
    DataFrame. Returns one column per selected variable."""
    q = parse_select(query)
    out = match_bgp(
        triples,
        q["patterns"],
        optional=q["optional"],
        not_exists=q["not_exists"],
    )
    for ast in q["filters"]:
        out = out.filter(_compile_filter(ast))
    if q["select"]:
        missing = [v for v in q["select"] if v not in out.columns]
        if missing:
            raise SparqlError(f"SELECT variables never bound: {missing}")
        out = out.select(*q["select"])
        if q["distinct"]:
            out = out.distinct()
    if q["order"]:
        out = out.orderBy(
            *[F.col(v).desc() if d else F.col(v).asc() for v, d in q["order"]]
        )
    if q["limit"] is not None:
        out = out.limit(q["limit"])
    return out
