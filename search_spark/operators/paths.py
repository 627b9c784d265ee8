"""SPARQL-1.1-style property paths over the materialized triple table.

The reference's mining cache is queried with flat SQL (``database/sql.py``);
a KG constructor needs the next query surface up: path algebra —
``pred``, inverse ``^p``, sequence ``p1/p2``, alternation ``p1|p2`` and
bounded repetition ``p{0|1,k}`` (SPARQL ``+``/``*``/``?`` map onto it,
zero-length pairs per SPARQL 1.1 §18.4) — evaluated *with binding
propagation* so a
seeded query (``:E path ?x``) never materializes the full path relation.

Evaluation strategy (Spark-first):

* **Inverse normalization** — ``^`` is pushed down to the predicate leaves
  algebraically (``^(a/b) = ^b/^a``, ``^(a|b) = ^a|^b``, ``^^a = a``)
  before any plan is built, so the executor only ever swaps the two
  columns of a leaf scan — no operator tree is evaluated "backwards".
* **Left-to-right binding propagation** — each step receives the distinct
  frontier of the previous step as its source set and left-semi-joins the
  triple scan against it (magic-sets-lite).  With a selective seed set the
  whole path evaluation touches only the reachable subgraph; the semi-join
  is a plain equi-join AQE converts to broadcast when the frontier is
  small — never a forced hint.
* **Bounded repetition is semi-naive** — round ``i`` joins only the *delta*
  frontier (new pairs from round ``i-1``) against the step relation and
  anti-joins the accumulated result, exactly the large-star/small-star
  loop discipline used by the canonicalizer (``canonicalize.py``), with
  ``localCheckpoint`` truncating lineage per round.  Monotone set
  semantics make the early exit (empty delta) identical to the oracle's
  fixed ``k``-round unroll.

At 10^12-triple scale the triple table is bucketed by ``subj`` (io/
snapshots.py), so every leaf semi-join and every ``Seq`` join shuffles only
the frontier side — the big table is read partition-pruned and joined on
its bucket key.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class PathExpr:
    """Marker base class for path expressions."""


@dataclass(frozen=True)
class Pred(PathExpr):
    name: str
    inverted: bool = False


@dataclass(frozen=True)
class NegSet(PathExpr):
    """Negated property set ``!(p1|..|^q1|..)`` — ONE step over any
    predicate outside the set (SPARQL 1.1 §18.4 NPS). ``fwd``/``inv`` are
    the forward / inverse predicate names; ``None`` means that direction
    does not participate at all (``!a`` has no inverse branch — it is NOT
    "every reversed edge")."""

    fwd: tuple[str, ...] | None
    inv: tuple[str, ...] | None


@dataclass(frozen=True)
class Inv(PathExpr):
    inner: PathExpr


@dataclass(frozen=True)
class Seq(PathExpr):
    left: PathExpr
    right: PathExpr


@dataclass(frozen=True)
class Alt(PathExpr):
    left: PathExpr
    right: PathExpr


@dataclass(frozen=True)
class Repeat(PathExpr):
    """``inner{min_hops,max_hops}`` — bounded repetition. ``min_hops`` is
    1 (SPARQL ``+``) or 0 (SPARQL ``*`` / ``?``): with 0 the result also
    contains the zero-length pairs ``(n, n)`` — for every seed when the
    evaluation is seeded, else for every node of the graph (SPARQL 1.1
    §18.4 ZeroOrMorePath: all RDF terms appearing as subject or object)."""

    inner: PathExpr
    max_hops: int
    min_hops: int = 1


def normalize(expr: PathExpr, flip: bool = False) -> PathExpr:
    """Push every ``Inv`` down to the predicate leaves."""
    if isinstance(expr, Pred):
        return Pred(expr.name, expr.inverted ^ flip)
    if isinstance(expr, NegSet):
        # ^!(F|^I) = !(I|^F): flipping swaps the two direction branches
        return NegSet(expr.inv, expr.fwd) if flip else expr
    if isinstance(expr, Inv):
        return normalize(expr.inner, not flip)
    if isinstance(expr, Seq):
        l, r = normalize(expr.left, flip), normalize(expr.right, flip)
        return Seq(r, l) if flip else Seq(l, r)
    if isinstance(expr, Alt):
        return Alt(normalize(expr.left, flip), normalize(expr.right, flip))
    if isinstance(expr, Repeat):
        # zero-length pairs are symmetric, so only the step flips
        return Repeat(normalize(expr.inner, flip), expr.max_hops,
                      expr.min_hops)
    raise TypeError(f"unknown path expression: {expr!r}")


def _pin(df: DataFrame) -> DataFrame:
    """Per-round materialization for the Repeat loops.

    ``local`` strategy → ``cache()`` (executor memory; bounded lineage is
    acceptable because rounds are bounded by ``max_hops`` — see the
    Repeat comment for why localCheckpoint specifically is avoided);
    ``reliable`` strategy → file checkpoint (disk-backed round state,
    fault-tolerant on a real cluster, heap-bounded at stress scale).
    """
    from search_spark import checkpoints

    if checkpoints.strategy(df.sparkSession) == "reliable":
        return checkpoints.truncate(df, eager=False, strategy="reliable")
    return df.cache()


def _restrict(pairs: DataFrame, sources: DataFrame | None) -> DataFrame:
    if sources is None:
        return pairs
    return pairs.join(sources, on="src", how="left_semi")


def _is_leafy(expr: PathExpr) -> bool:
    """True when ``expr`` is built from Pred/Alt only (no Seq/Repeat) —
    the shape whose unrestricted pair relation is a single union of leaf
    scans and can be materialized once per Repeat instead of re-evaluated
    every round."""
    if isinstance(expr, (Pred, NegSet)):
        return True
    if isinstance(expr, Alt):
        return _is_leafy(expr.left) and _is_leafy(expr.right)
    return False


def _negset_pairs(triples: DataFrame, expr: NegSet) -> DataFrame:
    """Unrestricted ``(src, dst)`` single-step relation of a negated
    property set: forward edges whose predicate is outside ``fwd``,
    unioned with reversed edges whose predicate is outside ``inv`` —
    each branch only when present. The NOT IN filter pushes to the scan
    like any constant predicate filter."""
    parts = []
    if expr.fwd is not None:
        parts.append(
            triples.filter(~F.col("pred").isin(*expr.fwd)).select(
                F.col("subj").alias("src"), F.col("obj").alias("dst")
            )
        )
    if expr.inv is not None:
        parts.append(
            triples.filter(~F.col("pred").isin(*expr.inv)).select(
                F.col("obj").alias("src"), F.col("subj").alias("dst")
            )
        )
    out = parts[0]
    for extra in parts[1:]:
        out = out.unionByName(extra)
    return out


def _step_pairs(triples: DataFrame, expr: PathExpr) -> DataFrame:
    """Unrestricted ``(src, dst)`` relation of a leafy expression with NO
    per-leaf distinct — callers apply one distinct over the whole union."""
    if isinstance(expr, Pred):
        pairs = triples.filter(F.col("pred") == expr.name)
        if expr.inverted:
            return pairs.select(
                F.col("obj").alias("src"), F.col("subj").alias("dst")
            )
        return pairs.select(
            F.col("subj").alias("src"), F.col("obj").alias("dst")
        )
    if isinstance(expr, NegSet):
        return _negset_pairs(triples, expr)
    return _step_pairs(triples, expr.left).unionByName(
        _step_pairs(triples, expr.right)
    )


def _zero_pairs(
    triples: DataFrame, sources: DataFrame | None
) -> DataFrame:
    """Zero-length ``(n, n)`` pairs for a ``min_hops=0`` Repeat: the seeds
    when seeded (a constant end matches itself), else every node of the
    graph — SPARQL 1.1 ZeroOrMorePath over an unseeded pattern binds each
    term appearing as subject or object."""
    if sources is not None:
        nodes = sources.select("src").distinct()
    else:
        nodes = (
            triples.select(F.col("subj").alias("src"))
            .unionByName(triples.select(F.col("obj").alias("src")))
            .distinct()
        )
    return nodes.select("src", F.col("src").alias("dst"))


def _eval(
    triples: DataFrame, expr: PathExpr, sources: DataFrame | None
) -> DataFrame:
    if isinstance(expr, Pred):
        pairs = triples.filter(F.col("pred") == expr.name)
        if expr.inverted:
            pairs = pairs.select(
                F.col("obj").alias("src"), F.col("subj").alias("dst")
            )
        else:
            pairs = pairs.select(
                F.col("subj").alias("src"), F.col("obj").alias("dst")
            )
        return _restrict(pairs, sources).distinct()
    if isinstance(expr, NegSet):
        return _restrict(_negset_pairs(triples, expr), sources).distinct()
    if isinstance(expr, Seq):
        left = _eval(triples, expr.left, sources)
        mids = left.select(F.col("dst").alias("src")).distinct()
        right = _eval(triples, expr.right, mids).withColumnRenamed(
            "src", "mid"
        )
        return (
            left.join(right, left["dst"] == right["mid"])
            .select(left["src"], right["dst"])
            .distinct()
        )
    if isinstance(expr, Alt):
        return (
            _eval(triples, expr.left, sources)
            .unionByName(_eval(triples, expr.right, sources))
            .distinct()
        )
    if isinstance(expr, Repeat):
        # per-round truncation uses _pin: cache() under the default
        # "local" checkpoint strategy (rounds are bounded by max_hops so
        # lineage depth is bounded too, and on this Spark build
        # localCheckpoint of the round plan trips an attribute-resolution
        # error when the triple input is itself a cached/checkpointed
        # relation — key not found: src#N), a reliable file checkpoint
        # under the "reliable" strategy (disk-backed, fault-tolerant,
        # and free of that localCheckpoint-specific resolution bug).
        if _is_leafy(expr.inner):
            # build the step relation's plan ONCE — a pure union of leaf
            # scans with NO distinct and NO cache (duplicates collapse in
            # the per-round new_pairs distinct; nothing beyond the deltas
            # is ever materialized, preserving the module's
            # seeded-never-materializes-the-full-relation guarantee) —
            # and join the delta against it each round.  The general path
            # below re-evaluates the expression tree per round, paying
            # 2 leaf scans + 3 distinct shuffles per hop for an
            # Alt(Pred, Inv(Pred)) body; joining the delta on dst
            # directly also drops the per-round frontier distinct.
            base = _step_pairs(triples, expr.inner)
            # delta shares lineage with the step scan (acc derives from
            # it), so rename step's columns outright to dodge Spark's
            # ambiguous-self-join detection
            step = base.select(
                F.col("src").alias("mid"), F.col("dst").alias("step_dst")
            )
            acc = _restrict(base, sources).distinct().transform(_pin)
            delta = acc
            for _ in range(expr.max_hops - 1):
                new_pairs = (
                    delta.join(step, delta["dst"] == step["mid"])
                    .select(delta["src"], F.col("step_dst").alias("dst"))
                    .distinct()
                )
                delta = new_pairs.join(
                    acc, on=["src", "dst"], how="left_anti"
                ).transform(_pin)
                if delta.isEmpty():
                    break
                acc = acc.unionByName(delta).transform(_pin)
            if expr.min_hops == 0:
                acc = _zero_pairs(triples, sources).unionByName(
                    acc
                ).distinct()
            return acc
        acc = _eval(triples, expr.inner, sources).transform(_pin)
        delta = acc
        for _ in range(expr.max_hops - 1):
            frontier = delta.select(F.col("dst").alias("src")).distinct()
            step = _eval(triples, expr.inner, frontier).withColumnRenamed(
                "src", "mid"
            )
            new_pairs = (
                delta.join(step, delta["dst"] == step["mid"])
                .select(delta["src"], step["dst"])
                .distinct()
            )
            delta = new_pairs.join(
                acc, on=["src", "dst"], how="left_anti"
            ).transform(_pin)
            if delta.isEmpty():
                break
            acc = acc.unionByName(delta).transform(_pin)
        if expr.min_hops == 0:
            acc = _zero_pairs(triples, sources).unionByName(acc).distinct()
        return acc
    raise TypeError(f"unknown path expression: {expr!r}")


def eval_path(
    triples: DataFrame,
    expr: PathExpr,
    sources: DataFrame | None = None,
) -> DataFrame:
    """Evaluate a property path to its distinct ``(src, dst)`` pair set.

    ``triples`` needs ``(subj, pred, obj)``; ``sources``, when given, is a
    one-column ``src`` frame binding the path's left end (SPARQL
    ``:seed path ?x``) — the restriction is pushed into the leftmost leaf
    scan and propagated frontier-by-frontier.
    """
    return _eval(triples, normalize(expr), sources)
